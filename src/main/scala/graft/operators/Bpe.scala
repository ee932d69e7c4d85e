package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding VOCABULARY TRAINING — the tokenizer-building step
  * of an LLM training-data pipeline, distributed the way the algorithm
  * actually scales: BPE statistics live on the WORD-FREQUENCY table
  * (Zipf-bounded: `maxVocab` most frequent words carry almost all pair
  * mass), never on the raw corpus. The corpus is scanned ONCE to build
  * that table; each merge round is then one pair-count aggregation +
  * 1-row argmax over it, and the chosen merge is applied MAP-ONLY via a
  * boundary-safe regexp (lookaround anchors, so " a a a a " merges to
  * "aa aa" exactly like the reference greedy left-to-right scan).
  *
  * Reference behavior (public BPE formulation, Sennrich et al. 2016):
  * words are symbol sequences ending in the end-of-word marker; each
  * round merges the globally most frequent adjacent symbol pair (ties:
  * lexicographically smallest), everywhere it occurs, left-to-right
  * non-overlapping. The spec checks this implementation merge-for-merge
  * against a plain in-memory reference on a small corpus.
  */
object Bpe {

  /** End-of-word marker appended to each word's final character (kept
    * printable and out of the lowercase word alphabet). */
  val Eow = "</w>"

  /** (rank, left, right, merged, pair_count) merge table learned from
    * `docs(textCol)`. `nMerges` rounds over the frequency-capped word
    * table; each round costs one aggregate action (pair argmax) and a
    * map-only merge application, with a lazy per-round checkpoint so
    * lineage stays flat. */
  /** Per-JVM merge-table memo — tokenizer training is "train once,
    * encode everywhere": vocab and encode queries over the same corpus
    * share one training. Transparent because the merge sequence is
    * deterministic (argmax with lexicographic tie-break over exact
    * integer counts); keyed on the analyzed plan's semantic hash, so a
    * different source/filter/partitioning retrains. */
  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, String, Int), Seq[(Int, String, String, String, Long)]]()

  def trainMerges(docs: DataFrame, nMerges: Int, textCol: String = "text",
                  maxVocab: Int = 50000): Seq[(Int, String, String, String, Long)] =
    mergeCache.computeIfAbsent(
      (docs.queryExecution.analyzed.semanticHash(), nMerges, textCol, maxVocab),
      _ => trainMergesUncached(docs, nMerges, textCol, maxVocab))

  private def trainMergesUncached(docs: DataFrame, nMerges: Int, textCol: String,
                                  maxVocab: Int): Seq[(Int, String, String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // One corpus scan: lowercase alpha words -> (word, freq), capped to
    // the maxVocab most frequent (deterministic tie-break on the word).
    val words = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(maxVocab)
    // Symbol-sequence representation: space-separated single characters
    // with the end-of-word marker fused to the last one, wrapped in
    // sentinel spaces so every symbol has a boundary on both sides.
    var syms = words.select(
        concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(Eow), lit(" ")).as("s"),
        col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    while (rank < nMerges) {
      // Adjacent-pair mass: explode each word's symbol list into
      // consecutive pairs weighted by word frequency; partial aggregation
      // does the heavy lifting map-side, and only ONE row is collected.
      val top = syms
        .select(split(trim(col("s")), " ").as("a"), col("freq"))
        .select(posexplode(col("a")).as(Seq("i", "l")), col("a"), col("freq"))
        .where(col("i") < size(col("a")) - 1)
        .select(col("l"), element_at(col("a"), col("i") + 2).as("r"), col("freq"))
        .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r")).limit(1)
        .as[(String, String, Long)].collect()
      top.headOption match {
        case Some((l, r, n)) if n > 0 =>
          merges += ((rank, l, r, l + r, n))
          // Boundary-safe merge everywhere: lookaround keeps the anchor
          // spaces unconsumed, so runs like " a a a a " collapse to
          // " aa aa " — the reference greedy left-to-right result.
          val pat = "(?<= )" + java.util.regex.Pattern.quote(l) + " " +
            java.util.regex.Pattern.quote(r) + "(?= )"
          val rep = java.util.regex.Matcher.quoteReplacement(l + r)
          syms = syms.select(regexp_replace(col("s"), pat, rep).as("s"), col("freq"))
            // Lazy: the NEXT round's argmax action materializes this
            // round's merge result and truncates lineage.
            .localCheckpoint(false)
        case _ => rank = nMerges // no pairs left (all words fully merged)
      }
      rank += 1
    }
    merges.toSeq
  }

  /** ENCODE with a learned merge table: tokenize `textCol` by applying
    * the merges in rank order — the map-only half of the tokenizer
    * (training is iterative; encoding is a fixed chain of `nMerges`
    * codegen'd regexp rewrites, zero shuffles, embarrassingly parallel
    * at 100 TB). The document is rendered in the SAME symbol-string
    * representation training used (per-word char symbols + end-of-word
    * marker); merges cannot fire across word boundaries because a merge
    * LEFT side never ends in the marker (training only ever counts
    * within-word pairs) while the symbol before every boundary always
    * does. Emits (doc_id, n_words, n_bpe_tokens). */
  def encode(docs: DataFrame, merges: Seq[(Int, String, String, String, Long)],
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // " w o r d</w> n e x t</w> " — concatenated per-word symbol strings.
    val words = split(lower(col(textCol)), "[^a-z]+")
    val kept = filter(words, w => length(w) > 0)
    val sym0 = concat(lit(" "),
      concat_ws(" ", transform(kept,
        w => concat(concat_ws(" ", split(w, "")), lit(Eow)))), lit(" "))
    val encoded = merges.sortBy(_._1).foldLeft(sym0) { case (s, (_, l, r, _, _)) =>
      val pat = "(?<= )" + java.util.regex.Pattern.quote(l) + " " +
        java.util.regex.Pattern.quote(r) + "(?= )"
      regexp_replace(s, pat, java.util.regex.Matcher.quoteReplacement(l + r))
    }
    docs.select(col(idCol),
      size(kept).cast("long").as("n_words"),
      when(size(kept) === 0, 0L)
        .otherwise(size(split(trim(encoded), " ")).cast("long")).as("n_bpe_tokens"))
  }

  /** The learned merge table as a DataFrame (rank, left, right, merged,
    * pair_count) — what a pipeline persists next to the corpus and
    * broadcasts to tokenize with. */
  def mergeTable(spark: SparkSession, docs: DataFrame, nMerges: Int,
                 textCol: String = "text", maxVocab: Int = 50000): DataFrame = {
    import spark.implicits._
    trainMerges(docs, nMerges, textCol, maxVocab)
      .toDF("rank", "left", "right", "merged", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("left"), col("right"),
        col("merged"), col("pair_count"))
  }
}
