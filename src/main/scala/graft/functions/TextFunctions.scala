package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for LLM-data pipelines.
  *
  * Everything here is a pure `Column` composition over
  * `org.apache.spark.sql.functions` — no Scala/Python UDFs — so the whole
  * pipeline stays inside whole-stage codegen and Catalyst can push
  * projections/filters through it. Arithmetic is integer/long (rolling
  * hashes, basis-point ratios) so results are bit-exact and portable
  * across engines (the driver's DuckDB oracle re-derives them).
  *
  * Capability analog: the reference's text-ish preprocessing
  * (/root/reference/prefect/flows/ingest_web_to_gcs.py:100-135 renames,
  * casts and code-maps string columns); here generalised to the text
  * operators a 100 TB training-data pipeline needs.
  */
object TextFunctions {
  /** Modulus for rolling hashes: fits 64-bit under `acc*31+255`. */
  val HashMod = 1000000007L

  /** Count non-overlapping occurrences of literal `marker`. */
  def occurrences(c: Column, marker: String): Column =
    ((length(c) - length(replace(c, lit(marker), lit("")))) / marker.length).cast("long")

  /** Whitespace word tokens (synthetic corpus is single-space separated). */
  def words(c: Column): Column = split(c, " ")

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column = size(words(c)).cast("long")

  /** BPE-ish token count: runs of word chars or single punctuation. */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("""\w+|[^\w\s]"""), lit(0))).cast("long")

  /** Polynomial rolling hash (base 31, mod 1e9+7) over char codes —
    * deterministic document/shingle fingerprint, identical in any engine
    * with 64-bit integer math. */
  def rollingHash(c: Column): Column = rollingHashWith(c, 31L, HashMod)

  /** Second independent family (base 131, mod 998244353) — pairing two
    * rolling hashes gives ~60 bits of key space, enough to make
    * exact-dedup collisions negligible at billions of documents while
    * both hashes stay SQL-expressible for the oracle. */
  val HashMod2 = 998244353L
  def rollingHash2(c: Column): Column = rollingHashWith(c, 131L, HashMod2)

  def rollingHashWith(c: Column, base: Long, mod: Long): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * base + x) % mod)

  /** Punctuation character count. */
  def punctCount(c: Column): Column =
    length(regexp_replace(c, "[^.!?,;:]", "")).cast("long")

  /** Lower-case alpha character count. */
  def alphaCount(c: Column): Column =
    length(regexp_replace(c, "[^a-z]", "")).cast("long")

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Stopword token count (fixed stopword list). */
  def stopwordCount(c: Column): Column =
    size(filter(words(c), w => w.isin(Stopwords: _*))).cast("long")

  /** Integer basis points (floor(1e4 * num/den)) — exact cross-engine ratio. */
  def bp(num: Column, den: Column): Column =
    floor(lit(10000.0) * num / den).cast("long")

  /** Language-ID marker tokens per language (heuristic n-gram scoring:
    * count of language-marker tokens, argmax with alphabetical
    * tie-break). Deterministic and cheap at 100 TB — one pass of string
    * scans per document, no model. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "window", "hash"),
    "en" -> Seq("the", "data", "fast"),
    "es" -> Seq("el", "query", "row"),
    "fr" -> Seq("le", "merge", "sort"),
    "zh" -> Seq("stream", "vector", "spark"))

  /** Marker score for one language over space-padded text. */
  def langScore(c: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    markers.map(m => occurrences(padded, s" $m ")).reduce(_ + _)
  }

  /** Predicted language code: argmax of marker scores, ties broken by
    * language-code order (de < en < es < fr < zh). */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (code, ms) => code -> langScore(c, ms) }
    // CASE WHEN s_de >= all others THEN 'de' WHEN s_en >= rest ... — the
    // same argmax the oracle SQL states, so ties resolve identically.
    val (lastCode, _) = scores.last
    scores.init.zipWithIndex.foldRight(lit(lastCode)) { case (((code, s), i), els) =>
      val rest = scores.drop(i + 1).map(_._2)
      when(rest.map(r => s >= r).reduce(_ && _), lit(code)).otherwise(els)
    }
  }

  /** Word n-gram shingles ("w1 w2 w3" strings); empty array when the
    * document has fewer than `n` words. */
  def wordShingles(c: Column, n: Int = 3): Column = {
    val ws = words(c)
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct rolling-hashes of the word 3-gram shingles — the document
    * representation for Jaccard / MinHash dedup. */
  def shingleHashes(c: Column, n: Int = 3): Column =
    array_distinct(transform(wordShingles(c, n), s => rollingHash(s)))

  /** Exact Jaccard similarity of two shingle-hash arrays, in basis points. */
  def jaccardBp(a: Column, b: Column): Column =
    bp(size(array_intersect(a, b)).cast("long"), size(array_union(a, b)).cast("long"))
}
