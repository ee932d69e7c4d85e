package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "spark makes big data small again every day for all of us"),
    (1L, "spark makes big data small again every day for all of us"), // exact dup of 0
    (2L, "spark makes big data small again every day for all of you"), // near dup (1 trailing word)
    (3L, "an entirely different document about nothing in particular at all here"),
    (4L, "short doc")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id survivor and counts copies") {
    val out = Dedup.exact(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copies"))).toSet
    assert(out.contains((0L, 2L))) // doc 0 survives with 2 copies
    assert(out.size === 4)
  }

  test("ngram Jaccard finds exact and near duplicates, not distinct docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, tauBp = 6000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH candidates recover the true near-dup pairs here") {
    val truth = Dedup.ngramJaccardPairs(docs, tauBp = 6000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashPairs(docs, tauBp = 6000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(mh === truth) // J>=0.6 at 16x4 bands: detection prob ~0.9+; exact here
  }

  test("thresholded fuzzy pairs equal the unthresholded distance semantics") {
    // fuzzyPrefixPairs computes levenshtein(pfx1, pfx2, maxDist) — the
    // banded early-exit form whose contract is: the plain distance when
    // it is <= maxDist, -1 otherwise. Pin that contract against a
    // from-first-principles twin (full distance, then filter) on the
    // real corpus, which contains both passing and failing candidates
    // (the failing ones are exactly the rows the banded form prices
    // cheaply at scale).
    val corpus = spark.read.parquet(s"$Sf/documents.parquet")
    val base = corpus.select(col("doc_id"),
      substring(col("text"), 1, 8).as("blk"),
      substring(col("text"), 1, 32).as("pfx"))
    val a = base.select(col("doc_id").as("id1"), col("blk"), col("pfx").as("pfx1"))
    val b = base.select(col("doc_id").as("id2"), col("blk").as("blk2"), col("pfx").as("pfx2"))
    val cands = a.join(b, col("blk") === col("blk2") && col("id1") < col("id2"))
    val nCands = cands.count()
    val plain = cands
      .withColumn("dist", levenshtein(col("pfx1"), col("pfx2")).cast("long"))
      .where(col("dist") <= 8)
      .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet
    val thresholded = Dedup.fuzzyPrefixPairs(corpus)
      .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet
    assert(thresholded === plain)
    assert(plain.nonEmpty, "corpus should contain passing fuzzy pairs")
    assert(nCands > plain.size, "corpus should also exercise failing candidates")
  }

  test("charbag bound never exceeds the true edit distance (prefilter soundness)") {
    // The bag prefilter may only kill candidates the banded levenshtein
    // would reject: bag_dist_lb(bag(a), bag(b)) <= levenshtein(a, b)
    // must hold for EVERY pair, including clamp-saturated (repeated
    // chars) and class-collision (c % 16) cases.
    import graft.expressions.CharBagOps
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7)
    // Non-ASCII alphabets are the load-bearing cases: the bag counts
    // CODE POINTS (continuation bytes skipped) because a byte-count
    // bag OVERSTATES the bound on multibyte text — one 'à'→'ј'
    // substitution moves two byte-occurrences per side, and a
    // byte-based "lower bound" of 2k would kill pairs at true
    // code-point distance k that the oracle keeps.
    val alphabets = Seq("ab", "abcdefgh", "abcdefghijklmnopqrstuvwxyz0123456789 ",
      "àáâãäåјћ", "日本語テキスト漢字", "aàbј語 ")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def rs(alpha: String): String =
      Seq.fill(rnd.nextInt(40))(alpha(rnd.nextInt(alpha.length))).mkString
    var checked = 0
    for (alpha <- alphabets; _ <- 1 to 400) {
      val (x, y) = (rs(alpha), rs(alpha))
      val lb = CharBagOps.bagDistLb(
        CharBagOps.charBag64(UTF8String.fromString(x)),
        CharBagOps.charBag64(UTF8String.fromString(y)))
      val d = lev(x, y)
      assert(lb <= d, s"bag bound $lb exceeds edit distance $d for '$x' vs '$y'")
      checked += 1
    }
    assert(checked === 2400)
  }

  test("incremental minhash against stored band signatures matches the batch run") {
    val corpus = spark.read.parquet(s"$Sf/documents.parquet")
    val old = corpus.where(col("doc_id") % 5 =!= 0)
    val fresh = corpus.where(col("doc_id") % 5 === 0)
    // "stored" signatures: what a real lake persists next to the corpus
    val oldBands = Dedup.minhashBandSignatures(old)
    val inc = Dedup.incrementalMinhashPairs(fresh, old, oldBands, tauBp = 6000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val oldPairs = Dedup.minhashPairs(old, tauBp = 6000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val batch = Dedup.minhashPairs(corpus, tauBp = 6000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // incremental returns exactly the pairs touching the new batch
    assert(inc.forall { case (a, b) => a % 5 == 0 || b % 5 == 0 })
    assert((oldPairs union inc) === batch,
      s"missing=${(batch diff (oldPairs union inc)).take(5)} extra=${((oldPairs union inc) diff batch).take(5)}")
  }

  test("stored-state incremental minhash survivors equal the from-scratch labeling") {
    // The driver query's identity, end to end on the real corpus: prior
    // labels + stored bands + incremental fold-in of the new sources
    // must reproduce the full-batch labeling label for label.
    val corpus = spark.read.parquet(s"$Sf/documents.parquet")
    val isNew = pmod(xxhash64(col("source")), lit(4L)) === 0L
    val old = corpus.where(!isNew)
    val fresh = corpus.where(isNew)
    assert(old.count() > 0 && fresh.count() > 0, "split must be non-trivial")
    val bands = Dedup.minhashBandSignatures(old)
    val prior = Dedup.connectedComponents(
      Dedup.minhashPairs(old, tauBp = 6000L).select(col("id1"), col("id2")))
    val inc = Dedup.incrementalComponents(prior,
        Dedup.incrementalMinhashPairs(fresh, old, bands, tauBp = 6000L)
          .select(col("id1"), col("id2")))
      .as[(Long, Long)].collect().toSet
    val full = Dedup.connectedComponents(
        Dedup.minhashPairs(corpus, tauBp = 6000L).select(col("id1"), col("id2")))
      .as[(Long, Long)].collect().toSet
    assert(full.nonEmpty)
    assert(inc === full,
      s"missing=${(full diff inc).take(5)} extra=${(inc diff full).take(5)}")
  }

  test("minhash recall on the real corpus is >= 0.9") {
    val corpus = spark.read.parquet(s"$Sf/documents.parquet")
    val truth = Dedup.ngramJaccardPairs(corpus, tauBp = 6000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashPairs(corpus, tauBp = 6000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    assert(mh.subsetOf(truth)) // exact-verify step guarantees precision 1.0
    assert(mh.size.toDouble / truth.size >= 0.9)
  }

  test("connectedComponents collapses transitive chains to min-id canonical") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents resolves a 300-node chain (diameter >> rounds)") {
    // A path graph is the worst case for min-label propagation
    // (O(diameter) rounds); the large-star/small-star alternation must
    // collapse it to one min-rooted star within its O(log n) round cap.
    val n = 300
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.length === n)
    assert(cc.forall(_._2 == 1L), s"unresolved labels: ${cc.filter(_._2 != 1L).take(5).toSeq}")
  }

  test("incrementalComponents equals full recompute (merge, extend, singleton carry)") {
    // Old graph: {1,2,3} (min 1), {7,9} (min 7), singleton {20}.
    val oldEdges = Seq((1L, 2L), (2L, 3L), (7L, 9L), (20L, 20L)).toDF("id1", "id2")
    val prior = Dedup.connectedComponents(oldEdges)
    // New batch: EXTENDS {1..3} with 4, MERGES {1..3} and {7,9} via
    // (3,7), and adds a brand-new pair (30,31). Singleton 20 untouched.
    val newEdges = Seq((3L, 4L), (3L, 7L), (30L, 31L)).toDF("id1", "id2")
    val inc = Dedup.incrementalComponents(prior, newEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(
        oldEdges.unionAll(Seq((3L, 4L), (3L, 7L), (30L, 31L)).toDF("id1", "id2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === full)
    assert(inc(9L) === 1L, "merged component must relabel to the global min")
    assert(inc(20L) === 20L, "untouched singleton must be carried over")
    assert(inc(31L) === 30L)
  }

  test("simhash flags identical docs at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, maxDist = 3)
      .select("id1", "id2", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0L))
  }

  test("simhash wide 2x32 radius-1 blocking emits exactly the narrow 4x16 pairs") {
    // The adaptive blocking switch must be invisible in the result:
    // both schemes are lossless for Hamming <= 3 by pigeonhole and
    // share the exact bit_count verify. Drive both on the real sf
    // documents (near-dup structure included) at every legal maxDist.
    val d = graft.sources.TableLoader.load(spark, Sf, "documents")
    for (md <- 0 to 3) {
      val narrow = Dedup.simhashPairsBlocked(d, md, "doc_id", "text", wide = false)
        .select("id1", "id2", "hamming").as[(Long, Long, Long)].collect().toSet
      val wide = Dedup.simhashPairsBlocked(d, md, "doc_id", "text", wide = true)
        .select("id1", "id2", "hamming").as[(Long, Long, Long)].collect().toSet
      assert(wide === narrow, s"blocked pair sets diverge at maxDist=$md")
    }
  }

  test("pipeline corpus output is gated, deduped, and eval-free") {
    import graft.queries.TextQueries
    val real = graft.sources.TableLoader.load(spark, Sf, "documents")
    val out = TextQueries.pipelineCorpusQ(spark, Sf)
      .select("doc_id").as[Long].collect().toSet
    assert(out.nonEmpty, "pipeline dropped everything")
    assert(out.forall(_ % 29 != 0), "eval-slice doc leaked into the corpus")
    val keep = TextQueries.qualityFeatures(real).where(col("y") === 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(out.subsetOf(keep), "a low-quality doc survived the gate")
    assert(out.size < keep.count(_ % 29 != 0),
      "dedup+decontamination stages pruned nothing — pipeline is a no-op")
  }

  test("prefix-filtered exact joins equal the naive all-pairs ground truth") {
    // Corpus crafted to stress the filter's edges: exact dups, a near-dup,
    // a short quote CONTAINED in a long page (its shared shingles sort
    // LATE in the outer doc under any order — the case a two-sided prefix
    // filter would lose), boilerplate shared by everything (heavy-hitter
    // shingles that must stay OUT of df-ordered prefixes), and length
    // outliers around the t·|B| ≤ |A| length filter.
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val boiler = "all rights reserved terms of service apply here always"
    val page = s"intro words first $boiler then body text continues with many extra tokens and finally $quote"
    val corpus = Seq(
      (0L, s"spark makes big data small again every day $boiler"),
      (1L, s"spark makes big data small again every day $boiler"),
      (2L, s"spark makes big data small again every night $boiler"),
      (3L, page), (4L, quote),
      (5L, s"$boiler unrelated musings on compilers and gardens"),
      (6L, "tiny text here")
    ).toDF("doc_id", "text")
    import graft.expressions.ShingleHashes.shingleHashesNative
    val sets = corpus
      .select(col("doc_id"), shingleHashesNative(spark, col("text")).as("sh"))
      .as[(Long, Seq[Long])].collect().map { case (i, s) => i -> s.toSet }.toMap
    def naiveJac(t: Long) = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a < b && sa.nonEmpty && sb.nonEmpty
      c = (sa intersect sb).size.toLong
      // zero-overlap pairs are never materialized by the operator (the
      // inverted index can't produce them) — at tau=0 that's the
      // documented difference from a true cross join
      if c > 0
      j = math.floor(10000.0 * c / (sa.size + sb.size - c)).toLong
      if j >= t
    } yield (a, b, j)).toSet
    def naiveCont(t: Long) = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a != b && sa.nonEmpty && sb.nonEmpty
      c = (sa intersect sb).size.toLong
      if c > 0
      bp = math.floor(10000.0 * c / sa.size).toLong
      if bp >= t
    } yield (a, b, bp)).toSet
    for (t <- Seq(0L, 3000L, 6000L, 9000L, 10000L)) {
      val jac = Dedup.ngramJaccardPairs(corpus, tauBp = t)
        .as[(Long, Long, Long)].collect().toSet
      assert(jac === naiveJac(t), s"jaccard mismatch at tau=$t")
      val cont = Dedup.containmentPairs(corpus, tauBp = t)
        .as[(Long, Long, Long)].collect().toSet
      assert(cont === naiveCont(t), s"containment mismatch at tau=$t")
    }
    // the contained-quote direction specifically must survive the filter
    assert(Dedup.containmentPairs(corpus, tauBp = 9000L)
      .as[(Long, Long, Long)].collect().exists(p => p._1 == 4L && p._2 == 3L))
  }
}
