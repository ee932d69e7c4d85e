package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for LLM training-data pipelines, from exact
  * ground truth to the hash-sketch scale paths.
  *
  * Scale design (100 TB): every variant is a shuffle-on-key groupBy or a
  * bucket-equijoin — never an unblocked O(n^2) cross join. The exact
  * Jaccard pair finder is band-blocked and exists as the small-scale
  * oracle for MinHash/SimHash recall; MinHash-LSH is the production path
  * (shuffle keyed on (band, band-signature), candidate pairs verified
  * with exact Jaccard afterwards).
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per distinct text. A single
    * hash-partitioned groupBy on the text's rolling hash — at scale this
    * shuffles 8-byte keys, not documents. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("text_hash", rollingHash(col(textCol)))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("copies"))

  /** Exact word-3-gram Jaccard similar pairs with shingle-count banding:
    * a pair at Jaccard >= tau must have |A| within a factor
    * [tau, 1/tau] of |B|, so candidates join only within overlapping
    * size bands instead of a full cross join. */
  def ngramJaccardPairs(docs: DataFrame, tauBp: Long,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withSh = docs.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol)).as("sh"))
      .withColumn("n_sh", size(col("sh")).cast("long"))
      .where(col("n_sh") > 0)
    // size band: log2-scaled buckets; a tau>=0.5 pair differs by at most
    // one bucket, so each doc probes its own and the adjacent bucket.
    val banded = withSh.withColumn(
      "band", floor(log(col("n_sh").cast("double")) / math.log(2.0)).cast("long"))
    val probes = banded.select(col("id"), col("sh"), col("n_sh"),
      explode(array(col("band"), col("band") + 1)).as("probe_band"))
    val a = probes.toDF("a_id", "a_sh", "a_n", "a_band")
    val b = banded.toDF("b_id", "b_sh", "b_n", "b_band")
    a.join(b, col("a_band") === col("b_band") && col("a_id") < col("b_id"))
      .withColumn("jaccard_bp", jaccardBp(col("a_sh"), col("b_sh")))
      .where(col("jaccard_bp") >= tauBp)
      .select(col("a_id").as("id1"), col("b_id").as("id2"), col("jaccard_bp"))
      .distinct()
  }

  // ---- MinHash ----

  /** Deterministic affine hash family over token hashes:
    * h_i(t) = (a_i * t + b_i) mod P. Constants from a splitmix-style
    * stream so every run/executor derives the same family. */
  val MinHashP = 2147483647L
  val NumPerms = 64
  val Bands = 16
  val RowsPerBand: Int = NumPerms / Bands
  val perms: IndexedSeq[(Long, Long)] = {
    var s = 42L
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33) % MinHashP
    }
    IndexedSeq.fill(NumPerms)((next() | 1L, next()))
  }

  /** MinHash signature (array of NumPerms longs) of the shingle-hash set. */
  def signature(shingleHashesCol: Column): Column = {
    val sigs = perms.map { case (a, b) =>
      array_min(transform(shingleHashesCol, t => (t * a + b) % MinHashP))
    }
    array(sigs: _*)
  }

  /** MinHash + LSH banding near-dup pairs, exact-Jaccard verified.
    * Candidate generation shuffles on (band index, band signature) —
    * the 100 TB path. `tauBp` filters the verified pairs. */
  def minhashPairs(docs: DataFrame, tauBp: Long,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = docs.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol)).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", signature(col("sh")))
    val bands = sigs.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)),
        bd => concat_ws(",", transform(slice(col("sig"), bd * RowsPerBand + 1, lit(RowsPerBand)),
          _.cast("string"))))).as(Seq("band", "band_sig")))
    val a = bands.toDF("a_id", "a_sh", "band", "band_sig")
    val b = bands.toDF("b_id", "b_sh", "band2", "band_sig2")
    a.join(b, col("band") === col("band2") && col("band_sig") === col("band_sig2") &&
        col("a_id") < col("b_id"))
      .select(col("a_id").as("id1"), col("b_id").as("id2"), col("a_sh"), col("b_sh"))
      .distinct()
      .withColumn("jaccard_bp", jaccardBp(col("a_sh"), col("b_sh")))
      .where(col("jaccard_bp") >= tauBp)
      .select(col("id1"), col("id2"), col("jaccard_bp"))
  }

  // ---- SimHash ----

  /** 64-bit SimHash over distinct word-token xxhash64 values, returned as
    * an array of 4 x 16-bit segment values plus the packed long. Pairs
    * within Hamming distance <= 3 share at least one of the 4 segments
    * (pigeonhole), so blocking joins on segment values. */
  def simhash(textCol: Column): Column = {
    val tokHashes = array_distinct(transform(split(textCol, " "), t => xxhash64(t)))
    val bits = (0 until 64).map { j =>
      val vote = aggregate(tokHashes, lit(0L),
        (acc, t) => acc + when(shiftrightunsigned(t, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L)).otherwise(lit(0L))
    }
    array(bits: _*)
  }

  /** SimHash near-dup pairs at Hamming distance <= maxDist (<= 3 for the
    * 4-segment blocking to be lossless). */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxDist <= 3, "4-segment blocking covers Hamming distance <= 3")
    val withSig = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("bits"))
      .withColumn("segs", transform(sequence(lit(0), lit(3)),
        s => concat_ws(",", transform(slice(col("bits"), s * 16 + 1, lit(16)), _.cast("string")))))
    val seg = withSig.select(col("id"), col("bits"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))
    val a = seg.toDF("a_id", "a_bits", "seg_idx", "seg")
    val b = seg.toDF("b_id", "b_bits", "seg_idx2", "seg2")
    a.join(b, col("seg_idx") === col("seg_idx2") && col("seg") === col("seg2") &&
        col("a_id") < col("b_id"))
      .select(col("a_id").as("id1"), col("b_id").as("id2"), col("a_bits"), col("b_bits"))
      .distinct()
      .withColumn("hamming",
        aggregate(zip_with(col("a_bits"), col("b_bits"),
          (x, y) => when(x =!= y, 1L).otherwise(0L)), lit(0L), (acc, v) => acc + v))
      .where(col("hamming") <= maxDist)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}
