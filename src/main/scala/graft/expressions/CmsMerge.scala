package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.util.sketch.CountMinSketch

/** Distributed merge of serialized [[CountMinSketch]] bytes — the
  * aggregate Spark's builtin surface is missing (HLL has
  * `hll_union_agg`, KLL has `kll_merge_agg_bigint`; CMS has only the
  * build-side `count_min_sketch`). CMS merge is cell-wise counter
  * addition: associative and commutative, so partial aggregation is
  * EXACT — map-side partials merge whatever sketch rows each partition
  * holds, the final reduce merges one partial per partition on an
  * executor, and the plan never ships the full calendar of sketches to
  * one process. Input sketches must share (depth, width, seed);
  * [[CountMinSketch.mergeInPlace]] throws `IncompatibleMergeException`
  * otherwise, which is the correct loud failure for mixed-shape state.
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = CountMinSketch.readFrom(
        new ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      if (buf == null) sk else { buf.mergeInPlace(sk); buf }
    }
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch =
    if (a == null) b
    else if (b == null) a
    else { a.mergeInPlace(b); a }

  override def eval(buf: CountMinSketch): Any =
    if (buf == null) null else CmsMergeAgg.toBytes(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] =
    if (buf == null) Array.emptyByteArray else CmsMergeAgg.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null
    else CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_merge expects binary count-min sketch bytes, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_merge"

  override def withNewMutableAggBufferOffset(n: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
}

object CmsMergeAgg {
  private[expressions] def toBytes(sk: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    sk.writeTo(out)
    out.toByteArray
  }

  @volatile private var registered = Set.empty[SparkSession]

  /** Shared builders for both registration paths (extension inject and
    * registry register) — one definition, no drift. */
  def buildMerge(exprs: Seq[Expression]): Expression =
    CmsMergeAgg(exprs.head).toAggregateExpression()
  def buildEstimate(exprs: Seq[Expression]): Expression =
    CmsEstimate(exprs(0), exprs(1))
  def buildEstimateAll(exprs: Seq[Expression]): Expression =
    CmsEstimateAll(exprs(0), exprs(1))

  /** Register `cms_merge`/`cms_estimate` in the session registry
    * (idempotent) — registry-based exposure keeps us off Spark 4's
    * private Column internals, same pattern as [[FloatVecDot]]. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "cms_merge", buildMerge _, "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "cms_estimate", buildEstimate _, "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "cms_estimate_all", buildEstimateAll _, "built-in")
      registered += spark
    }
  }

  def mergeCol(spark: SparkSession, sk: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("cms_merge", sk)
  }

  def estimateCol(spark: SparkSession, sk: Column, key: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("cms_estimate", sk, key)
  }

  def estimateAllCol(spark: SparkSession, sk: Column, keys: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("cms_estimate_all", sk, keys)
  }
}

/** Point-estimate lookup against serialized CMS bytes:
  * `cms_estimate(sk, key)` = the sketch's (one-sided, never-under)
  * count estimate for `key`. Deserialization is memoized per expression
  * instance (tasks get their own serialized copies, so the cache is
  * task-local and thread-confined): the common shape — a single merged
  * sketch broadcast against a bounded candidate list — deserializes
  * once per task and answers each row with `estimateCount` only. The
  * memo is EXACT: a 64-bit fingerprint of 16 stride-sampled 8-byte
  * windows serves as a cheap NEGATIVE filter (fingerprints differ ->
  * definitely a different sketch -> re-deserialize without touching
  * the cached bytes), and a fingerprint match is CONFIRMED by a full
  * memcmp against the retained bytes before the cached sketch is
  * trusted. Sampled bytes alone were not a safe key: two sparse
  * same-shape monthly sketches can agree on every sampled window (most
  * counter cells are zero), and a false hit would silently answer from
  * the wrong month. The memcmp costs one vectorized pass over the
  * sketch per row on the hit path — bounded by design, the candidate
  * list is calendar x k rows, never a fact scan. Not codegen'd for the
  * same reason.
  */
/** Batch point-estimate lookup: `cms_estimate_all(sk, keys)` = the
  * sketch's estimates for EVERY key of an array<long>, one
  * deserialization per sketch ROW instead of per (sketch, key) pair.
  * Exists because the per-key form's exact task-local memo must
  * confirm a fingerprint hit with a full memcmp of the sketch bytes —
  * sound, but a serve that fans one broadcast ~1.1 MB merged sketch
  * across thousands of candidate rows pays one megabyte-scale
  * compare-and-copy PER ROW (~2.1 s of the stored heavy-hitter serve's
  * 2.4 s at sf0.1, in one task). Here the bounded candidate list rides
  * ONE array cell, the sketch bytes are read once, and each key costs
  * exactly `estimateCount` — the same estimates, row for row. */
case class CmsEstimateAll(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, org.apache.spark.sql.types.ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate_all expects (binary, array<bigint>), got ($l, $r)")
    }

  override protected def nullSafeEval(sk: Any, keys: Any): Any = {
    val sketch = CountMinSketch.readFrom(
      new ByteArrayInputStream(sk.asInstanceOf[Array[Byte]]))
    val arr = keys.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) { out(i) = sketch.estimateCount(arr.getLong(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_estimate_all"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateAll =
    copy(left = newLeft, right = newRight)
}

case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFp: Long = 0L
  @transient private var cachedSketch: CountMinSketch = _

  /** 64-bit mix of 16 8-byte windows at even strides across the array
    * (covering head and tail) — reads 128 bytes regardless of sketch
    * size. */
  private def fingerprint(b: Array[Byte]): Long = {
    val n = b.length
    var h = n.toLong * 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 16) {
      val off = if (n <= 8) 0 else (i.toLong * (n - 8) / 15).toInt
      var w = 0L
      var j = 0
      while (j < 8 && off + j < n) { w = (w << 8) | (b(off + j) & 0xffL); j += 1 }
      h ^= w
      h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33
      i += 1
    }
    h
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, bigint), got ($l, $r)")
    }

  override protected def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    val fp = fingerprint(bytes)
    val hit = cachedSketch != null && fp == cachedFp &&
      java.util.Arrays.equals(bytes, cachedBytes)
    if (!hit) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
      cachedFp = fp
    }
    cachedSketch.estimateCount(key.asInstanceOf[Long])
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
