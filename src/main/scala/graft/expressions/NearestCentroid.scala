package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}
import org.apache.spark.sql.{Column, SparkSession}

/** Single-pass nearest-centroid assignment: argmax over k normalized
  * centroid projections of one `array<float>` vector in one compiled
  * loop over the flattened centroid matrix.
  *
  * Bit-identical to the Column formulation it replaces
  * (`array_position(projs, array_max(projs))` over k
  * `vec_dot(vec, lit(c_i)) / lit(norm_i)` entries): each projection is
  * the same in-order double fold over min(vecLen, dim) elements divided
  * by the same construction-time norm, and the argmax keeps the FIRST
  * maximal index (strict `>` scan == first-position-of-max). Exists for
  * the same reason as [[LshBands]]: k literal-array dot products summed
  * through an array constructor grow an expression tree that falls out
  * of whole-stage codegen once k is tens-large, which is exactly where
  * an adaptive (sqrt-of-corpus) centroid count operates. One static
  * call per row keeps Lloyd training AND full-corpus assignment
  * map-only and compiled at any k.
  */
object CentroidOps {
  /** `flat` = row-major k x dim centroid matrix; `norms(i)` = L2 norm of
    * centroid i computed at construction (same in-order double sum as
    * the literal formulation). Returns the first argmax index. */
  def nearest(vec: ArrayData, flat: Array[Float], norms: Array[Double], dim: Int): Int = {
    val n = math.min(vec.numElements(), dim)
    val k = norms.length
    var best = 0
    var bestV = Double.NegativeInfinity
    var i = 0
    while (i < k) {
      // A zero-norm centroid projects to 0/0 = NaN. Spark's ordering
      // ranks NaN ABOVE every double, so the literal formulation's
      // array_max/array_position pair selected the FIRST NaN index —
      // reproduce that exactly (a strict `>` scan would silently skip
      // NaN and pick the best finite centroid instead).
      if (norms(i) == 0.0) return i
      var acc = 0.0
      var j = 0
      val base = i * dim
      while (j < n) { acc += vec.getFloat(j).toDouble * flat(base + j).toDouble; j += 1 }
      val v = acc / norms(i)
      if (v > bestV) { bestV = v; best = i }
      i += 1
    }
    best
  }
}

case class NearestCentroid(child: Expression, cents: Array[Array[Float]])
    extends UnaryExpression {

  @transient private lazy val dim: Int = cents(0).length
  @transient private lazy val flat: Array[Float] = {
    val out = new Array[Float](cents.length * dim)
    var i = 0
    while (i < cents.length) {
      System.arraycopy(cents(i), 0, out, i * dim, dim)
      i += 1
    }
    out
  }
  @transient private lazy val norms: Array[Double] =
    cents.map(cv => math.sqrt(cv.map(x => x.toDouble * x.toDouble).sum))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) if cents.nonEmpty =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects an array<float> vector and a non-empty " +
            s"centroid matrix, got ($other, k=${cents.length})")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(v: Any): Any =
    CentroidOps.nearest(v.asInstanceOf[ArrayData], flat, norms, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centFlat", flat, "float[]")
    val normRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CentroidOps.nearest($c, $flatRef, $normRef, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  @volatile private var registered = Set.empty[SparkSession]

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nearest_centroid", { exprs: Seq[Expression] =>
          // The centroid matrix rides a foldable array<array<float>>
          // literal; materialize it once at build time.
          val m = exprs(1).eval().asInstanceOf[ArrayData]
          val cents = Array.tabulate(m.numElements()) { i =>
            m.getArray(i).toFloatArray()
          }
          NearestCentroid(exprs(0), cents)
        }, "built-in")
      registered += spark
    }
  }

  def nearestCol(spark: SparkSession, vec: Column, cents: Array[Array[Float]]): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("nearest_centroid", vec,
      org.apache.spark.sql.functions.typedLit(cents.map(_.toSeq).toSeq))
  }
}
