package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native codegen'd dot product over two `array<float>` columns,
  * accumulating left-to-right in double — bit-identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0D, +)`
  * but compiled into the whole-stage-codegen loop instead of Spark's
  * interpreted higher-order-function path (ZipWith/ArrayAggregate are
  * CodegenFallback), which dominates brute-force similarity scans.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float> inputs, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  @volatile private var registered = Set.empty[SparkSession]

  /** Register `vec_dot` in the session's function registry (idempotent)
    * and return a Column builder. Registry-based exposure keeps us off
    * Spark 4's private Column internals. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "vec_dot", { exprs: Seq[Expression] => FloatVecDot(exprs(0), exprs(1)) }, "built-in")
      registered += spark
    }
  }

  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    // call_udf resolves through the function registry at analysis time
    org.apache.spark.sql.functions.call_udf("vec_dot", a, b)
  }
}
