package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the packed character-bag edit-distance prefilter.
  *
  * `charBag64` folds a string into 16 four-bit character-class counts
  * (class = byte % 16, count clamped at 15) packed into one long.
  * `bagDistLb` reads two packed bags and returns
  * `max(Σ positive lane diffs, Σ negative lane diffs)` — a LOWER BOUND
  * on the true edit distance: every edit operation changes at most one
  * character occurrence, so turning string a into string b needs at
  * least as many operations as the larger one-sided multiset
  * difference of their character bags; coarsening chars into 16
  * classes and clamping counts at 15 can only SHRINK the measured
  * difference, so the bound stays conservative (never kills a pair the
  * real distance would keep). The per-pair cost is 16 shift/mask/diff
  * integer ops against the O(len * maxDist) banded Levenshtein it
  * gates.
  */
object CharBagOps {
  def charBag64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](16)
    var i = 0
    while (i < bytes.length) {
      counts(bytes(i) & 0xF) += 1
      i += 1
    }
    var packed = 0L
    i = 0
    while (i < 16) {
      val c = if (counts(i) > 15) 15 else counts(i)
      packed |= c.toLong << (i * 4)
      i += 1
    }
    packed
  }

  def bagDistLb(a: Long, b: Long): Int = {
    var plus = 0
    var minus = 0
    var i = 0
    while (i < 16) {
      val d = ((a >>> (i * 4)) & 0xFL).toInt - ((b >>> (i * 4)) & 0xFL).toInt
      if (d > 0) plus += d else minus -= d
      i += 1
    }
    if (plus > minus) plus else minus
  }
}

/** Codegen'd packed character bag of a string — the build-side half of
  * the fuzzy-join prefilter: projected once per row, carried through
  * the exchange as 8 bytes. */
case class CharBag64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "charbag64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"charbag64 expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharBagOps.charBag64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharBagOps.charBag64($c)")

  override protected def withNewChildInternal(newChild: Expression): CharBag64 =
    copy(child = newChild)
}

/** Codegen'd bag-distance lower bound over two packed bags — the
  * per-candidate half of the prefilter, evaluated inside the join
  * condition ahead of the banded Levenshtein. */
case class BagDistLb(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bag_dist_lb"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bag_dist_lb expects (bigint, bigint), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CharBagOps.bagDistLb(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.CharBagOps.bagDistLb($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BagDistLb =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for the 128-bit bigram Bloom sketch (built as two
  * 64-bit halves, `part` 0/1): bit `h(g) & 63` of half `h(g) >> 6` is
  * set for every byte bigram g of the string. Paired with Ukkonen's
  * q-gram bound it yields the fuzzy join's strongest cheap kill:
  * `editDist(a, b) >= |bigrams(a) \ bigrams(b)| / 2` (one edit touches
  * at most 2 overlapping bigrams), and `popcount(A & ~B)` can only
  * UNDER-count that set difference (a set bit in `A & ~B` certifies at
  * least one a-only bigram; collisions merge several onto one bit and
  * a shared bit can hide an a-only bigram behind a colliding b-bigram
  * — both directions only shrink the count), so
  * `popcount(A & ~B) > 2 * maxDist` certifies distance > maxDist while
  * every true match is GUARANTEED to survive. The per-candidate test
  * is builtin `bit_count` over AND-NOTs — fully codegen'd, no kernel
  * call. */
object BigramSketchOps {
  def bigramSketch64(s: UTF8String, part: Int): Long = {
    val bytes = s.getBytes
    var sk = 0L
    var i = 0
    while (i < bytes.length - 1) {
      val h = ((bytes(i) & 0xFF) * 131 + (bytes(i + 1) & 0xFF)) * 0x9E3779B1
      val p = h >>> 25 // 7 bits: [0, 128)
      if ((p >>> 6) == part) sk |= 1L << (p & 63)
      i += 1
    }
    sk
  }
}

/** Codegen'd half of the 128-bit bigram Bloom sketch (see
  * [[BigramSketchOps]]); `part` selects the 64-bit half. Projected once
  * per row on the build side — 16 bytes/row through the exchange. */
case class BigramSketch64(child: Expression, part: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bigram_sketch64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if part == 0 || part == 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"bigram_sketch64 part must be 0 or 1, got $part")
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_sketch64 expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    BigramSketchOps.bigramSketch64(input.asInstanceOf[UTF8String], part)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.BigramSketchOps.bigramSketch64($c, $part)")

  override protected def withNewChildInternal(newChild: Expression): BigramSketch64 =
    copy(child = newChild)
}

object BigramSketch64 {
  @volatile private var registered = Set.empty[org.apache.spark.sql.SparkSession]

  def register(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bigram_sketch64",
        { exprs: Seq[Expression] =>
          val part = exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => other.eval().asInstanceOf[Int]
          }
          BigramSketch64(exprs.head, part)
        }, "built-in")
      registered += spark
    }
  }

  def sketchCol(spark: org.apache.spark.sql.SparkSession,
                s: org.apache.spark.sql.Column,
                part: Int): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf(
      "bigram_sketch64", s, org.apache.spark.sql.functions.lit(part))
  }
}

object CharBag64 {
  @volatile private var registered = Set.empty[org.apache.spark.sql.SparkSession]

  def register(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "charbag64",
        { exprs: Seq[Expression] => CharBag64(exprs.head) }, "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bag_dist_lb",
        { exprs: Seq[Expression] => BagDistLb(exprs(0), exprs(1)) }, "built-in")
      registered += spark
    }
  }

  def bagCol(spark: org.apache.spark.sql.SparkSession,
             s: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("charbag64", s)
  }

  def lbCol(spark: org.apache.spark.sql.SparkSession,
            a: org.apache.spark.sql.Column,
            b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_udf("bag_dist_lb", a, b)
  }
}
