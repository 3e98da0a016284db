package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native codegen'd product-quantization kernels.
  *
  * The composed-builtin route — per (subspace, code) one fused `graft_l2sq`
  * call inside `array_min(array(struct(...)))` — builds an expression tree
  * of m×codes custom expressions (512 at the defaults). That tree GENERATES
  * code past janino's 64 KB method limit, so whole-stage codegen fails to
  * compile and Spark silently falls back to INTERPRETED execution for the
  * hottest projections in the IVF-PQ path (observed on every encode/LUT
  * stage of q_ann_ivfpq). These expressions keep the whole kernel in ONE
  * tight generated loop over the flattened codebook literal instead: code
  * size is constant in m and codes, and the arithmetic is bit-identical to
  * the expression-tree form (per-subspace argmin of left-to-right double
  * L2, ties to the lowest code).
  */
object PqExpressions {

  val EncodeName = "graft_pq_encode"
  val LutName = "graft_pq_lut"

  /** Idempotently register the functions in this session's registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(EncodeName))) {
      reg.registerFunction(
        FunctionIdentifier(EncodeName),
        new ExpressionInfo(classOf[PqEncodeExpr].getName, EncodeName),
        (children: Seq[Expression]) =>
          PqEncodeExpr(children(0), children(1), children(2), children(3)))
      reg.registerFunction(
        FunctionIdentifier(LutName),
        new ExpressionInfo(classOf[PqLutExpr].getName, LutName),
        (children: Seq[Expression]) =>
          PqLutExpr(children(0), children(1), children(2), children(3)))
    }
  }

  /** Packed PQ codes (one bigint, code of subspace s in byte s) of `vec`
    * against the flattened codebook literal `cbFlat` (layout:
    * `[(s*codes + c) * sub + j]`).
    */
  def encode(spark: SparkSession, vec: Column, cbFlat: Column, m: Column,
      codes: Column): Column = {
    register(spark)
    call_function(EncodeName, vec, cbFlat, m, codes)
  }

  /** The per-query ADC lookup table: entry `s*codes + c` = squared L2
    * between `vec`'s s-th subvector and code c's centroid.
    */
  def lut(spark: SparkSession, vec: Column, cbFlat: Column, m: Column,
      codes: Column): Column = {
    register(spark)
    call_function(LutName, vec, cbFlat, m, codes)
  }
}

private[functions] trait PqExprBase extends QuaternaryExpression {
  def vec: Expression
  def cbFlat: Expression
  def m: Expression
  def codes: Expression

  override def first: Expression = vec
  override def second: Expression = cbFlat
  override def third: Expression = m
  override def fourth: Expression = codes

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cbFlat.dataType, m.dataType, codes.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>, int, int), got " +
          s"(${vec.dataType.simpleString}, ${cbFlat.dataType.simpleString}, " +
          s"${m.dataType.simpleString}, ${codes.dataType.simpleString})")
    }
}

/** Packed per-subspace argmin codes — the [[PqExpressions]] encode kernel. */
case class PqEncodeExpr(vec: Expression, cbFlat: Expression, m: Expression,
    codes: Expression) extends PqExprBase {

  override def dataType: DataType = LongType
  override def prettyName: String = PqExpressions.EncodeName

  override def nullSafeEval(v: Any, cb: Any, mAny: Any, kAny: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val c = cb.asInstanceOf[ArrayData]
    val mm = mAny.asInstanceOf[Int]
    val kk = kAny.asInstanceOf[Int]
    val sub = c.numElements() / (mm * kk)
    var out = 0L
    var s = 0
    while (s < mm) {
      var best = 0
      var bestD = Double.MaxValue
      var code = 0
      while (code < kk) {
        var d = 0.0
        val base = (s * kk + code) * sub
        var j = 0
        while (j < sub) {
          val t = x.getFloat(s * sub + j).toDouble - c.getFloat(base + j).toDouble
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = code }
        code += 1
      }
      out |= best.toLong << (8 * s)
      s += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, mm, kk) => {
      val sub = ctx.freshName("sub")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
        |int $sub = $cb.numElements() / ($mm * $kk);
        |long $out = 0L;
        |for (int $s = 0; $s < $mm; $s++) {
        |  int $best = 0; double $bestD = Double.MAX_VALUE;
        |  for (int $c = 0; $c < $kk; $c++) {
        |    double $d = 0.0;
        |    int $base = ($s * $kk + $c) * $sub;
        |    for (int $j = 0; $j < $sub; $j++) {
        |      double $t = ((double) $v.getFloat($s * $sub + $j))
        |        - ((double) $cb.getFloat($base + $j));
        |      $d += $t * $t;
        |    }
        |    if ($d < $bestD) { $bestD = $d; $best = $c; }
        |  }
        |  $out |= ((long) $best) << (8 * $s);
        |}
        |${ev.value} = $out;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(vec = a, cbFlat = b, m = c, codes = d)
}

/** ADC lookup-table kernel: array<double> of m*codes subspace distances. */
case class PqLutExpr(vec: Expression, cbFlat: Expression, m: Expression,
    codes: Expression) extends PqExprBase {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = PqExpressions.LutName

  override def nullSafeEval(v: Any, cb: Any, mAny: Any, kAny: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val c = cb.asInstanceOf[ArrayData]
    val mm = mAny.asInstanceOf[Int]
    val kk = kAny.asInstanceOf[Int]
    val sub = c.numElements() / (mm * kk)
    val out = new Array[Double](mm * kk)
    var s = 0
    while (s < mm) {
      var code = 0
      while (code < kk) {
        var d = 0.0
        val base = (s * kk + code) * sub
        var j = 0
        while (j < sub) {
          val t = x.getFloat(s * sub + j).toDouble - c.getFloat(base + j).toDouble
          d += t * t
          j += 1
        }
        out(s * kk + code) = d
        code += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, mm, kk) => {
      val sub = ctx.freshName("sub")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      s"""
        |int $sub = $cb.numElements() / ($mm * $kk);
        |double[] $out = new double[$mm * $kk];
        |for (int $s = 0; $s < $mm; $s++) {
        |  for (int $c = 0; $c < $kk; $c++) {
        |    double $d = 0.0;
        |    int $base = ($s * $kk + $c) * $sub;
        |    for (int $j = 0; $j < $sub; $j++) {
        |      double $t = ((double) $v.getFloat($s * $sub + $j))
        |        - ((double) $cb.getFloat($base + $j));
        |      $d += $t * $t;
        |    }
        |    $out[$s * $kk + $c] = $d;
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(vec = a, cbFlat = b, m = c, codes = d)
}
