package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd vector math.
  *
  * The builtin route (`zip_with` + `aggregate`) is a higher-order function —
  * `CodegenFallback` in Spark, i.e. interpreted per row with per-element
  * lambda dispatch and boxing. For a 64-float cosine evaluated millions of
  * times in an ANN scan, that interpreter overhead dominates. These
  * expressions generate a tight primitive loop inside whole-stage codegen
  * instead (preference order per the build brief: builtins → custom
  * `Expression` with `doGenCode` → plan-level operators).
  *
  * Float elements are accumulated in double, left to right — bit-identical
  * to the `zip_with`/`aggregate` formulation, so swapping implementations
  * never changes results.
  */
object VectorExpressions {

  val CosineName = "graft_cosine"
  val DotName = "graft_dot"
  val L2Name = "graft_l2sq"
  val ArgminName = "graft_argmin_l2"
  val SubName = "graft_vec_sub"

  /** Idempotently register the functions in this session's registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(CosineName))) {
      reg.registerFunction(
        FunctionIdentifier(CosineName),
        new ExpressionInfo(classOf[CosineSimilarityExpr].getName, CosineName),
        (children: Seq[Expression]) => CosineSimilarityExpr(children(0), children(1)))
      reg.registerFunction(
        FunctionIdentifier(DotName),
        new ExpressionInfo(classOf[DotProductExpr].getName, DotName),
        (children: Seq[Expression]) => DotProductExpr(children(0), children(1)))
      reg.registerFunction(
        FunctionIdentifier(L2Name),
        new ExpressionInfo(classOf[L2SqExpr].getName, L2Name),
        (children: Seq[Expression]) => L2SqExpr(children(0), children(1)))
      reg.registerFunction(
        FunctionIdentifier(ArgminName),
        new ExpressionInfo(classOf[ArgminL2Expr].getName, ArgminName),
        (children: Seq[Expression]) => ArgminL2Expr(children(0), children(1), children(2)))
      reg.registerFunction(
        FunctionIdentifier(SubName),
        new ExpressionInfo(classOf[VecSubExpr].getName, SubName),
        (children: Seq[Expression]) => VecSubExpr(children(0), children(1)))
    }
  }

  /** Element-wise float difference `a - b` (length = min) — the residual
    * kernel for IVF-PQ; the builtin `zip_with` route is CodegenFallback
    * (interpreted per-element lambda dispatch) on the ingest hot path.
    */
  def vecSub(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(SubName, a, b)
  }

  /** Index (0-based) of the nearest of `k` centroids to `vec` by squared
    * L2, ties to the lowest index — the centroids as ONE flattened
    * float-array literal (`[c*dim + j]`). The per-corpus-row assignment
    * kernel of the IVF family: the composed form (array_min over an array
    * of k (distance, id) structs, each holding a fused l2sq call) builds
    * k struct objects per row and re-evaluates wherever the optimizer
    * inlines the alias — measured 44 s for a 200k x 64-dim x k=64 ingest
    * vs ~2 s through this single tight generated loop (PLANS.md r15).
    */
  def argminL2(spark: SparkSession, vec: Column, centroidsFlat: Column,
      k: Column): Column = {
    register(spark)
    call_function(ArgminName, vec, centroidsFlat, k)
  }

  /** Cosine similarity via the native expression (registers on demand). */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(CosineName, a, b)
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(DotName, a, b)
  }

  def l2sq(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(L2Name, a, b)
  }
}

/** cos(a,b) = a·b / (|a||b|); 0.0 when either norm is 0. Null if either
  * array is null. Array elements must be non-null floats.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = VectorExpressions.CosineName

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xi = (double) $a.getFloat($i);
        |  double $yi = (double) $b.getFloat($i);
        |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        |}
        |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
        |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** a·b in double precision (same accumulation order as the builtin route). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = VectorExpressions.DotName

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        |}
        |${ev.value} = $dot;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** argmin_c l2sq(vec, centroid_c) over a flattened centroid literal;
  * ties to the lowest index. Same accumulation arithmetic as [[L2SqExpr]].
  */
case class ArgminL2Expr(vec: Expression, cFlat: Expression, k: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cFlat
  override def third: Expression = k

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cFlat.dataType, k.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>, int), got " +
          s"(${vec.dataType.simpleString}, ${cFlat.dataType.simpleString}, ${k.dataType.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = VectorExpressions.ArgminName

  override def nullSafeEval(v: Any, cf: Any, kAny: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val c = cf.asInstanceOf[ArrayData]
    val kk = kAny.asInstanceOf[Int]
    val dim = c.numElements() / kk
    var best = 0
    var bestD = Double.MaxValue
    var ci = 0
    while (ci < kk) {
      var d = 0.0
      val base = ci * dim
      var j = 0
      while (j < dim) {
        val t = x.getFloat(j).toDouble - c.getFloat(base + j).toDouble
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = ci }
      ci += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cf, kk) => {
      val dim = ctx.freshName("dim")
      val ci = ctx.freshName("ci")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
        |int $dim = $cf.numElements() / $kk;
        |int $best = 0; double $bestD = Double.MAX_VALUE;
        |for (int $ci = 0; $ci < $kk; $ci++) {
        |  double $d = 0.0;
        |  int $base = $ci * $dim;
        |  for (int $j = 0; $j < $dim; $j++) {
        |    double $t = ((double) $v.getFloat($j)) - ((double) $cf.getFloat($base + $j));
        |    $d += $t * $t;
        |  }
        |  if ($d < $bestD) { $bestD = $d; $best = $ci; }
        |}
        |${ev.value} = $best;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): Expression = copy(vec = a, cFlat = b, k = c)
}

/** Element-wise float difference (length = min of the operands). */
case class VecSubExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = VectorExpressions.SubName

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = x.getFloat(i) - y.getFloat(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |float[] $out = new float[$n];
        |for (int $i = 0; $i < $n; $i++) {
        |  $out[$i] = $a.getFloat($i) - $b.getFloat($i);
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance in double precision. */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = VectorExpressions.L2Name

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $d = ((double) $a.getFloat($i)) - ((double) $b.getFloat($i));
        |  $acc += $d * $d;
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
