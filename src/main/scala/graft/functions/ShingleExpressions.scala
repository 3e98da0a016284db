package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash shingle expression: distinct 64-bit hashes of every n-byte
  * window of the input string, in ONE pass over the bytes with a polynomial
  * rolling hash + avalanche mix — no per-shingle substring allocation, no
  * higher-order-function per-element interpretation.
  *
  * This is the true "rolling hash" fingerprint primitive: the builtin
  * composition (`transform(sequence(...), i -> substr ...)` + `xxhash64`
  * per element) allocates a string per position and pays lambda dispatch
  * per element; this expression is a byte loop per ROW (CodegenFallback is
  * fine at row granularity — the pathological interpreter cost is
  * per-element, SNIPPETS.md HOF notes).
  *
  * Byte-windows (not char-windows): for ASCII they coincide; for multi-byte
  * scripts a window covers fewer characters — an equally valid shingle
  * family for MinHash (any deterministic local fingerprint works), chosen
  * for the zero-allocation loop.
  */
case class ShingleHashesExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if right.foldable => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, literal int), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = ShingleExpressions.ShinglesName

  override def nullSafeEval(str: Any, nAny: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    val n = nAny.asInstanceOf[Int]
    val len = bytes.length
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](math.max(16, len - n + 1))
    val out = new Array[Long](len - n + 1)
    var outN = 0
    var pow = 1L
    var i = 1
    while (i < n) { pow *= 31L; i += 1 }
    var h = 0L
    i = 0
    while (i < n) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    var mixed = ShingleExpressions.mix(h)
    if (seen.add(mixed)) { out(outN) = mixed; outN += 1 }
    i = n
    while (i < len) {
      h = (h - (bytes(i - n) & 0xffL) * pow) * 31L + (bytes(i) & 0xffL)
      mixed = ShingleExpressions.mix(h)
      if (seen.add(mixed)) { out(outN) = mixed; outN += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleExpressions {
  val ShinglesName = "graft_shingle_hashes"

  /** 64-bit avalanche finalizer (splitmix64 tail — public-domain constant
    * mix used across hash literature) to spread the weak polynomial state.
    */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(ShinglesName))) {
      reg.registerFunction(
        FunctionIdentifier(ShinglesName),
        new ExpressionInfo(classOf[ShingleHashesExpr].getName, ShinglesName),
        (children: Seq[Expression]) => ShingleHashesExpr(children(0), children(1)))
    }
  }

  /** Distinct rolling shingle hashes of the normalized text. */
  def shingleHashesFast(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    import org.apache.spark.sql.functions._
    call_function(ShinglesName, lower(regexp_replace(trim(text), "\\s+", " ")), lit(n))
  }
}
