package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode hygiene for web-scraped corpora — the first transform of every
  * text pipeline and one Spark has no built-in for: canonical normalization
  * (NFC: é as one codepoint, not e + combining accent, so dedup hashes and
  * shingles agree across sources that encode differently) and stripping of
  * control / zero-width characters that poison tokenizers.
  *
  * Native `Expression`s, not UDFs: they stay inside whole-stage codegen
  * (one static call per row on the UTF8String, no encoder boxing, no
  * lambda dispatch), and both short-circuit: already-clean ASCII — the
  * overwhelming majority of real corpus bytes — is detected with a single
  * byte scan and returned without allocating.
  */
object UnicodeExpressions {

  val NormalizeName = "graft_unicode_normalize"
  val CleanName = "graft_text_clean"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(NormalizeName))) {
      reg.registerFunction(
        FunctionIdentifier(NormalizeName),
        new ExpressionInfo(classOf[UnicodeNormalizeExpr].getName, NormalizeName),
        (children: Seq[Expression]) => {
          val form = children.lift(1) match {
            case Some(org.apache.spark.sql.catalyst.expressions.Literal(v, StringType)) =>
              v.toString.toUpperCase
            case None => "NFC"
            case other => sys.error(s"$NormalizeName needs a literal form, got $other")
          }
          UnicodeNormalizeExpr(children(0), form)
        })
      reg.registerFunction(
        FunctionIdentifier(CleanName),
        new ExpressionInfo(classOf[TextCleanExpr].getName, CleanName),
        (children: Seq[Expression]) => TextCleanExpr(children(0)))
    }
  }

  /** Canonical normalization; `form` in NFC (default), NFD, NFKC, NFKD. */
  def normalize(spark: SparkSession, c: Column, form: String = "NFC"): Column = {
    register(spark)
    call_function(NormalizeName, c, org.apache.spark.sql.functions.lit(form))
  }

  /** Strip control chars (C0/C1 except tab/newline/CR) and zero-width
    * chars (ZWSP/ZWNJ/ZWJ/BOM).
    */
  def clean(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(CleanName, c)
  }

  // ------------------------------------------------------------- kernels
  // Static (object) methods so generated code can call them directly:
  // Scala emits static forwarders on the companion class.

  /** True iff every byte is printable ASCII or tab/newline/CR — the cheap
    * common case where both kernels are identity.
    */
  def isCleanAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      // negative byte = non-ASCII lead/continuation; < 0x20 = C0 control
      if (b < 0x20 && b != '\t' && b != '\n' && b != '\r') return false
      if (b == 0x7F) return false
      i += 1
    }
    true
  }

  def normalizeImpl(s: UTF8String, form: java.text.Normalizer.Form): UTF8String =
    if (isCleanAscii(s)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(s.toString, form))

  def cleanImpl(s: UTF8String): UTF8String = {
    if (isCleanAscii(s)) return s
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val ch = str.charAt(i)
      val drop =
        (ch < 0x20 && ch != '\t' && ch != '\n' && ch != '\r') || // C0
        ch == 0x7F || (ch >= 0x80 && ch <= 0x9F) ||              // DEL + C1
        ch == 0x200B || ch == 0x200C || ch == 0x200D ||          // zero-width
        ch == 0xFEFF                                             // BOM
      if (!drop) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `java.text.Normalizer` under whole-stage codegen with an ASCII
  * fast path.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  @transient private lazy val normForm = java.text.Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if Set("NFC", "NFD", "NFKC", "NFKD")(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName form must be NFC/NFD/NFKC/NFKD, got $form")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = UnicodeExpressions.NormalizeName

  override def nullSafeEval(input: Any): Any =
    UnicodeExpressions.normalizeImpl(input.asInstanceOf[UTF8String], normForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // form is validated to one of the four enum constants, so reference
      // it directly — no per-row valueOf lookup
      s"""
        |${ev.value} = graft.functions.UnicodeExpressions.normalizeImpl(
        |  $c, java.text.Normalizer.Form.$form);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Control/zero-width stripping under whole-stage codegen with an ASCII
  * fast path.
  */
case class TextCleanExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = UnicodeExpressions.CleanName

  override def nullSafeEval(input: Any): Any =
    UnicodeExpressions.cleanImpl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeExpressions.cleanImpl($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
