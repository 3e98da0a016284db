package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — RefinedWeb's stage-1 dedup key (corpus pipelines
  * dedup by canonical URL before touching content): one codegen-friendly
  * native expression per URL, no join, no UDF.
  *
  * Rules (each CONSERVATIVE — a rule that could change what a URL names is
  * skipped rather than guessed):
  *  - scheme and ASCII hosts lowercase; non-ASCII (IDN) hosts pass through
  *    unchanged — punycode mapping without the full IDNA tables would
  *    corrupt real hosts;
  *  - default ports drop (http:80, https:443); any other port is kept;
  *  - the fragment drops (never sent to the server);
  *  - tracking parameters drop (utm_*, gclid, fbclid, msclkid, ref,
  *    ref_src), the rest SORT lexicographically (param order is almost
  *    never semantic; sorting merges permutations);
  *  - a trailing slash on a non-root path drops; an empty path becomes /;
  *  - percent-escapes pass through BYTE-EXACT (decoding %2F would change
  *    path semantics), and URLs with userinfo (user@host) or no
  *    scheme://authority shape pass through whole (trimmed only).
  */
object UrlExpressions {

  val CanonName = "graft_url_canon"
  val DomainName = "graft_url_domain"

  /** Idempotently register in this session's registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(CanonName))) {
      reg.registerFunction(
        FunctionIdentifier(CanonName),
        new ExpressionInfo(classOf[UrlCanonExpr].getName, CanonName),
        (children: Seq[Expression]) => UrlCanonExpr(children(0)))
    }
    if (!reg.functionExists(FunctionIdentifier(DomainName))) {
      reg.registerFunction(
        FunctionIdentifier(DomainName),
        new ExpressionInfo(classOf[UrlDomainExpr].getName, DomainName),
        (children: Seq[Expression]) => UrlDomainExpr(children(0)))
    }
  }

  /** Canonical form of `url` (see the object doc's rules). */
  def canonicalize(spark: SparkSession, url: Column): Column = {
    register(spark)
    call_function(CanonName, url)
  }

  /** The canonical HOST of `url` (lowercased when ASCII, port stripped) —
    * the per-domain quota key. Null when the URL has no
    * scheme://authority shape.
    */
  def domain(spark: SparkSession, url: Column): Column = {
    register(spark)
    call_function(DomainName, url)
  }

  // ------------------------------------------------------------- kernel

  private val TrackingKeys = Set("gclid", "fbclid", "msclkid", "ref", "ref_src")

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val k = (if (eq >= 0) param.substring(0, eq) else param).toLowerCase
    k.startsWith("utm_") || TrackingKeys.contains(k)
  }

  private def allAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 128) return false; i += 1 }
    true
  }

  private def validScheme(s: String): Boolean = {
    if (s.isEmpty || !s.charAt(0).isLetter) return false
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (!c.isLetterOrDigit && c != '+' && c != '.' && c != '-') return false
      i += 1
    }
    true
  }

  /** `(scheme, host, keptPort, path, query)` of a canonicalizable URL, or
    * null for the conservative pass-through shapes.
    */
  private def parse(s: String): (String, String, String, String, String) = {
    val idx = s.indexOf("://")
    if (idx <= 0) return null
    val scheme = s.substring(0, idx)
    if (!validScheme(scheme)) return null
    val rest = s.substring(idx + 3)
    var aEnd = 0
    while (aEnd < rest.length && rest.charAt(aEnd) != '/' &&
      rest.charAt(aEnd) != '?' && rest.charAt(aEnd) != '#') aEnd += 1
    val auth = rest.substring(0, aEnd)
    if (auth.isEmpty || auth.contains('@')) return null // conservative
    val tail = rest.substring(aEnd)
    val hashIdx = tail.indexOf('#')
    val noFrag = if (hashIdx >= 0) tail.substring(0, hashIdx) else tail
    val qIdx = noFrag.indexOf('?')
    val path = if (qIdx >= 0) noFrag.substring(0, qIdx) else noFrag
    val query = if (qIdx >= 0) noFrag.substring(qIdx + 1) else null
    // host / numeric port
    var host = auth
    var port: String = null
    val pIdx = auth.lastIndexOf(':')
    if (pIdx >= 0) {
      val cand = auth.substring(pIdx + 1)
      if (cand.nonEmpty && cand.forall(_.isDigit)) {
        host = auth.substring(0, pIdx); port = cand
      }
    }
    val schemeL = scheme.toLowerCase
    val hostC = if (allAscii(host)) host.toLowerCase else host
    val keptPort =
      if (port == null) null
      else if ((schemeL == "http" && port == "80") ||
        (schemeL == "https" && port == "443")) null
      else port
    (schemeL, hostC, keptPort, path, query)
  }

  /** Static entry for [[UrlCanonExpr]]'s generated code. */
  def canon(url: UTF8String): UTF8String = {
    if (url == null) return null
    val s = url.toString.trim
    val p = parse(s)
    if (p == null) return UTF8String.fromString(s)
    val (scheme, host, port, path0, query0) = p
    var path = if (path0.isEmpty) "/" else path0
    if (path.length > 1 && path.endsWith("/")) path = path.substring(0, path.length - 1)
    val query =
      if (query0 == null || query0.isEmpty) null
      else {
        val kept = query0.split("&", -1).filter(_.nonEmpty).filterNot(isTracking)
        if (kept.isEmpty) null else kept.sorted.mkString("&")
      }
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(host)
    if (port != null) sb.append(':').append(port)
    sb.append(path)
    if (query != null) sb.append('?').append(query)
    UTF8String.fromString(sb.toString)
  }

  /** Static entry for [[UrlDomainExpr]]'s generated code. */
  def host(url: UTF8String): UTF8String = {
    if (url == null) return null
    val p = parse(url.toString.trim)
    if (p == null) null else UTF8String.fromString(p._2)
  }
}

/** Canonical URL — see [[UrlExpressions]]. */
case class UrlCanonExpr(url: Expression) extends UnaryExpression {
  override def child: Expression = url
  override def dataType: DataType = StringType
  override def prettyName: String = UrlExpressions.CanonName

  override def checkInputDataTypes(): TypeCheckResult = url.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(u: Any): Any =
    UrlExpressions.canon(u.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.functions.UrlExpressions.canon($u)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(url = c)
}

/** Canonical URL host — see [[UrlExpressions.domain]]. */
case class UrlDomainExpr(url: Expression) extends UnaryExpression {
  override def child: Expression = url
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = UrlExpressions.DomainName

  override def checkInputDataTypes(): TypeCheckResult = url.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(u: Any): Any =
    UrlExpressions.host(u.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u => s"""
      ${ev.value} = graft.functions.UrlExpressions.host($u);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression = copy(url = c)
}
