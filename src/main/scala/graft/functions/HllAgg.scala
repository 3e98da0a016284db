package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Dense HyperLogLog sketch over 64-bit hashes (Flajolet et al. 2007, with
  * the 64-bit-hash simplification HLL++ popularized: no large-range
  * correction needed). The sketch is a plain byte array —
  * `[p, register_0 .. register_{2^p-1}]` — so it serializes as-is, merges
  * by element-wise max, and two sketches built from the same value set are
  * BYTE-IDENTICAL regardless of row order or partitioning (content-
  * addressable, like the manifest bloom side files).
  *
  * Built for [[graft.table.Icebox]]'s manifest NDV index: per-file
  * sketches committed as side files give the planner/ANALYZE surface an
  * approximate COUNT(DISTINCT) with ZERO data I/O — the Iceberg-puffin
  * theta-sketch design point. Standard error is `1.04/sqrt(2^p)`
  * (p=12 → 4096 one-byte registers → ~1.6%).
  *
  * Determinism matters here more than in most HLL uses: the estimate is
  * checked against oracles and cached across snapshots, so the register
  * update uses only integer ops on the xxhash64 value — no platform-
  * dependent float paths.
  */
object Hll {
  val DefaultP = 12

  def empty(p: Int): Array[Byte] = {
    require(p >= 4 && p <= 16, s"HLL precision must be in [4,16], got $p")
    val a = new Array[Byte](1 + (1 << p)); a(0) = p.toByte; a
  }

  def precision(s: Array[Byte]): Int = s(0).toInt

  /** Fold one 64-bit hash into the sketch (mutates). Top `p` bits pick the
    * register; the rank is the leading-zero count of the REMAINING bits
    * plus one (capped at 64-p+1 when they are all zero) — max 61, so a
    * signed byte holds it without bias tricks.
    */
  def add(s: Array[Byte], hash: Long): Unit = {
    val p = s(0).toInt
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rank = if (w == 0L) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > s(1 + idx)) s(1 + idx) = rank.toByte
  }

  /** Element-wise max merge INTO `a` (mutates and returns `a`). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a(0) == b(0), s"HLL precision mismatch: ${a(0)} vs ${b(0)}")
    var i = 1
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Bias-corrected cardinality estimate: the harmonic-mean raw estimator
    * with linear counting below `2.5m` while empty registers remain.
    */
  def estimate(s: Array[Byte]): Long = {
    val p = s(0).toInt
    val m = 1 << p
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = s(1 + i)
      sum += java.lang.Math.scalb(1.0, -r) // exact 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val raw = alpha * m * m.toDouble / sum
    val e = if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
    math.round(e)
  }
}

/** HLL-build aggregate over PRE-HASHED values: the child is an
  * `xxhash64(col)` long computed inside whole-stage codegen (null when the
  * source value was null, so SQL's COUNT(DISTINCT)-excludes-nulls
  * semantics hold); the output is the sketch bytes. Distributive — partial
  * buffers merge by register max, so map-side combine collapses each task
  * to one 2-4 KB buffer per group before the shuffle.
  */
case class HllBuildAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${HllBuild.Name} expects a pre-hashed LONG input (xxhash64), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = Hll.empty(p)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.merge(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = HllBuild.Name
}

object HllBuild {
  val Name = "graft_hll_build"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(Name))) {
      reg.registerFunction(
        FunctionIdentifier(Name),
        new ExpressionInfo(classOf[HllBuildAgg].getName, Name),
        (children: Seq[Expression]) => {
          if (children.length != 2)
            sys.error(s"$Name expects (hashCol, precision) — got ${children.length} argument(s)")
          val p = children(1) match {
            case Literal(v: Int, IntegerType) => v
            case other => sys.error(s"$Name needs a literal int precision, got $other")
          }
          require(p >= 4 && p <= 16, s"$Name precision must be in [4,16], got $p")
          HllBuildAgg(children(0), p)
        })
    }
  }

  /** HLL sketch bytes over `hashCol` (MUST be a null-preserving
    * `xxhash64(...)` long) as an aggregate Column.
    */
  def agg(spark: SparkSession, hashCol: Column, p: Int = Hll.DefaultP): Column = {
    register(spark)
    call_function(Name, hashCol, org.apache.spark.sql.functions.lit(p))
  }
}
