package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build aggregate over PRE-HASHED values: the input child is
  * an `xxhash64(col)` long (hashing stays inside whole-stage codegen; the
  * imperative buffer only ever sees longs), the output is the serialized
  * `org.apache.spark.util.sketch.BloomFilter` bytes.
  *
  * Built for [[graft.table.Icebox]]'s manifest-level bloom index
  * (`manifest.bloom.columns`): one `groupBy(file)` over a fresh commit's
  * files yields a per-file, per-column membership filter that the planner
  * can consult WITHOUT opening the file — the point-lookup complement to
  * min/max stats, which cannot prune high-cardinality unsorted columns
  * (every file's [min,max] spans the whole key domain). Parquet's own
  * footer blooms (`write.bloom.columns`) still require opening every
  * file's footer at scan time; the manifest index prunes at PLANNING time
  * with zero data-file I/O — Hudi's metadata-table bloom index makes the
  * same trade for exactly this reason.
  *
  * 100 TB design: the aggregate is distributive (partial buffers merge via
  * bitwise OR), so map-side partial aggregation collapses each task to one
  * filter per (file, column) before the shuffle. Filter size is chosen by
  * the caller from the KNOWN per-file row count (the manifest footer pass
  * runs first), so sizing is never guessed.
  */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${BloomBuild.Name} expects a pre-hashed LONG input (xxhash64), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = BloomBuild.Name
}

object BloomBuild {
  val Name = "graft_bloom_build"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(Name))) {
      reg.registerFunction(
        FunctionIdentifier(Name),
        new ExpressionInfo(classOf[BloomBuildAgg].getName, Name),
        (children: Seq[Expression]) => {
          val expected = children(1) match {
            case Literal(v: Long, LongType) => v
            case Literal(v: Int, IntegerType) => v.toLong
            case other => sys.error(s"$Name needs a literal expected-item count, got $other")
          }
          val fpp = children(2) match {
            case Literal(v: Double, DoubleType) => v
            case other => sys.error(s"$Name needs a literal double fpp, got $other")
          }
          require(expected >= 1, s"$Name expectedItems must be >= 1, got $expected")
          require(fpp > 0 && fpp < 1, s"$Name fpp must be in (0,1), got $fpp")
          BloomBuildAgg(children(0), expected, fpp)
        })
    }
  }

  /** Serialized bloom over `hashCol` (MUST be an `xxhash64(...)` long) as
    * an aggregate Column.
    */
  def agg(spark: SparkSession, hashCol: Column, expectedItems: Long, fpp: Double): Column = {
    register(spark)
    call_function(Name, hashCol, org.apache.spark.sql.functions.lit(expectedItems),
      org.apache.spark.sql.functions.lit(fpp))
  }
}
