package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature aggregate: for each input 64-bit shingle hash
  * `h` and each seed i < numHashes, keep `min(XXH64(i, XXH64(h, 42)))` — the
  * exact value `xxhash64(h, lit(i))` produces (Spark chains children through
  * the running hash with default seed 42), so results are bit-identical to
  * the 64-separate-`min(xxhash64(...))` formulation this replaces.
  *
  * Why a `TypedImperativeAggregate`: 64 independent min-aggregates carry 64
  * separate buffer slots through the aggregation framework per group; this
  * keeps one primitive long[64] buffer updated in a tight loop per input
  * row — same map-side partial aggregation, less per-row framework
  * overhead. (The preference ladder's step past `Aggregator`: imperative
  * buffer for hot aggregates.)
  */
case class MinHashSigAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires a bigint input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      var i = 0
      while (i < numHashes) {
        // the seed literal is an INT column in the expression formulation,
        // so Spark hashes it via hashInt — match exactly for bit-identity
        val h = XXH64.hashInt(i, base)
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = MinHashAgg.Name
}

object MinHashAgg {
  val Name = "graft_minhash_sig"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(Name))) {
      reg.registerFunction(
        FunctionIdentifier(Name),
        new ExpressionInfo(classOf[MinHashSigAgg].getName, Name),
        (children: Seq[Expression]) => {
          val n = children(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => sys.error(s"$Name needs a literal int numHashes, got $other")
          }
          MinHashSigAgg(children(0), n)
        })
    }
  }

  /** `signature(hashCol, numHashes)` as an aggregate Column. */
  def signature(spark: SparkSession, hashCol: Column, numHashes: Int): Column = {
    register(spark)
    call_function(Name, hashCol, org.apache.spark.sql.functions.lit(numHashes))
  }
}
