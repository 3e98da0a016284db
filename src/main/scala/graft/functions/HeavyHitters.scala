package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit, slice}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a distributive aggregate: the
  * standard one-pass top-k-frequent summary for vocabulary / URL / domain
  * counting over corpora too large for an exact groupBy to be worth a full
  * shuffle of every distinct key.
  *
  * Guarantees (classic MG + the mergeable-summaries merge): every reported
  * count is a LOWER bound on the true count, under-counting by at most
  * N/(capacity+1) where N is the total item count — so any item with true
  * frequency above N/(capacity+1) is guaranteed present in the summary.
  * When `capacity` >= the number of distinct items the summary is EXACT
  * (no decrement ever fires), which is what the correctness oracle pins.
  *
  * 100 TB design: the buffer is a bounded map (`capacity` entries) updated
  * per input row and merged associatively — map-side partial aggregation
  * collapses each partition to one `capacity`-entry summary before the
  * shuffle, so shuffle volume is partitions x capacity, independent of
  * data size. Merge = sum counts, then subtract the (capacity+1)-th
  * largest count and drop non-positives (Agarwal et al., "Mergeable
  * Summaries", PODS'12).
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${HeavyHitters.Name} requires a string input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buffer.get(key) match {
        case Some(c) => buffer.update(key, c + 1)
        case None if buffer.size < capacity => buffer.update(key, 1L)
        case None =>
          // MG decrement tick: all counters down one, zeros evicted.
          // O(capacity), amortized over the >=capacity updates that filled
          // the buffer.
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.mapValuesInPlace { (_, c) => c - 1 }
          buffer.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count; strictly-positive
      // survivors number at most capacity
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace { (_, c) => c - sub }
      b1.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), c))
    })
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buffer.toArray
    val byteArrays = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(4 + byteArrays.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(byteArrays(i).length)
      bb.put(byteArrays(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      m.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = HeavyHitters.Name
}

object HeavyHitters {
  val Name = "graft_heavy_hitters"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(Name))) {
      reg.registerFunction(
        FunctionIdentifier(Name),
        new ExpressionInfo(classOf[HeavyHittersAgg].getName, Name),
        (children: Seq[Expression]) => {
          val cap = children(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => sys.error(s"$Name needs a literal int capacity, got $other")
          }
          require(cap >= 1, s"$Name capacity must be >= 1, got $cap")
          HeavyHittersAgg(children(0), cap)
        })
    }
  }

  /** The full `capacity`-entry summary as an aggregate Column:
    * array<struct<item,count>> sorted by (count desc, item asc).
    */
  def summary(spark: SparkSession, itemCol: Column, capacity: Int): Column = {
    register(spark)
    call_function(Name, itemCol, lit(capacity))
  }

  /** Top `k` of the summary (deterministic (count desc, item) order). */
  def topK(spark: SparkSession, itemCol: Column, k: Int, capacity: Int): Column =
    slice(summary(spark, itemCol, capacity), 1, k)
}
