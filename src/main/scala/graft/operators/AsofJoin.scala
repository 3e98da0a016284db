package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as builtins, composed from shuffle-friendly
  * primitives (the build brief's preference: compose existing ops when the
  * semantics allow, before reaching for a custom plan node).
  */
object AsofJoin {

  /** As-of join: each left row picks the LATEST right row with the same key
    * and `rightTs <= leftTs` (backward as-of, the market-data/CDC lookup).
    *
    * Shape: tag both sides, union on (key, ts), one window sorted per key
    * carrying `last(right payload, ignoreNulls)` forward, keep left rows.
    * ONE shuffle on the key (the union sort is within partitions) — no
    * range cross-product, no per-key collect; at 100 TB this is the same
    * cost as a groupBy over both inputs. The right payload rides the window
    * as a TYPED struct (its schema is known at plan time; the left side
    * unions in a null-cast struct) — no serialization codec on the hot
    * path. Ties on rightTs resolve to the row with the greatest `tieBreak`
    * column value (pass a unique col for determinism).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tieBreak: String,
      rightPayload: Seq[String]): DataFrame = {
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema(0).dataType
    val lTagged = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(Long.MaxValue))
      .withColumn("__payload", lit(null).cast(payloadType))
    val rTagged = right.select(
      col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
      col(tieBreak).cast("long").as("__tie"),
      payloadStruct.as("__payload"))
    val lCols = left.columns.map(col)
    val unioned = lTagged.select((lCols :+ col("__ts") :+ col("__side") :+ col("__tie") :+ col("__payload")).toIndexedSeq: _*)
      .unionByName(rTagged.select(
        (left.columns.map(c => if (c == key) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) :+
          col("__ts") :+ col("__side") :+ col("__tie") :+ col("__payload")).toIndexedSeq: _*))
    // right rows sort before left rows at equal ts (side 0 < 1): "<=" semantics
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((lCols ++ rightPayload.map(c => col(s"__match.$c").as(c))).toIndexedSeq: _*)
  }
}

/** Range (interval) join: pairs where a left point falls inside a right
  * interval. A naive non-equi join plans as BroadcastNestedLoop (all-pairs);
  * binning turns it into an equi-join on the bin id — each interval is
  * exploded into the bins it overlaps, points join their single bin, and an
  * exact range filter removes bin-edge false positives. Shuffle volume =
  * points + intervals × (interval width / binSize): the standard interval-
  * join shape at scale.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binSize: Double): DataFrame = {
    val binnedPoints = points.withColumn("__bin", floor(col(pointCol) / binSize).cast("long"))
    val binnedIntervals = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binSize).cast("long"),
        floor(col(hiCol) / binSize).cast("long"))))
    binnedPoints.join(binnedIntervals, "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
