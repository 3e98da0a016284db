package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series RESAMPLE + GAP FILL — the feature-engineering step that
  * turns an irregular event stream into a fixed-interval series per key
  * (model features, rate monitoring, windowed training labels):
  *
  *  1. bucket events to the calendar unit (`date_trunc`) and aggregate
  *     per (key, bucket) — count / sum / min / max of the value column;
  *  2. densify: fold each key's buckets into one row carrying the series
  *     as a bucket→aggregates map, then `explode(sequence(first, last))`
  *     and look each grid bucket up in the map — grid rows materialize
  *     only on the output side, never against the raw events, and there
  *     is no grid join;
  *  3. gap rows carry `row_count = 0` and null aggregates; a FORWARD
  *     FILL column carries the last observed value across gaps
  *     (`last(..., ignoreNulls)` over the per-key time window).
  *
  * Scale shape: ONE scan of the events and exactly TWO exchanges — the
  * map-side-combined (key, bucket) aggregation and the key fold; the
  * fill window matches the fold's partitioning, so it sorts within
  * partitions without another shuffle. Everything after the first
  * aggregation is bucket rows (keys × series length, output-sized,
  * independent of event volume); the per-key map is bounded by the
  * series length. No driver collect anywhere.
  *
  * `unit` is a calendar unit accepted by `date_trunc` (minute / hour /
  * day / week / month); gaps step by one unit.
  */
object Resample {

  def resample(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      unit: String): DataFrame = {
    val step = unit.toLowerCase match {
      case "minute" => expr("interval 1 minute")
      case "hour" => expr("interval 1 hour")
      case "day" => expr("interval 1 day")
      case "week" => expr("interval 1 week")
      case "month" => expr("interval 1 month")
      case other => sys.error(s"resample unit '$other' (use minute/hour/day/week/month)")
    }
    // ONE scan of the events: bucket aggregates shuffle to (key, bucket),
    // then fold to one row per key carrying the series as a bucket→aggs
    // map (size bounded by the series length); the dense grid explodes
    // from that row and looks observed buckets up in the map — no second
    // event scan, no grid join. The fill window's partitioning matches
    // the fold's (key), so it adds a sort but NO further exchange.
    val bucketed = df
      .withColumn("__bucket", date_trunc(unit, col(tsCol)))
      .groupBy(col(keyCol), col("__bucket"))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("s"),
        min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
    val perKey = bucketed.groupBy(col(keyCol))
      .agg(map_from_entries(collect_list(struct(col("__bucket"),
          struct(col("cnt"), col("s"), col("mn"), col("mx"))))).as("__m"),
        min(col("__bucket")).as("__first"), max(col("__bucket")).as("__last"))
    val joined = perKey
      .select(col(keyCol),
        explode(sequence(col("__first"), col("__last"), step)).as("bucket_ts"),
        col("__m"))
      .withColumn("__e", col("__m")(col("bucket_ts")))
    val fillWin = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      col(keyCol), col("bucket_ts"),
      coalesce(col("__e.cnt"), lit(0L)).as("row_count"),
      col("__e.s").as(s"sum_$valueCol"),
      col("__e.mn").as(s"min_$valueCol"),
      col("__e.mx").as(s"max_$valueCol"),
      last(col("__e.mn"), ignoreNulls = true).over(fillWin)
        .as(s"filled_$valueCol"))
  }

  /** Interpolation variant of the fill: gaps carry the PREVIOUS bucket's
    * value (forward fill, above) or the linear interpolation between the
    * surrounding observed buckets — `mode` ∈ {"forward", "linear"}.
    * Linear needs the next observed value and its distance, so it adds
    * one backward window pass; both passes stay per-key, bucket-row
    * sized.
    */
  def resampleFilled(df: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, unit: String, mode: String): DataFrame = {
    val base = resample(df, tsCol, keyCol, valueCol, unit)
    mode match {
      case "forward" => base
      case "linear" =>
        val fwd = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ts"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val bwd = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ts"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val seq = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ts"))
        val v = col(s"min_$valueCol")
        val withPos = base.withColumn("__i", row_number().over(seq).cast("double"))
          .withColumn("__pi", when(v.isNotNull, col("__i")))
        val prevV = last(v, ignoreNulls = true).over(fwd)
        val nextV = first(v, ignoreNulls = true).over(bwd)
        val prevI = last(col("__pi"), ignoreNulls = true).over(fwd)
        val nextI = first(col("__pi"), ignoreNulls = true).over(bwd)
        withPos.withColumn(s"filled_$valueCol",
          when(v.isNotNull, v)
            .when(prevV.isNotNull && nextV.isNotNull,
              prevV + (nextV - prevV) * (col("__i") - prevI) / (nextI - prevI))
            .otherwise(coalesce(prevV, nextV)))
          .drop("__i", "__pi")
      case other => sys.error(s"fill mode '$other' (use forward/linear)")
    }
  }
}
