package graft

import org.apache.spark.sql.SparkSession
import graft.functions.VectorExpressions

/** Session factory — the engine analog of the reference's
  * `create_iceberg_spark_session` / spark-submit conf builders
  * (reference: utils/spark_builder.py:214-270, 10-124).
  *
  * Carries the reference's storage conventions (zstd parquet,
  * spark_builder.py:248) plus the scale defaults this engine assumes:
  * AQE with skew-join handling for runtime re-planning, dynamic partition
  * overwrite semantics for partition-scoped CDC merges, UTC session time,
  * and the graft native functions pre-registered.
  *
  * `shufflePartitions` should track cluster parallelism (cores on local
  * mode, 2-3× total executor cores on a real cluster); AQE coalesces
  * oversized counts at runtime, so erring high is safe.
  */
object GraftSession {

  def builder(
      master: String = "local[*]",
      appName: String = "graft",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd") // spark_builder.py:248
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.parquet.filterPushdown", "true")

  def create(
      master: String = "local[*]",
      appName: String = "graft",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = builder(master, appName, shufflePartitions).getOrCreate()
    VectorExpressions.register(spark)
    spark
  }
}
