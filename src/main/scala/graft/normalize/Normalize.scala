package graft.normalize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-flight batch normalization — the Spark-native equivalent of the
  * reference's `prepare_dataframe_for_iceberg`
  * (reference: airflow-plugins/utils/dataframe_utils.py:5-27):
  *
  *  1. lower-case all column names (dataframe_utils.py:13),
  *  2. NaN → null for float/double columns (dataframe_utils.py:16 —
  *     `df.where(pd.notnull(df), None)`; in Spark nulls are first-class so
  *     only NaN needs mapping),
  *  3. deterministic string → timestamp casts driven by a declared type map
  *     (replaces the reference's per-column `pd.to_datetime` sniffing,
  *     dataframe_utils.py:19-25).
  *
  * All steps are pure column expressions — codegen'd, no UDFs, fully
  * pushdown-transparent.
  */
object Normalize {

  /** Full normalize: lowercase + NaN→null + declared timestamp casts. */
  def prepare(df: DataFrame, timestampCols: Seq[String] = Nil): DataFrame =
    castTimestamps(nanToNull(lowercaseColumns(df)), timestampCols)

  /** Lower-case every column name (dataframe_utils.py:13, schema_builder.py:26). */
  def lowercaseColumns(df: DataFrame): DataFrame = {
    val lowered = df.columns.map(_.toLowerCase)
    require(lowered.distinct.length == lowered.length,
      s"lowercasing collides column names: ${df.columns.mkString(",")}")
    df.toDF(lowered.toIndexedSeq: _*)
  }

  /** NaN → null for all FloatType/DoubleType columns. */
  def nanToNull(df: DataFrame): DataFrame = {
    val exprs = df.schema.fields.map {
      case StructField(n, FloatType | DoubleType, _, _) =>
        when(isnan(col(n)), lit(null)).otherwise(col(n)).as(n)
      case f => col(f.name).as(f.name)
    }
    df.select(exprs.toIndexedSeq: _*)
  }

  /** Cast the named string columns to timestamp using an explicit format
    * (default matches Oracle's `YYYY-MM-DD HH24:MI:SS.FF` used by the
    * reference's CDC predicates, oracle_to_iceberg_cdc_operator.py:186).
    */
  def castTimestamps(
      df: DataFrame,
      cols: Seq[String],
      format: String = "yyyy-MM-dd HH:mm:ss[.SSSSSS]"): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, to_timestamp(col(c), format))
    }
}
