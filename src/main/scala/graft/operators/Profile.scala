package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass column profiler: the data-quality sweep run before pointing
  * a training pipeline at an unfamiliar table — per column: row count,
  * null count, distinct count, min/max, and mean for numeric columns.
  *
  * 100 TB design: ONE aggregation job over the data regardless of how many
  * columns are profiled — every per-column statistic is an aggregate
  * expression in the same `agg(...)`, computed with map-side partials, and
  * the one-row result is pivoted to per-column rows inside the plan
  * (explode over an array of structs), never on the driver. Distinct
  * counts default to `approx_count_distinct` (HLL merge, no plan
  * expansion); `exact = true` switches to `count_distinct`, which is
  * precise but multiplies the pass via Expand by the number of profiled
  * columns — the small-table / correctness-oracle mode. Numeric means are
  * computed as exact decimal sums divided once at the end, so the result
  * is deterministic under any partitioning (a distributed double sum is
  * not).
  */
object Profile {

  /** Profile `cols` (default: every column) of `df` in one pass. Output
    * rows: (column, row_count, null_count, distinct_count, num_min,
    * num_max, mean, str_min, str_max) — numeric columns fill num_min/
    * num_max/mean and leave str_min/str_max null; string columns the
    * reverse; other types (dates, timestamps, binaries) report counts and
    * render min/max through str_min/str_max as ISO strings.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
      exact: Boolean = false): DataFrame = {
    val fields = {
      val all = df.schema.fields
      if (cols.isEmpty) all.toSeq
      else cols.map(c => all.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no such column: $c")))
    }
    def isNumeric(dt: DataType) = dt match {
      case _: NumericType => true
      case _ => false
    }
    val aggs: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name)
      val distinct =
        if (exact) count_distinct(c) else approx_count_distinct(c)
      val (numMin, numMax, mean) =
        if (isNumeric(f.dataType)) (
          min(c).cast("double"),
          max(c).cast("double"),
          // exact decimal sum, one double division: deterministic under
          // any partitioning, unlike a distributed double sum
          (sum(c.cast(DecimalType(38, 6))).cast("double") / count(c)))
        else (lit(null).cast("double"), lit(null).cast("double"),
          lit(null).cast("double"))
      val (strMin, strMax) = f.dataType match {
        case StringType => (min(c), max(c))
        case _ if isNumeric(f.dataType) =>
          (lit(null).cast("string"), lit(null).cast("string"))
        case _ => (min(c).cast("string"), max(c).cast("string"))
      }
      Seq(
        count(c).as(s"__cnt_${f.name}"),
        distinct.as(s"__dst_${f.name}"),
        numMin.as(s"__nmin_${f.name}"),
        numMax.as(s"__nmax_${f.name}"),
        mean.as(s"__mean_${f.name}"),
        strMin.as(s"__smin_${f.name}"),
        strMax.as(s"__smax_${f.name}"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    pivot(one, fields)
  }

  /** [[profile]] with the exact/approx distinct decision made from a FREE
    * row count instead of a caller flag: exact `count_distinct` at or
    * below `threshold` rows — the regime where the Expand-by-#columns
    * blowup is trivial and a correctness oracle wants exact numbers — and
    * `approx_count_distinct` (HLL, ~2% error, single pass) above it,
    * where a profiler's job is triage, not query semantics. An UNKNOWN
    * row count chooses HLL: the scale-safe default (never accidentally
    * Expand a 100 TB table). `knownRows` supplies the count for free
    * (e.g. a manifest); absent, one `df.count()` pre-pass decides — on
    * file-backed frames that is a metadata-weight scan of no columns,
    * orders cheaper than the exact-distinct pass it may avoid.
    */
  def profileAuto(df: DataFrame, cols: Seq[String] = Nil,
      threshold: Long = 100000L, knownRows: Option[Long] = None): DataFrame = {
    val rows = knownRows.orElse(scala.util.Try(df.count()).toOption)
    profile(df, cols, exact = rows.exists(_ <= threshold))
  }

  /** [[profileAuto]] over an Icebox table: the manifest row count decides
    * — zero I/O. Tables where the manifest refuses an exact count (e.g.
    * pending equality deletes) profile with HLL, the conservative side.
    */
  def profileAuto(spark: org.apache.spark.sql.SparkSession,
      table: graft.table.Icebox, cols: Seq[String],
      threshold: Long): DataFrame =
    profile(table.read(spark), cols,
      exact = table.rowCount.exists(_ <= threshold))

  private def pivot(one: DataFrame, fields: Seq[StructField]): DataFrame = {
    // pivot the single row to per-column rows INSIDE the plan
    val entries = fields.toSeq.map { f =>
      struct(
        lit(f.name).as("column"),
        col("__rows").as("row_count"),
        (col("__rows") - col(s"__cnt_${f.name}")).as("null_count"),
        col(s"__dst_${f.name}").as("distinct_count"),
        col(s"__nmin_${f.name}").as("num_min"),
        col(s"__nmax_${f.name}").as("num_max"),
        col(s"__mean_${f.name}").as("mean"),
        col(s"__smin_${f.name}").as("str_min"),
        col(s"__smax_${f.name}").as("str_max"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
