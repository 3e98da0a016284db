package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A source of rows. The reference has two source families — Oracle via SQL
  * (reference: airflow-plugins/oracle_to_iceberg/hooks.py:107-137) and HDFS
  * ORC file sets (hdfs_to_iceberg/hdfs_to_iceberg_operator.py:233-305).
  * Both collapse to "produce a DataFrame"; projection/predicate/partition
  * pruning are declared on the plan so Catalyst pushes them into the scan.
  */
trait Source {
  def load(spark: SparkSession): DataFrame

  /** S1/P1/P2 semantics: `SELECT {cols|*} FROM src [WHERE pred]`
    * (hooks.py:116-124). `where` accepts any Spark SQL predicate string;
    * both projection and predicate reach the scan via Catalyst pushdown.
    */
  def select(spark: SparkSession, columns: Seq[String] = Nil, where: Option[String] = None): DataFrame = {
    val base = load(spark)
    val filtered = where.fold(base)(w => base.filter(expr(w)))
    if (columns.isEmpty) filtered else filtered.select(columns.map(col).toIndexedSeq: _*)
  }

  /** S4: row count (hooks.py:73-77). */
  def count(spark: SparkSession): Long = load(spark).count()
}

/** File-set source: a directory (or explicit paths) of parquet/ORC files,
  * optionally Hive-partitioned (`dt=.../hour=...`). Spark's
  * PartitioningAwareFileIndex natively does the reference's hand-rolled path
  * parsing + partition grouping (hdfs_to_iceberg_operator.py:84-123).
  *
  * @param partitionValues optional partition-value filter (P7,
  *   hdfs_to_iceberg_operator.py:118-121): keep only partitions whose value
  *   of `partitionColumn` is in the list — Spark prunes the file listing,
  *   unmatched directories are never read.
  */
final case class FileSource(
    paths: Seq[String],
    format: String = "parquet",
    partitionColumn: Option[String] = None,
    partitionValues: Seq[String] = Nil)
    extends Source {

  def load(spark: SparkSession): DataFrame = {
    // Multi-path scan: one DataFrame over N paths (S9,
    // hdfs_to_iceberg_operator.py:265-287 — the per-file fallback loop is
    // unnecessary; Spark lists and schedules splits natively).
    val df = spark.read.format(format).load(paths: _*)
    (partitionColumn, partitionValues) match {
      case (Some(c), vs) if vs.nonEmpty => df.filter(col(c).isin(vs: _*))
      case _                            => df
    }
  }
}

object FileSource {
  def parquet(path: String): FileSource = FileSource(Seq(path))
  def orc(path: String): FileSource = FileSource(Seq(path), format = "orc")

  /** One testdata table, e.g. `table(sfDir, "lineitem")`. */
  def table(sfDir: String, name: String): FileSource =
    parquet(s"$sfDir/$name.parquet")
}

/** JDBC source with S1–S5 semantics (kept thin — no live Oracle in the test
  * environment; the projection/predicate/partitioning semantics are
  * exercised through FileSource, which shares the Source contract).
  *
  * The reference's serial `chunksize` extract (hooks.py:128-134;
  * oracle_to_iceberg_operator.py:251-283) becomes a *partitioned* JDBC scan:
  * `partitionColumn/lowerBound/upperBound/numPartitions` splits the table
  * into parallel range scans — bounded memory like the chunk loop, but
  * distributed instead of serial.
  */
final case class JdbcSource(
    url: String,
    table: String,                       // "schema.table" or "(select ...) t"
    user: String = "",
    password: String = "",
    partitionColumn: Option[String] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None,
    numPartitions: Int = 8,
    fetchSize: Int = 10000)              // reference default chunk: README.md:294
    extends Source {

  def load(spark: SparkSession): DataFrame = {
    var r = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("fetchsize", fetchSize)
    (partitionColumn, lowerBound, upperBound) match {
      case (Some(c), Some(lo), Some(hi)) =>
        r = r.option("partitionColumn", c)
          .option("lowerBound", lo)
          .option("upperBound", hi)
          .option("numPartitions", numPartitions)
      case _ =>
    }
    r.load()
  }
}
