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
    partitionValues: Seq[String] = Nil,
    options: Map[String, String] = Map.empty,
    schema: Option[org.apache.spark.sql.types.StructType] = None)
    extends Source {

  def load(spark: SparkSession): DataFrame = {
    // Multi-path scan: one DataFrame over N paths (S9,
    // hdfs_to_iceberg_operator.py:265-287 — the per-file fallback loop is
    // unnecessary; Spark lists and schedules splits natively). Text
    // formats (csv/json) should pass an explicit `schema`: schema
    // inference costs an extra full pass over the data and can mistype —
    // at 100 TB a declared schema is the only sane contract.
    val reader = spark.read.format(format).options(options)
    val df = schema.fold(reader)(reader.schema).load(paths: _*)
    (partitionColumn, partitionValues) match {
      case (Some(c), vs) if vs.nonEmpty => df.filter(col(c).isin(vs: _*))
      case _                            => df
    }
  }
}

object FileSource {
  def parquet(path: String): FileSource = FileSource(Seq(path))
  def orc(path: String): FileSource = FileSource(Seq(path), format = "orc")

  /** CSV with a DECLARED schema (no inference pass; header on). */
  def csv(path: String, schema: org.apache.spark.sql.types.StructType): FileSource =
    FileSource(Seq(path), format = "csv",
      options = Map("header" -> "true"), schema = Some(schema))

  /** JSON-lines with a DECLARED schema (no inference pass). */
  def json(path: String, schema: org.apache.spark.sql.types.StructType): FileSource =
    FileSource(Seq(path), format = "json", schema = Some(schema))

  /** One testdata table, e.g. `table(sfDir, "lineitem")`. */
  def table(sfDir: String, name: String): FileSource =
    parquet(s"$sfDir/$name.parquet")
}

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * The files are pyarrow-written; `events.ts` is `timestamp[ns]`, which
  * Spark's parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). The
  * documented escape hatch is `spark.sql.legacy.parquet.nanosAsLong`, which
  * surfaces the column as epoch-nanos LongType — we then rebuild a
  * microsecond `timestamp_ntz` (integer `div`, no double rounding), exactly
  * the ns→us truncation DuckDB applies, so oracle comparisons line up.
  */
object Testdata {
  import org.apache.spark.sql.types.LongType

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else df
  }
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
    table: String = "",                  // "schema.table" (S1) — or use `query`
    query: Option[String] = None,        // S3: ad-hoc SQL (hooks.py:56-71)
    user: String = "",
    password: String = "",
    partitionColumn: Option[String] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None,
    numPartitions: Int = 8,
    fetchSize: Int = 10000)              // reference default chunk: README.md:294
    extends Source {

  require(table.nonEmpty ^ query.nonEmpty, "exactly one of table/query")

  def load(spark: SparkSession): DataFrame = {
    var r = spark.read
      .format("jdbc")
      .option("url", url)
      .option("user", user)
      .option("password", password)
      .option("fetchsize", fetchSize)
    r = query match {
      case Some(q) => r.option("query", q)
      case None    => r.option("dbtable", table)
    }
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

  // plaintext credentials must never reach logs / test-failure output
  override def toString: String =
    s"JdbcSource($url,$table,$query,$user,password=***,$partitionColumn,$lowerBound,$upperBound,$numPartitions,$fetchSize)"
}

/** S5: live JDBC schema introspection — the engine analog of reading
  * `all_tab_columns` (reference: oracle_to_iceberg/hooks.py:79-105). Uses
  * standard DatabaseMetaData so it works against any JDBC source; the
  * returned columns feed `graft.types.SchemaBuilder.build` exactly like the
  * reference feeds its `schema_builder`.
  */
object JdbcIntrospect {
  import java.sql.DriverManager
  import graft.types.SourceColumn

  def tableColumns(url: String, user: String, password: String,
      schema: String, table: String): Seq[SourceColumn] = {
    val conn = DriverManager.getConnection(url, user, password)
    try {
      val rs = conn.getMetaData.getColumns(null, schema.toUpperCase, table.toUpperCase, null)
      val out = Seq.newBuilder[SourceColumn]
      while (rs.next()) {
        out += SourceColumn(
          name = rs.getString("COLUMN_NAME"),
          dataType = rs.getString("TYPE_NAME"),
          length = Option(rs.getInt("COLUMN_SIZE")).filter(_ > 0),
          precision = Option(rs.getInt("COLUMN_SIZE")).filter(_ > 0),
          scale = Option(rs.getInt("DECIMAL_DIGITS")).filter(_ >= 0),
          nullable = rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls)
      }
      out.result().sortBy(_.name) // reference orders by column_id (hooks.py:92)
    } finally conn.close()
  }

  /** Oracle-dialect introspection SQL — textually the reference's
    * `all_tab_columns` query (oracle_to_iceberg/hooks.py:81-93): same
    * projected columns in the same order, same `owner`/`table_name`
    * UPPER filters, same `column_id` ordering. [[tableColumnsOracle]]
    * executes it verbatim; kept as a function of its own so tests can
    * assert the generated text against the reference shape.
    */
  def oracleIntrospectionSql(schema: String, table: String): String =
    s"""SELECT
       |    column_name,
       |    data_type,
       |    data_length,
       |    data_precision,
       |    data_scale,
       |    nullable
       |FROM all_tab_columns
       |WHERE owner = UPPER('$schema')
       |AND table_name = UPPER('$table')
       |ORDER BY column_id""".stripMargin

  /** S5 via the ORACLE DIALECT: run [[oracleIntrospectionSql]] over a live
    * connection and parse rows exactly as the reference does
    * (hooks.py:95-104: positional columns, `nullable = row[5] == 'Y'`).
    * `data_precision`/`data_scale` arrive in their own columns (Oracle
    * reports bare `NUMBER` in `data_type`), so they ride `SourceColumn`
    * for [[graft.types.TypeConverter]]'s strict decimal mapping. Use
    * [[tableColumns]] (standard DatabaseMetaData) for non-Oracle sources.
    */
  def tableColumnsOracle(url: String, user: String, password: String,
      schema: String, table: String): Seq[SourceColumn] = {
    val conn = DriverManager.getConnection(url, user, password)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(oracleIntrospectionSql(schema, table))
        val out = Seq.newBuilder[SourceColumn]
        while (rs.next()) {
          def optInt(i: Int): Option[Int] = {
            val v = rs.getInt(i); if (rs.wasNull()) None else Some(v)
          }
          out += SourceColumn(
            name = rs.getString(1),
            dataType = rs.getString(2),
            length = optInt(3),
            precision = optInt(4),
            scale = optInt(5),
            nullable = rs.getString(6) == "Y")
        }
        out.result()
      } finally st.close()
    } finally conn.close()
  }
}
