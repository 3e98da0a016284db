package graft

import java.util.UUID
import org.apache.spark.sql.functions._
import graft.sources.{JdbcIntrospect, JdbcSource, Testdata}
import graft.types.SchemaBuilder

/** S1–S5 against a LIVE database: embedded Derby (in-JVM, ships with Spark's
  * jars). The JDBC path was previously exercised only through FileSource's
  * shared Source contract — these cases drive a real driver, real pushdown,
  * and real DatabaseMetaData introspection.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private def freshUrl(): String =
    s"jdbc:derby:memory:spec${UUID.randomUUID().toString.take(8)};create=true"

  private val sfDir = "/root/testdata/sf0.001"

  private def loadSlice(url: String): Unit =
    Testdata.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", "lineitem").save()

  test("S1 full-table scan round-trips through Derby") {
    val url = freshUrl()
    loadSlice(url)
    val back = JdbcSource(url, table = "lineitem").load(spark)
    val src = Testdata.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    assertSameRows(back, src)
  }

  test("S2 partitioned (chunked) scan splits into parallel range reads, same rows") {
    val url = freshUrl()
    loadSlice(url)
    val hi = Testdata.table(spark, sfDir, "lineitem")
      .agg(max("l_orderkey")).as[Long].head()
    val part = JdbcSource(url, table = "lineitem",
      partitionColumn = Some("l_orderkey"),
      lowerBound = Some(1L), upperBound = Some(hi), numPartitions = 4).load(spark)
    part.rdd.getNumPartitions shouldBe 4
    assertSameRows(part, JdbcSource(url, table = "lineitem").load(spark))
  }

  test("S3 ad-hoc query form + predicate/projection pushdown reach the JDBC scan") {
    val url = freshUrl()
    loadSlice(url)
    // Spark's JDBC writer created the table with QUOTED (case-preserving)
    // column names, so the ad-hoc SQL must quote them too — Derby uppercases
    // unquoted identifiers
    val q = JdbcSource(url,
      query = Some("""SELECT "l_orderkey", "l_quantity" FROM lineitem""")).load(spark)
      .filter(col("l_quantity") > 45.0)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    plan should include("PushedFilters")
    plan should include("GreaterThan(l_quantity,45.0)")
    // values agree with the parquet-side equivalent
    val expect = Testdata.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity").filter(col("l_quantity") > 45.0)
    assertSameRows(q, expect)
  }

  test("S5 DatabaseMetaData introspection round-trips the schema through SchemaBuilder") {
    val url = freshUrl()
    loadSlice(url)
    val cols = JdbcIntrospect.tableColumns(url, "", "", "APP", "lineitem")
    cols.map(_.name.toLowerCase).sorted shouldBe
      Seq("l_extendedprice", "l_orderkey", "l_partkey", "l_quantity", "l_suppkey")
    val schema = SchemaBuilder.build(cols)
    schema("l_orderkey").dataType.typeName shouldBe "long"
    schema("l_quantity").dataType.typeName shouldBe "double"
    // the introspected schema matches what Spark's JDBC reader infers
    val inferred = JdbcSource(url, table = "lineitem").load(spark).schema
    schema.fields.map(f => (f.name, f.dataType)).toSet shouldBe
      inferred.fields.map(f => (f.name.toLowerCase, f.dataType)).toSet
  }
}
