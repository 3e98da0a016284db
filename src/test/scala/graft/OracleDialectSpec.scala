package graft

import java.sql.DriverManager
import java.util.UUID
import org.apache.spark.sql.types._
import graft.sources.JdbcIntrospect
import graft.types.{SchemaBuilder, SourceColumn, TypeConverter}

/** S5 Oracle-dialect closure: no Oracle exists in the sandbox, so this
  * spec closes what a sandbox can close — (1) the generated introspection
  * SQL is textually the reference's `all_tab_columns` query
  * (oracle_to_iceberg/hooks.py:81-93); (2) recorded `all_tab_columns`
  * fixture rows (the NUMBER(p,s)/VARCHAR2(n)/DATE/TIMESTAMP/RAW edge
  * table) map through TypeConverter/SchemaBuilder exactly as the
  * reference's type_converter does (type_converter.py:15-40); (3) the
  * dialect SQL EXECUTES live against embedded Derby over a mimicking
  * ALL_TAB_COLUMNS relation, proving the text is valid SQL and the
  * positional row parse (hooks.py:95-104, `nullable == 'Y'`) round-trips.
  */
class OracleDialectSpec extends SparkSpec {

  test("generated introspection SQL matches the reference all_tab_columns shape") {
    val sql = JdbcIntrospect.oracleIntrospectionSql("sales", "orders")
    def norm(s: String) = s.split("\\s+").mkString(" ").trim
    norm(sql) shouldBe norm("""
      SELECT column_name, data_type, data_length, data_precision, data_scale, nullable
      FROM all_tab_columns
      WHERE owner = UPPER('sales')
      AND table_name = UPPER('orders')
      ORDER BY column_id""")
  }

  // recorded all_tab_columns output for a representative Oracle table —
  // the DDL `CREATE TABLE orders (id NUMBER(10) NOT NULL, price
  // NUMBER(12,2), ratio NUMBER, name VARCHAR2(100), code NCHAR(3),
  // note CLOB, created DATE NOT NULL, updated TIMESTAMP(6),
  // raw_id RAW(16), amount BINARY_DOUBLE)` as Oracle reports it: a bare
  // NUMBER data_type with data_precision/data_scale in separate columns
  private val fixture = Seq(
    SourceColumn("ID",      "NUMBER",        Some(22),   Some(10), Some(0), nullable = false),
    SourceColumn("PRICE",   "NUMBER",        Some(22),   Some(12), Some(2), nullable = true),
    SourceColumn("RATIO",   "NUMBER",        Some(22),   None,     None,    nullable = true),
    SourceColumn("NAME",    "VARCHAR2",      Some(100),  None,     None,    nullable = true),
    SourceColumn("CODE",    "NCHAR",         Some(3),    None,     None,    nullable = true),
    SourceColumn("NOTE",    "CLOB",          Some(4000), None,     None,    nullable = true),
    SourceColumn("CREATED", "DATE",          Some(7),    None,     None,    nullable = false),
    SourceColumn("UPDATED", "TIMESTAMP(6)",  Some(11),   None,     Some(6), nullable = true),
    SourceColumn("RAW_ID",  "RAW",           Some(16),   None,     None,    nullable = true),
    SourceColumn("AMOUNT",  "BINARY_DOUBLE", Some(8),    None,     None,    nullable = true))

  test("reference-parity mapping: NUMBER collapses to long, names lowercase, nullability kept") {
    val schema = SchemaBuilder.build(fixture)
    schema.fieldNames.toSeq shouldBe Seq("id", "price", "ratio", "name", "code",
      "note", "created", "updated", "raw_id", "amount")
    schema("id").dataType shouldBe LongType
    schema("price").dataType shouldBe LongType // reference drops decimals (type_converter.py:15-40)
    schema("ratio").dataType shouldBe LongType
    schema("name").dataType shouldBe StringType
    schema("code").dataType shouldBe StringType
    schema("note").dataType shouldBe StringType
    schema("created").dataType shouldBe TimestampType
    schema("updated").dataType shouldBe TimestampType
    schema("raw_id").dataType shouldBe BinaryType
    schema("amount").dataType shouldBe DoubleType
    schema("id").nullable shouldBe false
    schema("price").nullable shouldBe true
  }

  test("strict mapping honors catalog precision/scale: NUMBER(12,2) -> DECIMAL(12,2)") {
    val schema = SchemaBuilder.build(fixture, strict = true)
    schema("price").dataType shouldBe DecimalType(12, 2)
    schema("id").dataType shouldBe LongType    // NUMBER(10,0): integral
    schema("ratio").dataType shouldBe LongType // unconstrained NUMBER
  }

  test("NUMBER(p,s)/VARCHAR2(n) normalization table matches the reference truncation") {
    TypeConverter.normalize("NUMBER(10)") shouldBe (("NUMBER", Some((10, None))))
    TypeConverter.normalize("NUMBER(12,2)") shouldBe (("NUMBER", Some((12, Some(2)))))
    TypeConverter.normalize("VARCHAR2(100)") shouldBe (("VARCHAR2", Some((100, None))))
    TypeConverter.oracleToSpark("VARCHAR2(100)") shouldBe StringType
    TypeConverter.oracleToSpark("NUMBER(12,2)") shouldBe LongType
    TypeConverter.oracleToSpark("NUMBER(12,2)", strict = true) shouldBe DecimalType(12, 2)
    TypeConverter.oracleToSpark("TIMESTAMP(6) WITH TIME ZONE") shouldBe TimestampType
    // a parametrized type string wins over catalog-reported columns
    TypeConverter.oracleToSpark("NUMBER(5,1)", Some(12), Some(2), strict = true) shouldBe
      DecimalType(5, 1)
    // Oracle NUMBER(*,s): precision reports NULL, scale set — precision *
    // means 38; dropping the scale would silently truncate fractions
    TypeConverter.oracleToSpark("NUMBER", None, Some(2), strict = true) shouldBe
      DecimalType(38, 2)
    TypeConverter.oracleToSpark("NUMBER", None, Some(2), strict = false) shouldBe LongType
  }

  test("the dialect SQL executes live (Derby stands in for the catalog view) and rows parse") {
    val url = s"jdbc:derby:memory:oradialect${UUID.randomUUID().toString.take(8)};create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE all_tab_columns (
        owner VARCHAR(30), table_name VARCHAR(30), column_id INT,
        column_name VARCHAR(30), data_type VARCHAR(40), data_length INT,
        data_precision INT, data_scale INT, nullable CHAR(1))""")
      fixture.zipWithIndex.foreach { case (c, i) =>
        st.execute(s"INSERT INTO all_tab_columns VALUES ('SALES','ORDERS',${i + 1}," +
          s"'${c.name}','${c.dataType}',${c.length.getOrElse("NULL")}," +
          s"${c.precision.getOrElse("NULL")},${c.scale.getOrElse("NULL")}," +
          s"'${if (c.nullable) "Y" else "N"}')")
      }
      // a second table's row: the WHERE must filter it out
      st.execute("INSERT INTO all_tab_columns VALUES " +
        "('SALES','OTHER',1,'X','NUMBER',22,NULL,NULL,'Y')")
      st.close()
      val cols = JdbcIntrospect.tableColumnsOracle(url, "", "", "sales", "orders")
      cols shouldBe fixture // column_id order, positional parse, nullable=='Y'
    } finally conn.close()
  }
}
