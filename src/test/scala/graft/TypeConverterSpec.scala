package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.types.{SchemaBuilder, SourceColumn, TypeConverter}

/** Port of the reference's type-mapping suite
  * (reference: tests/utils/test_type_converter.py:13-69) + FIXTURES.md §A1.
  */
class TypeConverterSpec extends AnyFunSuite with Matchers {
  import TypeConverter.oracleToSpark

  test("NUMBER maps to LongType, with or without parameters") {
    oracleToSpark("NUMBER") shouldBe LongType
    oracleToSpark("NUMBER(10)") shouldBe LongType
    oracleToSpark("NUMBER(10,2)") shouldBe LongType // reference drops decimals (type_converter.py:16)
  }

  test("strict mode maps NUMBER(p,s>0) to DecimalType") {
    oracleToSpark("NUMBER(10,2)", strict = true) shouldBe DecimalType(10, 2)
    oracleToSpark("NUMBER(10)", strict = true) shouldBe LongType
    oracleToSpark("NUMBER", strict = true) shouldBe LongType
  }

  test("float family") {
    oracleToSpark("FLOAT") shouldBe DoubleType
    oracleToSpark("BINARY_FLOAT") shouldBe FloatType
    oracleToSpark("BINARY_DOUBLE") shouldBe DoubleType
  }

  test("string family incl. parametrized") {
    Seq("VARCHAR2", "VARCHAR2(100)", "CHAR(10)", "NCHAR", "NVARCHAR2(50)", "CLOB", "NCLOB")
      .foreach(t => oracleToSpark(t) shouldBe StringType)
  }

  test("datetime family") {
    oracleToSpark("DATE") shouldBe TimestampType
    oracleToSpark("TIMESTAMP") shouldBe TimestampType
    oracleToSpark("TIMESTAMP(6)") shouldBe TimestampType
    oracleToSpark("TIMESTAMP WITH TIME ZONE") shouldBe TimestampType
    oracleToSpark("TIMESTAMP WITH LOCAL TIME ZONE") shouldBe TimestampType
  }

  test("binary family") {
    oracleToSpark("RAW") shouldBe BinaryType
    oracleToSpark("BLOB") shouldBe BinaryType
  }

  test("unknown types fall back to StringType (type_converter.py:36-40)") {
    oracleToSpark("UNKNOWN_TYPE") shouldBe StringType
    oracleToSpark("XMLTYPE") shouldBe StringType
  }

  test("case-insensitive and whitespace-tolerant") {
    oracleToSpark("number(10)") shouldBe LongType
    oracleToSpark("  varchar2(20) ") shouldBe StringType
  }

  test("SchemaBuilder lowercases names and carries nullability (schema_builder.py:26,37)") {
    val cols = Seq(
      SourceColumn("EMPLOYEE_ID", "NUMBER", nullable = false),
      SourceColumn("FIRST_NAME", "VARCHAR2(50)"),
      SourceColumn("LAST_UPDATED", "TIMESTAMP"))
    val st = SchemaBuilder.build(cols)
    st.fieldNames.toSeq shouldBe Seq("employee_id", "first_name", "last_updated")
    st("employee_id").nullable shouldBe false
    st("first_name").nullable shouldBe true
    st("employee_id").dataType shouldBe LongType
    st("last_updated").dataType shouldBe TimestampType
  }
}
