package graft.types

import org.apache.spark.sql.types._

/** One column as described by Oracle's `all_tab_columns` catalog view
  * (reference: airflow-plugins/oracle_to_iceberg/hooks.py:79-105).
  */
final case class SourceColumn(
    name: String,
    dataType: String,          // Oracle type string, possibly parametrized
    length: Option[Int] = None,
    precision: Option[Int] = None,
    scale: Option[Int] = None,
    nullable: Boolean = true)

/** Builds a Spark StructType from introspected source columns.
  *
  * Parity notes (reference: airflow-plugins/utils/schema_builder.py:23-43):
  * column names are lower-cased (schema_builder.py:26) and
  * `required = not nullable` (schema_builder.py:37) → Spark
  * `StructField(nullable = nullable)`.
  */
object SchemaBuilder {

  def build(columns: Seq[SourceColumn], strict: Boolean = false): StructType =
    StructType(columns.map { c =>
      StructField(
        c.name.toLowerCase,
        // catalog-reported precision/scale ride along: all_tab_columns
        // reports bare NUMBER with data_precision/data_scale separate
        TypeConverter.oracleToSpark(c.dataType, c.precision, c.scale, strict),
        nullable = c.nullable)
    })
}
