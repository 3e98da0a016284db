package graft.types

import org.apache.spark.sql.types._

/** Oracle → Spark type mapping.
  *
  * Parity with the reference's pyiceberg mapping
  * (reference: airflow-plugins/utils/type_converter.py:15-40): NUMBER (any
  * precision/scale) maps to LongType — the reference deliberately drops
  * decimals; we keep that behavior by default for hash-parity and offer
  * `strict = true` to map NUMBER(p,s>0) to DecimalType(p,s) instead.
  *
  * Parametrized types are normalized by truncating at '(' — e.g.
  * `NUMBER(10)` → `NUMBER`, `VARCHAR2(100)` → `VARCHAR2`
  * (type_converter.py:33). Unknown types fall back to StringType with a
  * warning (type_converter.py:36-40).
  */
object TypeConverter {

  private val paramRe = """^\s*([A-Za-z0-9_ ]+?)\s*(?:\((\s*\d+\s*(?:,\s*\d+\s*)?)\))?\s*$""".r

  /** Map an Oracle type string (as found in `all_tab_columns.data_type`,
    * possibly parametrized) to a Spark DataType.
    */
  def oracleToSpark(oracleType: String, strict: Boolean = false): DataType = {
    val (base, params) = normalize(oracleType)
    base match {
      // DECIMAL/NUMERIC: the ANSI spellings of NUMBER (DatabaseMetaData
      // reports them for Derby/Postgres/etc.) — same reference semantics
      case "NUMBER" | "DECIMAL" | "NUMERIC" =>
        if (strict) params match {
          case Some((p, Some(s))) if s > 0 => DecimalType(p, s)
          case _                           => LongType
        } else LongType
      case "FLOAT"                                        => DoubleType
      case "BINARY_FLOAT"                                 => FloatType
      case "BINARY_DOUBLE"                                => DoubleType
      case "VARCHAR2" | "CHAR" | "NCHAR" | "NVARCHAR2"    => StringType
      case "CLOB" | "NCLOB"                               => StringType
      case "DATE" | "TIMESTAMP"                           => TimestampType
      case t if t.startsWith("TIMESTAMP")                 => TimestampType // WITH [LOCAL] TIME ZONE, TIMESTAMP(6), ...
      case "RAW" | "BLOB"                                 => BinaryType
      // ANSI / JDBC metadata names: S5 introspection goes through standard
      // DatabaseMetaData, so any JDBC source's TYPE_NAMEs must map — these
      // keep their natural width instead of the Oracle NUMBER collapse
      case "INTEGER" | "INT"                              => IntegerType
      case "BIGINT"                                       => LongType
      case "SMALLINT"                                     => ShortType
      case "TINYINT"                                      => ByteType
      case "DOUBLE" | "DOUBLE PRECISION"                  => DoubleType
      case "REAL"                                         => FloatType
      case "BOOLEAN"                                      => BooleanType
      case "VARCHAR" | "LONG VARCHAR" | "CHAR VARYING"    => StringType
      case other =>
        // reference logs a warning and falls back to String (type_converter.py:36-40)
        StringType
    }
  }

  /** Map using CATALOG-reported precision/scale: Oracle's
    * `all_tab_columns` returns a bare `NUMBER` in `data_type` with
    * `data_precision`/`data_scale` in their own columns (hooks.py:83-87),
    * so the parameters arrive separately rather than inside the type
    * string. When the string itself carries no parameters, synthesize
    * them from the catalog columns; a parametrized string wins.
    */
  def oracleToSpark(oracleType: String, precision: Option[Int],
      scale: Option[Int], strict: Boolean): DataType = {
    val (base, params) = normalize(oracleType)
    (params, precision, scale) match {
      case (Some(_), _, _) => oracleToSpark(oracleType, strict) // string params win
      case (None, Some(p), _) =>
        oracleToSpark(s"$base($p${scale.map("," + _).getOrElse("")})", strict)
      // Oracle NUMBER(*,s): data_precision is NULL but data_scale is set —
      // precision * means the maximum (38); without this case the scale
      // would be dropped and strict mode would silently truncate fractions
      case (None, None, Some(s)) => oracleToSpark(s"$base(38,$s)", strict)
      case _ => oracleToSpark(oracleType, strict)
    }
  }

  /** Split `NUMBER(10,2)` → ("NUMBER", Some((10, Some(2)))). Mirrors the
    * reference's `oracle_type.split('(')[0]` normalization plus upper-casing.
    */
  def normalize(oracleType: String): (String, Option[(Int, Option[Int])]) =
    oracleType match {
      case paramRe(base, null) => (base.trim.toUpperCase, None)
      case paramRe(base, params) =>
        val parts = params.split(",").map(_.trim.toInt)
        (base.trim.toUpperCase, Some((parts(0), parts.lift(1))))
      case other => (other.trim.toUpperCase.split('(')(0).trim, None)
    }
}
