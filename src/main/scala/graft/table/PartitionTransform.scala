package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.types._

/** Iceberg-style HIDDEN partition transforms: the table partitions on a
  * value DERIVED from a source column (`bucket(8, id)`, `days(ts)`, ...)
  * without the derived column ever appearing in the table schema — writers
  * derive it at commit time, readers never see it, and the planner prunes
  * partitions from predicates on the SOURCE column (the user never needs to
  * know the layout; Iceberg's core partitioning idea). The spec persists in
  * the table property `partition.spec` as JSON, so every writer and reader
  * of the table agrees on the derivation.
  *
  * The reference's catalog layer is identity-only
  * (airflow-plugins/catalog_manager.py:67-69), so this is beyond-parity —
  * but it is the difference between "partitioned on a 1 M-cardinality key"
  * (unusable) and "hash-bucketed into 64 dirs" at 100 TB.
  */
sealed trait PartitionTransform {
  /** Source column the value derives from. */
  def source: String
  /** Partition-directory key (the hidden column name). */
  def name: String
  /** Writer-side derivation (must agree EXACTLY with [[literalDirValue]]);
    * `dt` is the source column's type from the writing DataFrame's schema.
    */
  def derive(c: Column, dt: DataType): Column
  /** Partition-dir string a LITERAL maps to — the planner-side mirror of
    * [[expr]] for pruning. None = unpredictable for this literal type →
    * the planner keeps the file (conservative).
    */
  def literalDirValue(l: Literal): Option[String]
  /** Whether the transform preserves the source ordering, enabling RANGE
    * pruning (compare mode: "num" parses dir values as long, "lex" compares
    * lexically — days/hours/truncated-string formats sort lexically in
    * chronological/prefix order).
    */
  def ordering: Option[String]
}

/** `bucket(n, col)`: murmur3-hash modulo (Spark's `hash()`, seed 42), so the
  * writer expression and the planner's literal evaluation agree bit-exactly.
  * Equality/IN predicates prune to ONE bucket; ranges cannot prune.
  */
final case class BucketTransform(n: Int, source: String) extends PartitionTransform {
  val name = s"${source}_bucket"
  def derive(c: Column, dt: DataType): Column = pmod(hash(c), lit(n))
  def literalDirValue(l: Literal): Option[String] =
    if (l.value == null) None
    else {
      val h = new Murmur3Hash(Seq(l), 42).eval(null).asInstanceOf[Int]
      Some((((h % n) + n) % n).toString)
    }
  val ordering = None
}

/** `truncate(w, col)`: strings truncate to a `w`-char prefix, integers floor
  * to a multiple of `w` — both order-preserving (range pruning works).
  */
final case class TruncateTransform(w: Int, source: String) extends PartitionTransform {
  val name = s"${source}_trunc"
  def derive(c: Column, dt: DataType): Column = dt match {
    case StringType => substring(c, 1, w)
    case ByteType | ShortType | IntegerType | LongType => (c - pmod(c, lit(w))).cast(LongType)
    case other => sys.error(s"truncate($w, $source) unsupported for type $other")
  }
  def literalDirValue(l: Literal): Option[String] = (l.value, l.dataType) match {
    case (null, _) => None
    case (v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      Some(v.toString.take(w))
    case (v: Number, ByteType | ShortType | IntegerType | LongType) =>
      val x = v.longValue(); Some((x - (((x % w) + w) % w)).toString)
    case _ => None
  }
  def ordering = Some("auto") // resolved per dir-value: numeric if parseable
}

/** `days(ts)`: calendar-date dirs (`yyyy-MM-dd`, lexically chronological).
  * Zone-free types only (Date, TimestampNTZ) — a zoned timestamp's dir
  * value would depend on the writer session's zone, so the planner keeps
  * the file for those (and [[Icebox]] rejects the spec at write).
  */
final case class DaysTransform(source: String) extends PartitionTransform {
  val name = s"${source}_day"
  def derive(c: Column, dt: DataType): Column = dt match {
    case DateType | TimestampNTZType => date_format(c, "yyyy-MM-dd")
    case other => sys.error(s"days($source) needs a zone-free Date/TimestampNTZ column, got $other")
  }
  def literalDirValue(l: Literal): Option[String] = (l.value, l.dataType) match {
    case (null, _) => None
    case (d: Integer, DateType) => Some(java.time.LocalDate.ofEpochDay(d.longValue).toString)
    case (us: java.lang.Long, TimestampNTZType) =>
      Some(java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), 0, java.time.ZoneOffset.UTC).toLocalDate.toString)
    case _ => None
  }
  val ordering = Some("lex")
}

/** `hours(ts)`: hour-grain dirs (`yyyy-MM-dd-HH`, lexically chronological). */
final case class HoursTransform(source: String) extends PartitionTransform {
  val name = s"${source}_hour"
  def derive(c: Column, dt: DataType): Column = dt match {
    case TimestampNTZType => date_format(c, "yyyy-MM-dd-HH")
    case other => sys.error(s"hours($source) needs a TimestampNTZ column, got $other")
  }
  def literalDirValue(l: Literal): Option[String] = (l.value, l.dataType) match {
    case (null, _) => None
    case (us: java.lang.Long, TimestampNTZType) =>
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), 0, java.time.ZoneOffset.UTC)
      Some(f"${ldt.toLocalDate}-${ldt.getHour}%02d")
    case _ => None
  }
  val ordering = Some("lex")
}

/** `identity(col)`: the plain layout — kept in the spec so mixed specs
  * (`days(ts), identity(region)`) serialize whole.
  */
final case class IdentityTransform(source: String) extends PartitionTransform {
  val name = source
  def derive(c: Column, dt: DataType): Column = c
  def literalDirValue(l: Literal): Option[String] = None // identity dirs prune via partitionSchema already
  val ordering = None
}

object PartitionTransform {

  /** Spec line syntax (Iceberg DDL-style): `bucket(8, id)`,
    * `truncate(4, name)`, `days(ts)`, `hours(ts)`, or a bare column name
    * for identity.
    */
  def parse(s: String): PartitionTransform = {
    val fn = """(\w+)\(\s*([^)]*?)\s*\)""".r
    s.trim match {
      case fn("bucket", args) =>
        val Array(n, c) = args.split(",").map(_.trim); BucketTransform(n.toInt, c)
      case fn("truncate", args) =>
        val Array(w, c) = args.split(",").map(_.trim); TruncateTransform(w.toInt, c)
      case fn("days", c)     => DaysTransform(c)
      case fn("day", c)      => DaysTransform(c)
      case fn("hours", c)    => HoursTransform(c)
      case fn("hour", c)     => HoursTransform(c)
      case fn("identity", c) => IdentityTransform(c)
      case bare if bare.nonEmpty && !bare.contains("(") => IdentityTransform(bare)
      case other => sys.error(s"unsupported partition transform: '$other'")
    }
  }

  /** Round-trip through the `partition.spec` table property. */
  def render(t: PartitionTransform): String = t match {
    case BucketTransform(n, c)   => s"bucket($n, $c)"
    case TruncateTransform(w, c) => s"truncate($w, $c)"
    case DaysTransform(c)        => s"days($c)"
    case HoursTransform(c)       => s"hours($c)"
    case IdentityTransform(c)    => c
  }

  def renderSpec(ts: Seq[PartitionTransform]): String = ts.map(render).mkString(", ")

  def parseSpec(s: String): Seq[PartitionTransform] =
    s.split(",(?![^(]*\\))").map(_.trim).filter(_.nonEmpty).map(parse).toSeq
}
