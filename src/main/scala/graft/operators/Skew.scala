package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at scale.
  *
  * AQE's skew-join splitting (on by default in `GraftSession`) handles most
  * runtime skew; these are the explicit tools for the cases AQE can't see:
  * a groupBy whose hot key overwhelms one reducer, and a shuffle join
  * against a dimension small enough to replicate per salt but too big to
  * broadcast whole.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates (keys, salt) —
    * spreading each hot key over `salts` reducers — phase 2 merges the
    * partials per key. `aggs` must be decomposable (sum/count/min/max);
    * pass the partial→merge pair per output column.
    *
    * Example: saltedAgg(df, Seq("k"), 16)(Seq("v" -> "sum")) ==
    * df.groupBy("k").agg(sum("v")) but with no single-reducer hot spot.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int)(
      aggs: Seq[(String, String)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head match { case (c, f) => partialExpr(f, c).as(s"__p_${f}_$c") },
        aggs.tail.map { case (c, f) => partialExpr(f, c).as(s"__p_${f}_$c") }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head match { case (c, f) => mergeExpr(f, s"__p_${f}_$c").as(s"${f}_$c") },
        aggs.tail.map { case (c, f) => mergeExpr(f, s"__p_${f}_$c").as(s"${f}_$c") }: _*)
  }

  private def partialExpr(f: String, c: String): Column = f match {
    case "sum"   => sum(col(c))
    case "count" => count(col(c))
    case "min"   => min(col(c))
    case "max"   => max(col(c))
    case other   => sys.error(s"saltedAgg supports sum/count/min/max, got $other")
  }

  private def mergeExpr(f: String, p: String): Column = f match {
    case "sum" | "count" => sum(col(p))
    case "min"           => min(col(p))
    case "max"           => max(col(p))
    case other           => sys.error(s"saltedAgg supports sum/count/min/max, got $other")
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a random salt in
    * [0, salts); the right side is replicated `salts` times so every salted
    * key still finds its match. Breaks one hot key across `salts` tasks at
    * the cost of `salts`× the (small) right side — the classic fix when the
    * right side exceeds the broadcast threshold but a hot left key floods
    * one reducer.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(salts)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
