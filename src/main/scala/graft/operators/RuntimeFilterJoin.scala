package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.table.Icebox

/** Runtime file pruning for joins on NON-partition keys — the manifest
  * analog of Spark's `InjectRuntimeFilter` (which injects bloom/semi-join
  * ROW filters), lifted to FILE granularity where it saves I/O instead of
  * just CPU. Dynamic partition pruning (q_dpp_join) covers partition
  * columns; this covers the other shape a warehouse join hits constantly:
  * a fact table laid out by arrival order whose every file spans the whole
  * join-key range — min/max admits everything — joined to a dim side whose
  * key set is only known at RUNTIME (a filter, a CDC batch, a subquery).
  *
  * Mechanism: evaluate the dim side's distinct join keys (one small Spark
  * job — the same price Spark's own DPP subquery pays), then consult the
  * manifest per-file bloom index ([[Icebox.readForKeys]]): a fact file is
  * skipped only when NONE of the keys might be in it — blooms have no
  * false negatives, so the skip is exact; false positives merely keep
  * extra files. Degrades conservatively: no blooms, stats-less files, or
  * a key set over `bloom.attach.max-keys` (default 100k) → the fact reads
  * in full and the join result is identical.
  *
  * At 100 TB: a 10-key dim probe against a 100k-file fact reads the ~6%
  * of files that can hold those keys, not the table — without requiring
  * the fact to be clustered by the join key (the case z-order/bucketing
  * already solve).
  *
  * Reference analog: the reference engine relies on Iceberg's planning-
  * time min/max skipping only (iceberg_table_check_operator.py's scan
  * planning); runtime join-key file skipping is the scale path beyond it.
  */
object RuntimeFilterJoin {

  /** `fact ⋈ dim` on `on` (factCol -> dimCol equi-pairs), with the fact
    * side's FILES pruned by the dim side's runtime key values. Returns
    * exactly `fact.read(spark).join(dim, cond, joinType)`.
    */
  def join(spark: SparkSession, fact: Icebox, dim: DataFrame,
      on: Seq[(String, String)], joinType: String = "inner"): DataFrame = {
    require(on.nonEmpty, "runtime-filter join needs at least one equi-pair")
    val pruned = prunedFactRead(spark, fact, dim, on)
    val cond = on.map { case (f, d) => pruned(f) === dim(d) }.reduce(_ && _)
    pruned.join(dim, cond, joinType)
  }

  /** The bloom/stats-pruned fact read for `dim`'s join keys — exposed so
    * callers can compose (aggregate before join, add filters) and so the
    * oracle query can `require` on the pruned file count.
    */
  def prunedFactRead(spark: SparkSession, fact: Icebox, dim: DataFrame,
      on: Seq[(String, String)]): DataFrame = {
    val keys = dim.select(on.map { case (f, d) => col(d).as(f) }: _*).dropDuplicates()
    fact.readForKeys(spark, keys)
  }
}
