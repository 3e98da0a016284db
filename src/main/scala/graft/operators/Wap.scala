package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.table.{Icebox, Snapshot}

/** Write–audit–publish: land a risky batch on an isolated branch, run
  * validation queries against the branch (readers of main never see the
  * data), and only then advance main — atomically, via fast-forward — or
  * drop the branch leaving main bit-identical to before.
  *
  * This is the Iceberg WAP pattern expressed on the engine's branch refs
  * (reference analog: staged Iceberg writes before catalog publication).
  * The audit runs on the real committed files of the staging branch — the
  * exact bytes main would serve after publish, not a pre-write DataFrame —
  * so checks like row counts against file statistics or duplicate-key
  * probes validate the actual table state.
  *
  * Concurrency: publish is a fast-forward, which requires main's head to
  * still be an ancestor of the branch head. A concurrent commit to main
  * after staging makes the publish fail with the branch intact — the
  * caller re-stages (or cherry-picks) rather than silently clobbering the
  * concurrent writer. At 100 TB this is the property that matters: audit
  * cost is on the staging lineage only, publish is O(1) pointer movement,
  * and a failed audit costs zero rewrites of main.
  */
object Wap {

  /** Outcome of one WAP cycle: whether main advanced, the snapshot served
    * by main afterwards, and the audit failure reason when not published.
    */
  final case class WapResult(published: Boolean, mainSnapshotId: Long,
      auditError: Option[String])

  /** Stage `df` on `branch` (created at the current head if absent), run
    * `audit` on the branch's table state, and fast-forward main iff the
    * audit returns None. The branch is dropped afterwards in either
    * outcome; on audit failure main is untouched.
    */
  def writeAuditPublish(spark: SparkSession, table: Icebox, df: DataFrame,
      audit: DataFrame => Option[String],
      branch: String = "wap-stage",
      partitionBy: Seq[String] = Nil): WapResult = {
    require(table.exists, "write-audit-publish requires an existing table")
    if (!table.refs.contains(branch)) table.createBranch(branch)
    try {
      val staged: Snapshot = table.appendToBranch(branch, df, partitionBy)
      audit(table.readRef(spark, branch)) match {
        case None =>
          val published = table.fastForward(branch)
          WapResult(published = true, published.id, None)
        case Some(reason) =>
          WapResult(published = false, table.currentSnapshotId, Some(reason))
      }
    } finally {
      if (table.refs.contains(branch)) table.dropRef(branch)
    }
  }

  /** Common audits, composable with `orElse`-style chaining via `++`. */
  object audits {
    /** Fail when any of `cols` contains a null. */
    def noNulls(cols: Seq[String]): DataFrame => Option[String] = df => {
      import org.apache.spark.sql.functions._
      val bad = cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(c))
      val row = df.agg(bad.head, bad.tail: _*).head()
      cols.zipWithIndex.collectFirst {
        case (c, i) if row.getLong(i) > 0 => s"nulls in $c: ${row.getLong(i)}"
      }
    }

    /** Fail when `keyCols` are not unique across the staged table. */
    def uniqueKey(keyCols: Seq[String]): DataFrame => Option[String] = df => {
      import org.apache.spark.sql.functions._
      val dups = df.groupBy(keyCols.map(col): _*).count()
        .filter(col("count") > 1).limit(1).count()
      if (dups > 0) Some(s"duplicate keys on (${keyCols.mkString(",")})") else None
    }

    /** Fail when a boolean SQL predicate has violators. */
    def expect(predicate: String): DataFrame => Option[String] = df => {
      val n = df.filter(s"NOT ($predicate)").limit(1).count()
      if (n > 0) Some(s"rows violate: $predicate") else None
    }

    /** All audits in order, first failure wins. */
    def all(checks: (DataFrame => Option[String])*): DataFrame => Option[String] =
      df => checks.iterator.flatMap(_(df)).buffered.headOption
  }
}
