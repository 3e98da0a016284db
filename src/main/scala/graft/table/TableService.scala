package graft.table

import org.apache.spark.sql.SparkSession

/** Policy-driven table maintenance — the reference runs compaction and
  * snapshot aging as SCHEDULED Airflow DAGs (reference:
  * maintenance/iceberg_compaction_operator.py, iceberg_aging_operator.py);
  * the engine analog is one idempotent `tick` driven by table properties,
  * callable from any scheduler, a streaming `foreachBatch`, or after every
  * N commits.
  *
  * Policy properties (all optional; tick is a no-op on an absent table):
  *  - `maintenance.enabled`            — 'false' disables everything
  *  - `maintenance.compact.min-files`  — compact when live files in the
  *    table (unpartitioned) or any partition (partitioned) exceed this
  *    (default 16; the small-file pressure threshold)
  *  - `maintenance.compact.target-file-mb` — rewrite target (default 512)
  *  - `maintenance.expire.max-age-ms`  — expire snapshots older than this
  *    (default 7 days, the reference's aging default)
  *  - `maintenance.expire.retain-last` — always keep this many (default 10)
  *  - `maintenance.analyze.columns`    — keep the NDV sketch index fresh
  *    for these columns on every tick. O(delta) by construction: only
  *    files missing a sketch are read, and sticky columns mean commits
  *    after the first ANALYZE sketch their own files — a steady-state
  *    tick is metadata-only. Runs AFTER compaction so rewritten files are
  *    covered in the same pass.
  *  - `maintenance.analyze.histogram`  — 'true': also rebuild the exact
  *    equi-width histogram for any of those columns whose snapshot-keyed
  *    histogram went stale (histograms invalidate at every commit, so
  *    this is ONE column scan per ticked-through commit — opt-in, priced
  *    accordingly). `maintenance.analyze.histogram.buckets` (default 32).
  *    Together these keep the CBO stats bridge fed without a scheduler
  *    ever issuing ANALYZE by hand.
  *  - auto-freshness (r13, on by default): a table that was EVER ANALYZEd
  *    re-analyzes its sticky `sketch.ndv.columns` set on the tick, and
  *    ever-built `hist.<col>` histograms rebuild at their previous bucket
  *    resolution — no configuration needed. Gated by
  *    `maintenance.analyze.lag-commits` (default 1 = re-analyze on any
  *    lag) / `maintenance.analyze.lag-bytes-pct` (default 0 = ignore
  *    growth); disable per table with `maintenance.analyze.auto=false`.
  *
  * 100 TB behavior: the partitioned path compacts ONLY partitions over the
  * file threshold (O(hot partitions), not a whole-table rewrite), expiry
  * is O(metadata) + deletes of unreferenced files, and both inherit the
  * head-drift guards of the underlying operations — a concurrent writer
  * makes the tick retry or skip, never lose data. A tick that finds
  * nothing over threshold touches zero data files.
  */
object TableService {

  final case class Report(
      compactedWholeTable: Boolean,
      compactedPartitions: Seq[Map[String, String]],
      expiredSnapshots: Seq[Long],
      mvRefresh: Option[String] = None,
      analyzedColumns: Seq[String] = Nil,
      histogramColumns: Seq[String] = Nil,
      analyzeError: Option[String] = None) {
    def actedOnData: Boolean =
      compactedWholeTable || compactedPartitions.nonEmpty ||
        mvRefresh.exists(m => m == "FullBuild" || m == "Incremental")
  }

  val Noop: Report = Report(compactedWholeTable = false, Nil, Nil)

  private def intProp(t: Icebox, key: String, dflt: Int): Int =
    t.properties.get(key).map(_.trim.toInt).getOrElse(dflt)
  private def longProp(t: Icebox, key: String, dflt: Long): Long =
    t.properties.get(key).map(_.trim.toLong).getOrElse(dflt)

  /** One maintenance pass; returns what was done. `nowMs` is injectable
    * for deterministic tests and backfill simulations.
    */
  def tick(spark: SparkSession, table: Icebox,
      nowMs: Long = System.currentTimeMillis()): Report = {
    if (!table.exists) return Noop
    if (table.properties.get("maintenance.enabled").exists(_.trim.equalsIgnoreCase("false")))
      return Noop
    val minFiles = intProp(table, "maintenance.compact.min-files", 16)
    val targetMb = intProp(table, "maintenance.compact.target-file-mb", 512)
    val maxAgeMs = longProp(table, "maintenance.expire.max-age-ms", 7L * 24 * 3600 * 1000)
    val retain = intProp(table, "maintenance.expire.retain-last", 10)

    val files = table.currentSnapshot.map(_.files).getOrElse(Nil)
    val partitioned = table.partitionColumns.nonEmpty
    val (whole, parts) =
      if (files.isEmpty) (false, Nil)
      else if (partitioned) {
        val hot = files.groupBy(_.partition).exists(_._2.size > minFiles)
        if (hot) (false, table.compactPartitions(spark, targetMb, minFiles))
        else (false, Nil)
      } else if (files.size > minFiles) {
        table.compact(spark, targetMb); (true, Nil)
      } else (false, Nil)

    // Materialized-view targets (tables carrying an MvSql definition in
    // their properties) also refresh on the tick — the engine analog of
    // scheduling REFRESH MATERIALIZED VIEW alongside compaction/aging in
    // the same DAG. Refresh runs BEFORE this table's expiry so the
    // refresh commit is never the one being aged out, and inherits the
    // operator's exactly-once cursor: a tick that finds the source
    // unchanged is a NoOp with zero data I/O.
    val mvMode = graft.operators.MaterializedView
      .refreshFromProperties(spark, table).map(_.toString)

    // auto-stats: keep the NDV index (and optionally histograms) fresh so
    // the CBO bridge always plans from current numbers. ANALYZE here is
    // O(delta) — post-compaction files get sketched in this same tick,
    // steady-state appends were sketched inline at commit.
    //
    // FRESHNESS POLICY (r13): CBO stats are snapshot-keyed, so they stop
    // serving the moment the head moves past them. A table that was EVER
    // ANALYZEd (the sticky `sketch.ndv.columns` set) re-analyzes on the
    // tick without `maintenance.analyze.columns` being configured, and
    // ever-built histograms (`hist.<col>` properties) rebuild at their
    // previous bucket resolution — both gated by how far the stats lag
    // the head: `maintenance.analyze.lag-commits` (default 1 = any lag)
    // or `maintenance.analyze.lag-bytes-pct` growth, whichever trips
    // first. `maintenance.analyze.auto=false` opts a table out. Bounded:
    // the NDV pass reads only files missing a sketch; the lag gate is
    // manifest arithmetic (snapshot ids + recorded totalBytes, zero file
    // resolution).
    val explicitCols = table.properties.get("maintenance.analyze.columns")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val autoOn = !table.properties.get("maintenance.analyze.auto")
      .exists(_.trim.equalsIgnoreCase("false"))
    val lagCommits = intProp(table, "maintenance.analyze.lag-commits", 1)
    val lagPct = intProp(table, "maintenance.analyze.lag-bytes-pct", 0)
    val headId = table.currentSnapshotId
    lazy val snapBytes: Map[Long, Long] =
      table.allSnapshots.map(s => s.id -> s.totalBytes).toMap
    def lagged(sid: Long): Boolean = {
      val behind = headId - sid
      behind > 0 && (behind >= lagCommits ||
        (lagPct > 0 && snapBytes.get(sid).exists { old =>
          old > 0 && snapBytes.getOrElse(headId, old) - old >= old * lagPct.toLong / 100L
        }))
    }
    val autoCols =
      if (!autoOn || headId < 0) Nil
      else table.properties.get("sketch.ndv.columns")
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
        .filterNot(explicitCols.contains)
        .filter { c =>
          table.properties.get(s"sketch.ndv.rollup.$c").map(_.split(':')) match {
            case Some(Array(sid, _)) =>
              scala.util.Try(sid.toLong).toOption.forall(lagged)
            case _ => true // sticky column with no rollup yet: build it
          }
        }
    val analyzeCols = explicitCols ++ autoCols
    // A stale `maintenance.analyze.columns` entry (column since dropped or
    // renamed) must not abort the tick: an unguarded throw here would
    // permanently block the expireSnapshots below and metadata would grow
    // without bound. Failure is surfaced in the Report instead.
    val (analyzed, analyzeErr) =
      if (analyzeCols.isEmpty) (Nil, None)
      else
        try { table.analyze(spark, analyzeCols); (analyzeCols, None) }
        catch { case scala.util.control.NonFatal(e) =>
          (Nil, Some(s"analyze(${analyzeCols.mkString(",")}): ${e.getMessage}")) }
    val histFlag = table.properties.get("maintenance.analyze.histogram")
      .exists(_.trim.equalsIgnoreCase("true"))
    val flaggedBins = intProp(table, "maintenance.analyze.histogram.buckets", 32)
    // (col, buckets): flagged columns at the configured resolution, plus —
    // auto path — ever-built histograms at their OWN previous resolution
    val histCandidates: Seq[(String, Int)] =
      (if (histFlag && analyzed.nonEmpty) analyzed.map(_ -> flaggedBins) else Nil) ++
        (if (!autoOn || headId < 0) Nil
         else table.properties.toSeq.collect {
           case (k, v) if k.startsWith("hist.") =>
             (k.stripPrefix("hist."), v.split(':'))
         }.collect {
           case (c, parts) if parts.length == 4 &&
               scala.util.Try(parts(0).toLong).toOption.forall(s => s != headId && lagged(s)) =>
             c -> parts(3).split(',').length
         })
    val histCols = histCandidates.distinct.collect {
      case (c, bins) if table.histogramMeta(c).isEmpty && // fresh one serves: skip
          (try { table.analyzeHistogram(spark, c, bins); true }
           catch { case scala.util.control.NonFatal(_) => false }) => c // no min/max anchor
    }

    val expired = table.expireSnapshots(nowMs - maxAgeMs, retain)
    Report(whole, parts, expired, mvMode, analyzed, histCols, analyzeErr)
  }
}
