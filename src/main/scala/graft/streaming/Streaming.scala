package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Upsert
import graft.table.Icebox

/** Streaming-native incremental ingest — the Structured Streaming face of
  * the reference's micro-batch CDC layer (SURVEY §2.10).
  *
  * The reference schedules a 5-minute Airflow DAG
  * (airflow-dags/oracle_to_iceberg_realtime_cdc.py:25) and hand-rolls file
  * change detection (hdfs_to_iceberg_cdc_operator.py:198-237). Spark's file
  * source does the discovery natively (new-file detection, checkpointed
  * offsets, `maxFilesPerTrigger` back-pressure); `foreachBatch` gives each
  * micro-batch to the same Upsert/Icebox write paths the batch engine uses,
  * so batch and streaming share one merge implementation.
  *
  * Scale notes: the file-source checkpoint tracks seen files on the driver
  * (same metadata the batch FileCdc keeps); executors only read new files.
  * Watermark + windowed aggregation run with partial aggregation pushed
  * before the shuffle, state bounded by the watermark horizon.
  */
object Streaming {

  /** File-stream ingest: every new file under `sourceDir` lands in the
    * Icebox table via an atomic snapshot commit per micro-batch.
    * `Trigger.AvailableNow` processes the backlog then stops — the
    * streaming-native analog of one scheduled DAG run (C9); pass
    * `Trigger.ProcessingTime(...)` for the resident 5-minute loop.
    *
    * `refreshViews`: materialized-view targets (tables carrying a
    * persisted MvSql definition) refreshed in the SAME micro-batch loop
    * right after each source commit — end-to-end fresh aggregates with
    * no scheduler between ingest and view. Each refresh is the
    * operator's O(delta) incremental maintenance riding its exactly-once
    * cursor, so a replayed batch (whose append the stream marker already
    * skips) finds the cursor current and no-ops; a crash between source
    * commit and refresh is healed by the NEXT batch's refresh, which
    * picks up both commits' change diff in one delta.
    */
  def fileIngest(
      spark: SparkSession,
      sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      table: Icebox,
      checkpointDir: String,
      pk: Seq[String] = Nil,
      orderCol: Option[String] = None,
      format: String = "parquet",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      refreshViews: Seq[Icebox] = Nil): StreamingQuery = {
    val reader = spark.readStream.format(format).schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.load(sourceDir)
    // stable across restarts: derived from the checkpoint path, which IS the
    // stream's identity (Spark's queryId lives under it). SHA-256, not
    // String.hashCode — two distinct streams appending to the same table
    // with colliding 32-bit hashes would share exactly-once markers, and
    // appendStreamBatch's monotonic batchId check would silently DROP one
    // stream's batches
    val streamId = "ingest-" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(checkpointDir.getBytes("UTF-8")).take(12).map("%02x".format(_)).mkString
    // markers recorded by pre-SHA-256 builds live under the legacy
    // String.hashCode-derived id; a batch replayed across the upgrade must
    // still find them or it appends twice (one-time migration probe)
    val legacyStreamId = "ingest-" + Integer.toHexString(checkpointDir.hashCode)
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // pk path: the merge is content-idempotent (latest-wins dedupe is
          // deterministic), so a replayed batch converges without a marker;
          // append path: EXACTLY-ONCE via the committed (streamId, batchId)
          // marker — a replay after crash-before-checkpoint skips instead
          // of duplicating rows
          if (pk.nonEmpty) Upsert.intoTable(table, batch, pk, orderCol)
          else if (table.lastStreamBatch(streamId).isEmpty &&
              table.lastStreamBatch(legacyStreamId).exists(_ >= batchId)) ()
          else { table.appendStreamBatch(streamId, batchId, batch); () }
          // views refresh AFTER the commit, inside the same batch turn
          refreshViews.foreach(
            graft.operators.MaterializedView.refreshFromProperties(spark, _))
        }
      }
      .start()
  }

  /** Dedup-on-arrival corpus ingest: a file stream whose every micro-batch
    * lands through [[graft.operators.Dedup.dedupInsert]] — the batch
    * in-dedups on the content fingerprint, membership-probes the corpus
    * through stats/bloom-PRUNED reads (O(batch-relevant files), never
    * O(corpus)), and appends only genuinely new content in one atomic
    * commit. The continuous corpus-builder shape: re-offered files,
    * re-crawled pages with new ids, and cross-batch duplicates all drop at
    * the door instead of requiring a later full-corpus dedup pass.
    *
    * Exactly-once needs NO batch marker here: `dedupInsert` is content-
    * idempotent (the membership probe drops every already-ingested
    * fingerprint), so a batch replayed after a crash-before-checkpoint
    * converges to the same corpus — same contract as the pk upsert path
    * in [[fileIngest]]. Declare `manifest.bloom.columns=fingerprint` on
    * the corpus for planning-time probe pruning at scale.
    *
    * `refreshViews` refreshes materialized views right after each batch's
    * commit, as in [[fileIngest]].
    */
  def dedupIngest(
      spark: SparkSession,
      sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      corpus: Icebox,
      checkpointDir: String,
      textCol: String,
      idCol: String,
      format: String = "parquet",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      refreshViews: Seq[Icebox] = Nil,
      serializable: Boolean = false): StreamingQuery = {
    val reader = spark.readStream.format(format).schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(sourceDir).writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // serializable: several INDEPENDENT streams feeding one corpus
          // are concurrent writers — the head-CAS probe/append cycle
          // keeps cross-stream duplicates out (see Dedup.dedupInsert)
          graft.operators.Dedup.dedupInsert(corpus, batch, textCol, idCol,
            serializable = serializable)
          refreshViews.foreach(
            graft.operators.MaterializedView.refreshFromProperties(spark, _))
        }
      }
      .start()
  }

  /** NEAR-dup-on-arrival corpus ingest: [[dedupIngest]]'s fuzzy sibling —
    * every micro-batch lands through [[graft.operators.Dedup
    * .nearDupInsert]], so re-crawls with small edits (boilerplate drift,
    * timestamps, ad rotation) drop at the door too, not just verbatim
    * re-offers. The persisted LSH band index keeps the per-batch probe
    * O(batch): band keys prune index FILES via manifest blooms/stats and
    * the Jaccard verify touches only id-pruned candidate docs.
    *
    * Replay convergence is LSH-exact rather than content-exact: a batch
    * replayed after a crash-before-checkpoint re-probes the corpus, and
    * every doc it already appended is its own verbatim near-dup (every
    * band collides, Jaccard = 1 ≥ any threshold), so replays drop their
    * own first delivery — with the one documented gap that a crash
    * BETWEEN the corpus and index commits loses index entries (recall,
    * never duplication of the indexed doc itself; see
    * [[graft.operators.Dedup.rebuildNearDupIndex]]).
    */
  def nearDupIngest(
      spark: SparkSession,
      sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      corpus: Icebox,
      index: Icebox,
      checkpointDir: String,
      textCol: String,
      idCol: String,
      threshold: Double = 0.8,
      format: String = "parquet",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      refreshViews: Seq[Icebox] = Nil,
      serializable: Boolean = false): StreamingQuery = {
    val reader = spark.readStream.format(format).schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(sourceDir).writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Dedup.nearDupInsert(corpus, index, batch,
            textCol, idCol, threshold, serializable = serializable)
          refreshViews.foreach(
            graft.operators.MaterializedView.refreshFromProperties(spark, _))
        }
      }
      .start()
  }

  /** Streaming read FROM an Icebox table (the Iceberg streaming-read
    * analog): every commit writes new files under `data/graft_commit=<id>/`,
    * so Spark's file stream over the data dir surfaces each commit's rows as
    * a micro-batch — downstream pipelines consume table changes without
    * re-scanning. Append-only semantics (overwrites surface rewritten files
    * as new data; pair with upsert downstream, as with `changesSince`).
    *
    * CAVEAT — directory-driven, NOT manifest-driven: this watches raw files,
    * so it can surface data the table's committed state never references —
    * files of an in-flight or crashed commit, and expired-but-not-yet-GC'd
    * files. Use `changeFeed` when exact committed-only semantics matter;
    * this face trades that precision for Spark-native checkpointing and
    * back-pressure.
    */
  def tableStream(spark: SparkSession, table: Icebox,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val snap = table.currentSnapshot.getOrElse(sys.error(s"no table at ${table.tableDir}"))
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val readSchema = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(Icebox.CommitCol,
        org.apache.spark.sql.types.StringType))
    val reader = spark.readStream.format("parquet").schema(readSchema)
      .option("basePath", s"${table.tableDir}/data")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(s"${table.tableDir}/data")
      .drop(Icebox.CommitCol)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Watermarked tumbling-window aggregation over an event stream — the
    * event-time windowing surface (counts + sums per window), emitting
    * append-mode results once the watermark passes the window end.
    */
  def windowedCounts(
      events: DataFrame,           // streaming DF with (tsCol, valueCol, keyCol)
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDur: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("total_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("cnt"), col("total_value"))

  /** Manifest-driven change feed over an Icebox table: each cycle delivers
    * exactly the rows added by commits since the durable cursor — driven by
    * snapshot diffs (`changesSince`), never by directory listing, so
    * uncommitted / crashed-commit / expired files are never surfaced (the
    * Icebox read invariant `tableStream` cannot honor). The cursor advances
    * only after `onBatch` returns, giving at-least-once delivery; a cursor
    * pointing at an expired snapshot falls back to a full-table redelivery
    * (absorbed by an idempotent/upsert consumer, as with `changesSince`).
    * Returns the snapshot ids processed.
    */
  def changeFeed(spark: SparkSession, table: Icebox, cursorPath: String,
      intervalMs: Long = 0L, maxCycles: Int = 1)(
      onBatch: (DataFrame, Long) => Unit): Seq[Long] = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val cursor = Paths.get(cursorPath)
    def loadCursor(): Option[Long] =
      if (Files.exists(cursor)) Some(new String(Files.readAllBytes(cursor)).trim.toLong) else None
    def saveCursor(id: Long): Unit = {
      Option(cursor.getParent).foreach(Files.createDirectories(_))
      val tmp = cursor.resolveSibling(s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.write(tmp, id.toString.getBytes("UTF-8"))
      Files.move(tmp, cursor, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    microBatchLoop(intervalMs, maxCycles) { _ =>
      val cur = table.currentSnapshotId
      val last = loadCursor()
      if (cur >= 0 && !last.contains(cur)) {
        val batch = last match {
          case Some(id) =>
            // Only a MISSING manifest means the cursor's snapshot was
            // expired (GC'd) — that's the documented full-redelivery case.
            // A corrupt manifest or transient IO failure propagates instead
            // of silently turning into a surprise full re-read.
            try table.changesSince(spark, id)
            catch {
              // nio-local stores raise NoSuchFileException, Hadoop-backed
              // stores FileNotFoundException — both mean "manifest gone"
              case e @ (_: java.nio.file.NoSuchFileException |
                        _: java.io.FileNotFoundException) =>
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"changeFeed cursor snapshot $id expired (${e.getMessage}); " +
                    "falling back to full-table redelivery")
                table.read(spark)
            }
          case None => table.read(spark)
        }
        onBatch(batch, cur)
        saveCursor(cur)
        Some(cur)
      } else None
    }.flatten
  }

  /** Blocking micro-batch loop for the *batch* CDC cycle (C9) — the engine
    * analog of the reference's every-5-minutes cron DAG: run `cycle` every
    * `intervalMs` until `maxCycles` (or forever with maxCycles < 0).
    * Returns the per-cycle results.
    */
  def microBatchLoop[T](intervalMs: Long, maxCycles: Int)(cycle: Int => T): Seq[T] = {
    val out = Seq.newBuilder[T]
    var i = 0
    while (maxCycles < 0 || i < maxCycles) {
      val t0 = System.currentTimeMillis()
      out += cycle(i)
      i += 1
      if (maxCycles < 0 || i < maxCycles) {
        val sleep = intervalMs - (System.currentTimeMillis() - t0)
        if (sleep > 0) Thread.sleep(sleep)
      }
    }
    out.result()
  }
}
