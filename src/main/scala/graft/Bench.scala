package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query at the given scale
  * factor and prints one JSON line. Each query is fully materialized through
  * the `noop` sink (not `count()`, which parquet count-pushdown could
  * short-circuit for pure scans).
  *
  * The harness that captures this keeps only the LAST 2000 characters of
  * stdout, so the printed line holds a stable HEADLINE subset of per-query
  * times (3-decimal, fits the window — r02/r03/r10 all recorded
  * `parsed: null` from oversized lines); the FULL per-query map is written
  * to `BENCH_FULL.json` in the working directory (committed with the repo)
  * with the same `total` over ALL queries.
  *
  * `SPARK_GRAFT_BENCH_ONLY=q_a,q_b` restricts the run to named queries —
  * the regression-adjudication path (isolates a query from whole-suite
  * JVM/GC/ordering effects).
  *
  * The run self-certifies against host stalls: a fixed sentinel query is
  * timed throughout and the artifact carries `"degraded": true` when any
  * reading exceeds 2× the run's own floor — numbers captured in a stall
  * window announce themselves instead of reading as code regressions.
  */
object Bench {
  /** Round-over-round comparison anchors: one per major subsystem, names
    * stable across rounds. Keep the encoded line under ~1900 chars.
    */
  private val headline: Seq[String] = Seq(
    "q1_agg", "q_agg_multi", "q_topk", "q_window_hourly", "q_join_broadcast",
    "q_join_multi", "q_in_filter", "q_normalize", "q_scan_filter_project",
    "q_csv_scan", "q_orc_scan", "q_json_scan", "q_union_all",
    "q_icebox_append", "q_icebox_compact", "q_icebox_upsert", "q_icebox_zorder",
    "q_icebox_partition_prune", "q_bloom_prune", "q_merge_into", "q_merge_mor",
    "q_update_mor", "q_delete_mor", "q_cdc_cycle", "q_change_feed",
    "q_minhash_dedup", "q_simhash_dedup", "q_dedup_exact", "q_dedup_components",
    "q_ann_topk", "q_ann_ivf", "q_text_quality", "q_text_normalize", "q_bm25",
    "q_paragraph_dedup", "q_profile", "q_heavy_hitters", "q_mv_refresh",
    "q_mv_sql", "q_sessionize", "q_asof_join", "q_range_join", "q_salted_join",
    "q_pipeline", "q_llm_pipeline", "q_image_decode", "q_multimodal_decode",
    "q_mv_join", "q_mv_catalyst", "q_resample")

  private def fmt(v: Double): String = f"$v%.3f".replace(",", ".")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the engine's own session defaults (GraftSession): AQE coalesces
      // the small shuffles this suite is full of, so wide masters don't
      // pay 32-way task overhead on 600k-row stages
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    // ERROR, not WARN: interleaved WARN lines have corrupted the one-line
    // JSON capture downstream (BENCH_r02/r03 both show parsed: null)
    spark.sparkContext.setLogLevel("ERROR")
    // warm the session (codegen, parquet footer reads) so the first timed
    // query doesn't absorb JVM startup
    try SparkEntry.queries("q_count")(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    // DRIFT CANARY: a fixed sentinel query (the q_normalize projection —
    // code untouched for many rounds, ~0.4 s isolated) timed at the start,
    // every `SentinelEvery` queries, and at the end. A host stall window
    // (four rounds of phantom "regressions" were adjudicated to exactly
    // this) shows up as a sentinel reading far above the run's own floor —
    // the artifact then SELF-CERTIFIES as degraded instead of demanding a
    // post-hoc isolated-rerun investigation.
    val SentinelEvery = 25
    val DegradedRatio = 2.0
    val sentinelReadings = scala.collection.mutable.ArrayBuffer[Double]()
    def sentinelOnce(): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries("q_normalize")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }
    def sentinel(): Unit = sentinelReadings += sentinelOnce()
    sentinelOnce() // warm-up: the first execution absorbs codegen/plan
                   // compile and would read as phantom drift — discard it
    sentinel(); sentinel() // two at the start: the floor is in-run, not a constant
    // BEST-OF-2 per query (basis change recorded in BASELINE.md): a
    // transient host stall lands on one run, not both — rounds 7-9 each
    // recorded a multi-second phantom regression from a single-pass time
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .map { case ((name, fn), i) =>
        if (i > 0 && i % SentinelEvery == 0) sentinel()
        def once(): Double = {
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          (System.nanoTime() - t0) / 1e9
        }
        name -> math.min(once(), once())
      }
    sentinel()
    val floor = sentinelReadings.min
    // both a RELATIVE (2× floor) and an ABSOLUTE (≥ 1 s over floor) excess:
    // sub-second readings jitter well past 2× from scheduling noise alone,
    // while the stall windows being guarded against are multi-second
    val degraded = sentinelReadings.max > DegradedRatio * floor &&
      sentinelReadings.max - floor > 1.0
    val sentinelJson = s""""sentinel":{"query":"q_normalize","readings":[${sentinelReadings.map(fmt).mkString(",")}],"floor":${fmt(floor)},"max":${fmt(sentinelReadings.max)},"degraded":$degraded}"""
    System.err.println(s"[bench] $sentinelJson")
    val total = results.map(_._2).sum
    def enc(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // full map -> file (survives the stdout tail window; committed
    // in-repo). Subset runs (SPARK_GRAFT_BENCH_ONLY) must NOT clobber the
    // committed full-suite artifact with a partial map.
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${enc(results)},"sf":"$sfDir","basis":"best-of-2-min","cpus":$cpus,"n_queries":${results.size},$sentinelJson}"""
    if (only.isEmpty) try {
      val w = new java.io.PrintWriter("BENCH_FULL.json"); w.println(full); w.close()
    } catch { case _: Throwable => () }
    val line = results.filter { case (k, _) => only.isDefined || headline.contains(k) }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${enc(line)},"sf":"$sfDir","basis":"best-of-2-min","cpus":$cpus,"n_queries":${results.size},"degraded":$degraded,"full":"BENCH_FULL.json"}""")
    System.out.flush()
    spark.stop()
  }
}
