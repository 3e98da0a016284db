package graft.tools

import org.apache.spark.sql.SparkSession

/** Suite-context profiler for q_neardup_insert's chronic bench variance
  * (VERDICT r15, Next #6: 13.8/32.0 s draws against a 6.6 s anchor in the
  * full suite, 7.7 s isolated — the canary rescues it every round).
  *
  * Replays the EXACT SparkEntry query body alternately in a fresh session
  * and after a suite-context preamble (a slice of the bench's heaviest
  * queries, which leave broadcast relations, band indexes and shuffle
  * state resident on the shared JVM heap), with GC-time and heap-residency
  * deltas around every draw:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch "runMain graft.tools.NdiSuiteProfile"
  */
object NdiSuiteProfile {
  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }
  private def heapMb: Long =
    (Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()) >> 20

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Unit = {
      val (g0, h0, t0) = (gcMs, heapMb, System.nanoTime())
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[ndi] $name%-24s wall=$wall%7.2f s gc=+${gcMs - g0}%5d ms heap=$h0%5d->${heapMb}%5d MB")
    }

    run("q_count") // session warm-up, as the bench does
    // 1) isolated baseline draws
    (1 to 2).foreach(_ => run("q_neardup_insert"))
    // 2) suite-context preamble: the bench's heaviest neighbors
    val preamble = Seq("q_embed_neardup", "q_minhash_dedup", "q_simhash_dedup",
      "q_mv_refresh", "q_mv_join", "q_ann_ivfpq", "q_semdedup", "q_lm_5gram")
    preamble.foreach { q =>
      if (graft.SparkEntry.queries.contains(q)) run(q)
    }
    println(s"[ndi] -- post-preamble heap=${heapMb} MB --")
    (1 to 2).foreach(_ => run("q_neardup_insert"))
    // 3) after an explicit GC, does the elevation persist?
    System.gc(); Thread.sleep(500)
    println(s"[ndi] -- post-System.gc heap=${heapMb} MB --")
    run("q_neardup_insert")
    spark.stop()
  }
}
