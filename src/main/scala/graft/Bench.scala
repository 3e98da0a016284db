package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query at the given scale
  * factor and prints one JSON line. Each query is fully materialized through
  * the `noop` sink (not `count()`, which parquet count-pushdown could
  * short-circuit for pure scans).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: interleaved WARN lines have corrupted the one-line
    // JSON capture downstream (BENCH_r02/r03 both show parsed: null)
    spark.sparkContext.setLogLevel("ERROR")
    // warm the session (codegen, parquet footer reads) so the first timed
    // query doesn't absorb JVM startup
    try SparkEntry.queries("q_count")(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    // BEST-OF-2 per query (basis change recorded in BASELINE.md): a
    // transient host stall lands on one run, not both — rounds 7-9 each
    // recorded a multi-second phantom regression from a single-pass time
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
