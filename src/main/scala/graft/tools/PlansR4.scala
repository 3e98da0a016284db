package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Testdata
import graft.table.Icebox

/** Round-4 physical-plan captures for PLANS.md (run: sbt "runMain
  * graft.tools.PlansR4"). Verifies the three load-bearing plan claims:
  *   1. q_ann_topk — rank-limit pushdown: `WindowGroupLimit ... Partial`
  *      BEFORE the Exchange (each map task ships its local top-k only);
  *   2. q_ann_ivf — no Exchange before the probe-bounded candidate join
  *      (centroid assignment is a narrow projection, corpus shuffles only
  *      into the broadcast-joined candidate scoring);
  *   3. Icebox default read — the scan's Location is the manifest-backed
  *      IceboxFileIndex (no InMemoryFileIndex directory listing).
  */
object PlansR4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val e = Testdata.table(spark, dir, "embeddings")

    println("=== q_ann_topk (want WindowGroupLimit Partial BEFORE Exchange) ===")
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), k = 5).explain("formatted")

    println("=== q_ann_ivf (want NO Exchange below the candidate join's corpus side) ===")
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 8), k = 5, nlist = 16, nprobe = 4)
      .explain("formatted")

    println("=== Icebox DEFAULT read (want Location: IceboxFileIndex, not InMemoryFileIndex) ===")
    val t = Icebox(java.nio.file.Files.createTempDirectory("plans-r4").toString)
    val orders = Testdata.table(spark, dir, "orders")
    t.append(orders, partitionBy = Seq("o_orderstatus"), collectStats = Seq("o_totalprice"))
    t.read(spark).filter(col("o_orderstatus") === "F" && col("o_totalprice") <= 50000.0)
      .explain("formatted")

    println("=== z-order compactSorted read (stats recorded for BOTH sort columns) ===")
    val tz = Icebox(java.nio.file.Files.createTempDirectory("plans-r4z").toString)
    tz.append(orders)
    tz.compactSorted(spark, Seq("o_custkey", "o_totalprice"), numFiles = Some(8))
    tz.read(spark).filter(col("o_totalprice") <= 5000.0).explain("formatted")
    println(s"[z-order] files=${tz.currentSnapshot.get.files.size} " +
      s"kept_on_2nd_col=${tz.prunedFilesByStats("o_totalprice", None, Some(5000.0)).size}")
    spark.stop()
  }
}
