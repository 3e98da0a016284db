package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scale evidence for IVF-PQ's core claim — at probe time the posting-list
  * BYTES are the cost, and codes-only lists shrink them ~30x: builds a
  * float IVF index and a PQ index over the same 200k x 64-dim clustered
  * corpus with the same trained centroids, then compares on-disk index
  * bytes, cold+warm probe wall, and PQ recall vs the float result at a
  * realistic refine budget. Evidence lands in PLANS.md.
  *
  *   sbt -batch "runMain graft.tools.PqScale"
  */
object PqScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 200k vectors in 32 soft clusters (deterministic): cluster centers on
    // scaled hash directions, per-vector gaussian noise
    val n = 200000L
    val dim = 64
    val corpus = spark.range(n).select(col("id").as("vec_id"))
      .withColumn("__c", pmod(xxhash64(col("vec_id")), lit(32)))
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
        j => (
          when(pmod(xxhash64(col("__c"), j), lit(8)) === 0, lit(8.0)).otherwise(lit(0.0))
            + sin(xxhash64(col("vec_id"), j).cast("double") / 1e18) * lit(0.8)
        ).cast("float")))
      .drop("__c")
      .persist()
    println(s"[pq-scale] corpus rows=${corpus.count()}")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq-scale] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val centroids = t("ivfTrain (nlist=64)")(
      Similarity.ivfTrain(corpus, nlist = 64, seed = 9L, trainFraction = 0.1))
    centroids.persist().count()
    val cb = t("pqTrainResidual (m=8,codes=64)")(
      Similarity.pqTrainResidual(corpus, centroids, m = 8, codes = 64, seed = 9L,
        trainFraction = 0.05))
    cb.persist().count()

    val floatIdx = graft.table.Icebox(
      java.nio.file.Files.createTempDirectory("pqscale-float").toString)
    val pqIdx = graft.table.Icebox(
      java.nio.file.Files.createTempDirectory("pqscale-pq").toString)
    t("ivfInsert (float)")(Similarity.ivfInsert(floatIdx, centroids, corpus))
    t("ivfPqInsert (codes)")(Similarity.ivfPqInsert(pqIdx, centroids, cb, corpus))

    def dirBytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(dir))
    }
    val (fB, pB) = (dirBytes(floatIdx.tableDir.toString), dirBytes(pqIdx.tableDir.toString))
    println(f"[pq-scale] index bytes: float=${fB / 1024}%d KiB pq=${pB / 1024}%d KiB ratio=${fB.toDouble / pB}%.1fx")

    val queries = corpus.filter(col("vec_id") < 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cold + warm probe walls
    val fCold = t("ivfSearch cold")(rows(
      Similarity.ivfSearch(floatIdx, centroids, queries, k = 10, nprobe = 8)))
    val fWarm = t("ivfSearch warm")(rows(
      Similarity.ivfSearch(floatIdx, centroids, queries, k = 10, nprobe = 8)))
    println(s"[pq-scale] float cold==warm: ${fCold == fWarm}")
    // recall-vs-refine curve: tight clusters are PQ's hard case (neighbor
    // order within a cluster is noise-scale, below quantization error), so
    // the refine budget is the recall knob
    Seq(100, 500, 2000, 8000).foreach { r =>
      val got = t(f"ivfPqSearch refine=$r%-5d")(rows(
        Similarity.ivfPqSearch(pqIdx, centroids, cb, corpus, queries,
          k = 10, nprobe = 8, refineK = r)))
      val recall = got.intersect(fWarm).size.toDouble / fWarm.size
      println(f"[pq-scale] recall@refine=$r%-5d $recall%.3f")
    }
    spark.stop()
  }
}
