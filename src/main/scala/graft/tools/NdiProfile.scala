package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.Icebox
import graft.operators.Dedup

/** Scratch: phase timing of the q_neardup_insert shape at a given SF. */
object NdiProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toFile.getAbsolutePath
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // constant-batch wave loop: 10 equal batches inserted sequentially —
    // the flat-wall proof that per-wave cost tracks the BATCH as the
    // corpus grows 10 waves deep (args(1) = "waves" enables)
    if (args.length > 1 && args(1) == "waves") {
      val corpus = Icebox(tmp("ndi_wc")); val index = Icebox(tmp("ndi_wi"))
      val fpc = graft.functions.TextFunctions.fingerprint(
        coalesce(col("text"), lit("")))
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("source"), col("n_chars"),
          concat_ws(" ", fpc, coalesce(col("text"), lit(""))).as("text"))
      (0 until 10).foreach { w =>
        val batch = docs.filter(col("doc_id") % 10 === w)
        val t0 = System.nanoTime()
        val n = Dedup.nearDupInsert(corpus, index, batch, "text", "doc_id",
          threshold = 1.0, bands = 2)
        val wall = (System.nanoTime() - t0) / 1e9
        val idxFiles = index.currentSnapshot.map(_.files.size).getOrElse(0)
        val corpusRows = corpus.rowCount.getOrElse(-1L)
        println(f"WAVE $w%2d wall=$wall%6.2f s appended=$n%6d corpusRows=$corpusRows%7d indexFiles=$idxFiles%3d")
      }
      spark.stop(); return
    }
    (1 to 2).foreach { it =>
      println(s"== iteration $it ==")
      val corpus = Icebox(tmp("ndi_c")); val index = Icebox(tmp("ndi_i"))
      val fpc = graft.functions.TextFunctions.fingerprint(
        coalesce(col("text"), lit("")))
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("source"), col("n_chars"),
          concat_ws(" ", fpc, coalesce(col("text"), lit(""))).as("text"))
      val batch1 = docs.filter(col("doc_id") % 3 =!= 0)
      val n1 = phase("wave1")(Dedup.nearDupInsert(corpus, index, batch1,
        "text", "doc_id", threshold = 1.0, bands = 2))
      val batch2 = docs.filter(col("doc_id") % 3 === 0).unionByName(
        batch1.filter(col("doc_id") % 9 === 1)
          .withColumn("doc_id", col("doc_id") + 10000))
      val n2 = phase("wave2")(Dedup.nearDupInsert(corpus, index, batch2,
        "text", "doc_id", threshold = 1.0, bands = 2))
      println(s"n1=$n1 n2=$n2")
      // step-level mirror of wave1 on a FRESH pair of tables: every internal
      // stage of nearDupInsert timed separately, same config
      val c2 = Icebox(tmp("ndi_c2")); val i2 = Icebox(tmp("ndi_i2"))
      val numHashes = 64; val b = 2; val r = numHashes / b; val shingleSize = 5
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val bp = batch1.persist(lvl)
      phase("w1-batch-persist")(bp.count())
      val bandKeys = array((0 until b).map(i =>
        xxhash64(slice(col("__sig"), i * r + 1, r), lit(i))): _*)
      val exploded = bp.select(col("doc_id").as("__id"),
        explode(graft.functions.ShingleExpressions.shingleHashesFast(
          spark, col("text"), shingleSize)).as("__h"))
      val banded = exploded.groupBy("__id")
        .agg(graft.functions.MinHashAgg.signature(spark, col("__h"), numHashes).as("__sig"))
        .select(col("__id"), posexplode(bandKeys)).toDF("__id", "__band", "__key")
        .persist(lvl)
      phase("w1-banded")(banded.count())
      val sh = bp.select(col("doc_id").as("__bid"),
        array_distinct(graft.functions.ShingleExpressions.shingleHashesFast(
          spark, col("text"), shingleSize)).as("__shB")).persist(lvl)
      phase("w1-shingle-sets")(sh.count())
      val ids = array_sort(collect_list("__id"))
      val intraPairs = banded.groupBy("__band", "__key")
        .agg(ids.as("__ids"))
        .filter(size(col("__ids")).between(2, 1000))
        .select(explode(flatten(transform(
          sequence(lit(1), size(col("__ids")) - 1),
          i => transform(slice(col("__ids"), i + 1, size(col("__ids"))),
            x => struct(element_at(col("__ids"), i).as("idA"), x.as("idB")))))).as("__p"))
        .select(col("__p.idA"), col("__p.idB"))
        .distinct()
      def jac(a: org.apache.spark.sql.Column, bc: org.apache.spark.sql.Column) =
        when(size(array_union(a, bc)) === 0, lit(0.0))
          .otherwise(size(array_intersect(a, bc)).cast("double") / size(array_union(a, bc)))
      val intraDups = intraPairs
        .join(sh.select(col("__bid").as("idA"), col("__shB").as("__shA")), "idA")
        .join(sh.select(col("__bid").as("idB"), col("__shB")), "idB")
        .filter(jac(col("__shA"), col("__shB")) >= 1.0)
        .select(col("idB").as("__dup")).distinct()
      phase("w1-intra-verify")(println("  intraDups=" + intraDups.count()))
      val fresh = bp.join(intraDups, col("doc_id") === col("__dup"), "left_anti")
        .persist(lvl)
      phase("w1-fresh-count")(fresh.count())
      phase("w1-corpus-append")(c2.append(fresh, collectStats = Seq("doc_id")))
      phase("w1-index-props")(i2.setProperties(Map("manifest.bloom.columns" -> "key")))
      phase("w1-index-append")(i2.append(
        banded.join(fresh.select(col("doc_id").as("__id")), Seq("__id"), "left_semi")
          .select(col("__band").as("band"), col("__key").as("key"),
            col("__id").as("doc_id")),
        collectStats = Seq("key")))
      banded.unpersist(); sh.unpersist(); bp.unpersist(); fresh.unpersist()
    }
    spark.stop()
  }
}
