package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.table.Icebox

/** Round-11i evidence: the session's three additions.
  *
  *  1. Manifest NDV index — ANALYZE cost is O(new files) after the first
  *     pass (measured: files scanned by the second analyze), estimate
  *     accuracy vs exact, zero-data-I/O answer path.
  *  2. ExactSubstr span removal — plan shape (exchange count, no
  *     cartesian), wall time at sf0.1.
  *  3. dedupIngest — per-batch membership probe rides pruned reads
  *     (files opened by the probe vs corpus files).
  */
object PlansR11i {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeMs[T](body: => T): (T, Long) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1000000)
    }

    // ---- 1. NDV index: O(delta) analyze
    val docs = graft.sources.Testdata.table(spark, sfDir, "documents")
    val t = Icebox(java.nio.file.Files.createTempDirectory("ndv-plan").toString)
    t.append(docs.repartition(16, col("doc_id")))
    val files0 = t.currentSnapshot.get.files.size
    val (_, fullMs) = timeMs(t.analyze(spark, Seq("doc_id", "source")))
    // append 1/8 more data: commits after ANALYZE sketch inline, so the
    // re-analyze has NOTHING left to scan (pure rollup re-fold)
    t.append(docs.filter(col("doc_id") % 8 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000).repartition(2, col("doc_id")))
    val files1 = t.currentSnapshot.get.files.size
    val missing = t.currentSnapshot.get.files.count(f => !f.sketches.contains("doc_id"))
    val (_, incMs) = timeMs(t.analyze(spark, Seq("doc_id", "source")))
    val est = t.approxCountDistinctMeta("doc_id").get
    val exact = t.read(spark).select(countDistinct(col("doc_id"))).head().getLong(0)
    println(s"== NDV: first analyze $files0 files ${fullMs}ms; " +
      s"after append ($files1 files) un-sketched=$missing, re-analyze ${incMs}ms")
    println(f"== NDV: estimate=$est exact=$exact err=${math.abs(est - exact) * 100.0 / exact}%.2f%%")

    // ---- 2. ExactSubstr plan shape + time
    val q = graft.SparkEntry.queries("q_exact_substr")(spark, sfDir)
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = "Exchange".r.findAllIn(plan).size
    val cartesian = plan.contains("Cartesian") || plan.contains("BroadcastNestedLoop")
    val (n, esMs) = timeMs(q.count())
    println(s"== exact_substr: $exchanges Exchange(s), cartesian=$cartesian, " +
      s"$n docs in ${esMs}ms")

    // ---- 3. dedupIngest probe pruning: corpus with bloom'd fingerprints,
    // batch probe should open far fewer files than the corpus holds
    val corpus = Icebox(java.nio.file.Files.createTempDirectory("ddi-plan").toString)
    corpus.setProperties(Map("manifest.bloom.columns" -> "fingerprint"))
    (0 until 8).foreach { i =>
      graft.operators.Dedup.dedupInsert(corpus,
        docs.filter(col("doc_id") % 8 === i), "text", "doc_id")
    }
    val corpusFiles = corpus.currentSnapshot.get.files.size
    val batch = docs.filter(col("doc_id") % 997 === 0) // a small re-offer wave
    val probe = corpus.readForKeys(spark,
      batch.select(graft.functions.TextFunctions
        .fingerprint(coalesce(col("text"), lit(""))).as("fingerprint")))
    val probed = probe.select(input_file_name()).distinct().count()
    println(s"== dedupIngest probe: corpus=$corpusFiles files, batch probe opened <=$probed")
    spark.stop()
  }
}
