package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Testdata
import graft.table.Icebox

/** Round-9 plan/metadata captures for PLANS.md (run: sbt "runMain
  * graft.tools.PlansR9"). Evidence for this round's load-bearing claims:
  *   1. A table on a NON-LOCAL Hadoop FileSystem (mockfs://, the round's
  *      storage-port proof scheme — registered here exactly as a user
  *      registers s3a://) reads through the SAME manifest-backed index:
  *      the FileScan lists mockfs: paths, pushes the filter, and prunes
  *      to the matching files — identical plan shape to a local table;
  *   2. SQL time travel (`t VERSION AS OF n`) composes: the pinned view
  *      inside a join plans through IceboxFileIndex like any other
  *      relation (one scan per side, no materialization);
  *   3. Merge-on-read MERGE commits O(batch): pre-existing data files
  *      carry over BY PATH, the commit adds exactly one eq-delete dir +
  *      the batch's files, and the post-merge read plans the eq-delete
  *      anti-join as broadcast joins over an unshuffled scan.
  */
object PlansR9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.hadoopConfiguration.set("fs.mockfs.impl",
      "graft.tools.PlansMockFs")
    val dir = "/root/testdata/sf0.001"
    val orders = Testdata.table(spark, dir, "orders")

    println("=== non-local FileSystem read (want mockfs: paths + PushedFilters) ===")
    val remote = Icebox("mockfs://" +
      java.nio.file.Files.createTempDirectory("plans-r9-remote"))
    remote.append(orders.repartitionByRange(4, col("o_orderkey")),
      collectStats = Seq("o_orderkey"))
    println(s"manifest path sample: ${remote.currentSnapshot.get.files.head.path}")
    val pruned = remote.prunedFilesByStats("o_orderkey", None, Some(100.0)).size
    println(s"stats pruning on mockfs: ${remote.currentSnapshot.get.files.size} files " +
      s"-> $pruned admitted for o_orderkey <= 100")
    remote.readIndexed(spark).filter(col("o_orderkey") <= 100).explain("formatted")

    println("=== SQL time travel composes in a join (VERSION AS OF view) ===")
    val t = Icebox(java.nio.file.Files.createTempDirectory("plans-r9-tt").toString)
    val s0 = t.append(orders.filter(col("o_orderstatus") === "O"))
    t.append(orders.filter(col("o_orderstatus") =!= "O"))
    t.registerView(spark, "plans_tt")
    graft.sql.DmlSql.run(spark,
      s"""SELECT cur.o_orderkey FROM plans_tt cur
          LEFT ANTI JOIN plans_tt VERSION AS OF ${s0.id} old
          ON cur.o_orderkey = old.o_orderkey""").explain("formatted")

    println("=== merge-on-read MERGE: zero rewrite, O(batch) commit ===")
    val m = Icebox(java.nio.file.Files.createTempDirectory("plans-r9-mor").toString)
    m.append(orders.repartitionByRange(4, col("o_orderkey")))
    m.setProperties(Map("write.merge.mode" -> "merge-on-read"))
    graft.sql.MergeSql.register("plans_mor", m)
    orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .createOrReplaceTempView("plans_mor_src")
    val before = m.currentSnapshot.get.files.map(_.path)
    val snap = graft.sql.MergeSql.merge(spark,
      """MERGE INTO plans_mor t USING plans_mor_src s ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = m.currentSnapshot.get.files
    println(s"op=${snap.operation}; pre-existing ${before.size} files " +
      s"all carried by path: ${before.toSet.subsetOf(after.map(_.path).toSet)}; " +
      s"files added: ${after.size - before.size}; " +
      s"eq-delete dirs now attached: ${after.flatMap(_.eqDeletes).distinct.size}")
    m.read(spark).explain("formatted")
    spark.stop()
  }
}

/** mockfs for the plan capture (same contract as the test-side MockFs:
  * O_EXCL create models HDFS's atomic create-no-overwrite).
  */
class PlansMockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
  override def getScheme: String = "mockfs"
  private def excl(f: org.apache.hadoop.fs.Path): Unit = {
    val p = java.nio.file.Paths.get(f.toUri.getPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    try java.nio.file.Files.newByteChannel(p,
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE).close()
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    }
  }
  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) excl(f)
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }
}
