package graft.tools

import org.apache.spark.sql.SparkSession
import graft.table.Icebox

/** Scratch: fixed-cost breakdown of the commit protocol — 20 tiny appends
  * per config, reporting the steady-state median wall per append.
  */
object CommitProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toFile.getAbsolutePath
    def run(label: String, props: Map[String, String], stats: Seq[String]): Unit = {
      val t = Icebox(tmp("cp"))
      if (props.nonEmpty) t.setProperties(props)
      val parts = sys.env.getOrElse("CP_PARTS", "32").toInt
      val walls = (0 until 20).map { i =>
        val df = (1 to 1000).map(j => (i * 1000L + j, s"v$j", j % 7)).toDF("id", "s", "k")
          .repartition(parts)
        val t0 = System.nanoTime()
        t.append(df, collectStats = stats)
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = walls.drop(5).sorted // skip warmup
      println(f"$label%-34s median=${sorted(sorted.size / 2)}%6.3f s  min=${sorted.head}%6.3f  max=${sorted.last}%6.3f")
    }
    (1 to 2).foreach { it =>
      println(s"== iteration $it ==")
      run("plain append (no stats)", Map.empty, Nil)
      run("append + stats(id)", Map.empty, Seq("id"))
      run("append + blooms(id)", Map("manifest.bloom.columns" -> "id"), Nil)
      run("append + stats + blooms", Map("manifest.bloom.columns" -> "id"), Seq("id"))
      run("append + sort + stats + blooms", Map("manifest.bloom.columns" -> "id",
        "write.sort.columns" -> "id"), Seq("id"))
    }
    spark.stop()
  }
}
