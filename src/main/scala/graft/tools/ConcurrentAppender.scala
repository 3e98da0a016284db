package graft.tools

import org.apache.spark.sql.SparkSession
import graft.table.Icebox

/** Child-process worker for the cross-PROCESS concurrency spec: opens the
  * table at `args(0)` from its own JVM (own SparkSession, own FileSystem
  * instances, no shared locks beyond the on-disk protocol) and appends
  * `args(1)` one-file commits tagged `args(2)`. Exit 0 iff every commit
  * published.
  */
object ConcurrentAppender {
  def main(args: Array[String]): Unit = {
    val Array(dir, n, tag) = args.take(3)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName(s"appender-$tag").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = Icebox(dir)
    (1 to n.toInt).foreach { i =>
      t.append(Seq((s"$tag-$i", i)).toDF("k", "v").coalesce(1))
    }
    spark.stop()
  }
}
