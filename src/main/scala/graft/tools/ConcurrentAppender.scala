package graft.tools

import org.apache.spark.sql.SparkSession
import graft.table.Icebox

/** Child-process worker for the cross-PROCESS concurrency specs: opens the
  * table at `args(0)` from its own JVM (own SparkSession, own FileSystem
  * instances, no shared locks beyond the on-disk protocol) and runs
  * `args(3)` (default `append`):
  *  - `append`: `args(1)` one-file commits tagged `args(2)`
  *  - `delete`: `args(1)` single-key equality deletes of ids 1..n
  *  - `compact`: `args(1)` whole-table compactions, 50 ms apart
  * Exit 0 iff every commit published.
  */
object ConcurrentAppender {
  def main(args: Array[String]): Unit = {
    val Array(dir, n, tag) = args.take(3)
    val op = if (args.length > 3) args(3) else "append"
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName(s"appender-$tag").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = Icebox(dir)
    op match {
      case "append" =>
        (1 to n.toInt).foreach { i =>
          t.append(Seq((s"$tag-$i", i)).toDF("k", "v").coalesce(1))
        }
      case "delete" =>
        (1 to n.toInt).foreach(i => t.deleteByKeys(Seq(i.toLong).toDF("id")))
      case "compact" =>
        (1 to n.toInt).foreach { _ =>
          t.compact(spark, targetFileMb = 1); Thread.sleep(50)
        }
      case other => sys.error(s"unknown op $other")
    }
    spark.stop()
  }
}
