package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.pipeline.{Config, Pipeline, RetryPolicy, Task}
import graft.table.Icebox

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("config precedence: runtime > operator > env (hdfs_to_iceberg_operator.py:166-179)") {
    val c = Config(
      runtime = Map("bucket" -> "from-dag"),
      operator = Map("bucket" -> "from-op", "warehouse" -> "from-op"),
      env = Map("bucket" -> "from-env", "warehouse" -> "from-env", "catalog" -> "from-env"))
    c("bucket") shouldBe "from-dag"
    c("warehouse") shouldBe "from-op"
    c("catalog") shouldBe "from-env"
    c.get("absent") shouldBe None
    an[NoSuchElementException] should be thrownBy c("absent")
    c.withRuntime("catalog" -> "override")("catalog") shouldBe "override"
  }

  test("retry policy retries then succeeds (complete_workflow.py:18-19)") {
    val attempts = new AtomicInteger(0)
    val out = RetryPolicy(retries = 2, delayMs = 0).run("flaky") {
      if (attempts.incrementAndGet() < 3) sys.error("boom") else "ok"
    }
    out shouldBe "ok"
    attempts.get() shouldBe 3
  }

  test("retry policy gives up after retries exhausted and aborts the chain") {
    val ran = new AtomicInteger(0)
    val p = Task("fail", (_, _) => sys.error("always")) >> Task("after", (_, _) => { ran.incrementAndGet(); () })
    an[Exception] should be thrownBy p.run(spark, Config(), RetryPolicy(retries = 1, delayMs = 0))
    ran.get() shouldBe 0 // downstream never ran
  }

  test("transfer >> compact >> expire runs end-to-end in order (complete_workflow.py:69)") {
    val dir = tmpDir("pipe")
    val table = Icebox(dir)
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

    val transfer = Pipeline.transform("transfer",
      _ => src, df => df.filter($"id" <= 2), df => { table.append(df); () })
    val compact = Task("compact", (s, _) => { table.compact(s); () })
    val expire = Task("expire", (_, cfg) => {
      table.expireSnapshots(System.currentTimeMillis() + 1000,
        retainLast = cfg.getOrElse("retain_last", "10").toInt); ()
    })

    (transfer >> compact >> expire).run(spark, Config(runtime = Map("retain_last" -> "1")))
    table.read(spark).count() shouldBe 2
    table.currentSnapshot.get.operation shouldBe "compact"
    table.allSnapshots.size shouldBe 1 // expiry with retain_last=1 kept only current
  }
}
