package graft

import java.util.concurrent.TimeUnit
import graft.table.Icebox

/** TRUE cross-process concurrency: the optimistic-commit protocol's
  * cross-process claims (CREATE_NEW id claims, lock-file CAS publication)
  * have so far been exercised by multiple HANDLES in one JVM — which shares
  * nothing through `this.synchronized` across handles, but does share the
  * JVM. This spec launches separate `java` processes (each with its own
  * SparkSession) appending to one table concurrently: the only
  * coordination is the on-disk protocol itself.
  */
class CrossProcessSpec extends SparkSpec {
  import spark.implicits._

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("optimistic commits from SEPARATE JVM processes lose nothing") {
    val dir = tmpDir("xproc")
    Icebox(dir).append(Seq(("seed", 0)).toDF("k", "v").coalesce(1))
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path") // real: Test/fork := true
    val procs = (1 to 3).map { i =>
      new ProcessBuilder(
        (Seq(javaBin, "-Xmx1500m", "-cp", cp) ++ addOpens ++
          Seq("graft.tools.ConcurrentAppender", dir, "4", s"p$i")): _*)
        .redirectErrorStream(true)
        .redirectOutput(java.io.File.createTempFile(s"xproc$i", ".log"))
        .start()
    }
    procs.zipWithIndex.foreach { case (p, i) =>
      assert(p.waitFor(240, TimeUnit.SECONDS), s"process $i timed out")
      assert(p.exitValue() == 0, s"process $i exited ${p.exitValue()}")
    }
    // 1 seed + 3 processes x 4 appends, every commit on the chain
    val t = Icebox(dir)
    t.read(spark).count() shouldBe 13L
    t.allSnapshots.size shouldBe 13
    t.read(spark).select("k").distinct().count() shouldBe 13L
  }
}
