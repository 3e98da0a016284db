package graft

import graft.operators.Wap
import graft.table.Icebox
import org.apache.spark.sql.functions._

class WapSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String): Icebox = {
    val t = Icebox(tmpDir(prefix))
    t.append((1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "s"))
    t
  }

  test("passing audit publishes atomically; main serves old state until then") {
    val t = fresh("wap-pass")
    val before = t.currentSnapshotId
    val r = Wap.writeAuditPublish(spark, t,
      Seq((11L, "w11"), (12L, "w12")).toDF("id", "s"),
      Wap.audits.noNulls(Seq("id", "s")))
    r.published shouldBe true
    t.read(spark).count() shouldBe 12L
    t.refs.contains("wap-stage") shouldBe false       // branch cleaned up
    t.snapshot(r.mainSnapshotId).parentId should be >= before
  }

  test("failing audit leaves main bit-identical and drops the branch") {
    val t = fresh("wap-fail")
    val before = t.currentSnapshotId
    val r = Wap.writeAuditPublish(spark, t,
      Seq((13L, null.asInstanceOf[String])).toDF("id", "s"),
      Wap.audits.noNulls(Seq("s")))
    r.published shouldBe false
    r.auditError.get should include ("nulls in s")
    t.currentSnapshotId shouldBe before
    t.read(spark).count() shouldBe 10L
    t.refs.contains("wap-stage") shouldBe false
  }

  test("audit runs against committed branch state, not the input frame") {
    val t = fresh("wap-committed")
    // duplicate against EXISTING table rows: only visible when the audit
    // sees staged-branch state = old data + new batch
    val r = Wap.writeAuditPublish(spark, t,
      Seq((5L, "dup-of-existing")).toDF("id", "s"),
      Wap.audits.uniqueKey(Seq("id")))
    r.published shouldBe false
    t.read(spark).count() shouldBe 10L
  }

  test("composed audits report the first failure; expect() evaluates SQL") {
    val t = fresh("wap-composed")
    val r = Wap.writeAuditPublish(spark, t,
      Seq((21L, "ok"), (-1L, "neg")).toDF("id", "s"),
      Wap.audits.all(
        Wap.audits.noNulls(Seq("id")),
        Wap.audits.expect("id > 0"),
        Wap.audits.uniqueKey(Seq("id"))))
    r.published shouldBe false
    r.auditError.get should include ("id > 0")
  }

  test("concurrent main commit after staging fails publish, branch data never lands") {
    // a writer advances main while the audit is running: publish must fail
    // rather than clobber the concurrent commit
    val t2 = fresh("wap-race2")
    val r = intercept[IllegalArgumentException] {
      Wap.writeAuditPublish(spark, t2,
        Seq((50L, "staged")).toDF("id", "s"),
        df => { t2.append(Seq((60L, "concurrent")).toDF("id", "s")); None })
    }
    r.getMessage should include ("fast-forward")
    // the concurrent commit survives; the staged batch never reached main
    t2.read(spark).select("id").as[Long].collect().sorted should contain (60L)
    t2.read(spark).select("id").as[Long].collect() should not contain (50L)
    t2.refs.contains("wap-stage") shouldBe false
  }
}
