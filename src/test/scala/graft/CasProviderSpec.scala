package graft

import java.util.concurrent.{Callable, CountDownLatch, Executors, TimeUnit}
import org.apache.hadoop.fs.{Path => HPath}
import graft.table.{CasProvider, FileCasProvider, Icebox, TableStore}

/** The TOCTOU closure: on [[WeakFs]] (deliberately non-atomic
  * `create(overwrite=false)`, the object-store model) the spec first
  * DEMONSTRATES the lost-race hazard, then proves a registered
  * [[FileCasProvider]] restores exactly-one-winner semantics — through the
  * raw primitives, the crash-recovery grace, and a full concurrent Icebox
  * commit workload.
  */
class CasProviderSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.hadoopConfiguration.set("fs.weakfs.impl", classOf[WeakFs].getName)
  }

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def weakStore(prefix: String): TableStore = {
    val s = new TableStore(new HPath("weakfs://" + tmpDir(prefix)), hconf)
    s.mkdirs(s.root)
    s
  }

  /** Run `body(i)` on `n` threads released simultaneously. */
  private def race(n: Int)(body: Int => Boolean): Seq[Boolean] = {
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    try {
      val fs = (0 until n).map { i =>
        pool.submit(new Callable[Boolean] {
          def call(): Boolean = { latch.await(); body(i) }
        })
      }
      latch.countDown()
      fs.map(_.get(60, TimeUnit.SECONDS))
    } finally pool.shutdown()
  }

  test("weakfs createNew is genuinely non-atomic: strict mode refuses; opt-in shows double wins") {
    val store = weakStore("cas-hazard")
    val p = store.child("_claim")
    // STRICT DEFAULT: a CAS claim on the unsafe scheme throws rather than
    // silently risking a double-win
    val e = intercept[IllegalStateException](store.createNew(p, "w".getBytes("UTF-8")))
    e.getMessage should include("check-then-create")
    // explicit opt-in: the claim runs, and the documented hazard is real —
    // more than one racer "wins"
    hconf.setBoolean(graft.table.TableStore.UnsafeCasAllowKey, true)
    try {
      val wins = race(6)(i => store.createNew(p, s"w$i".getBytes("UTF-8")))
      wins.count(identity) should be > 1
    } finally hconf.unset(graft.table.TableStore.UnsafeCasAllowKey)
  }

  test("FileCasProvider restores exactly-one-winner semantics, including re-claim after delete") {
    CasProvider.register("weakfs", new FileCasProvider(tmpDir("cas-locks"), hconf))
    try {
      val store = weakStore("cas-fixed")
      val p = store.child("_claim")
      race(6)(i => store.createNew(p, s"w$i".getBytes("UTF-8")))
        .count(identity) shouldBe 1
      store.exists(p) shouldBe true
      // the winner's bytes arrived intact (no torn write from a second winner)
      new String(store.readBytes(p), "UTF-8") should fullyMatch regex "w[0-5]"
      // release cycle: delete makes the path claimable again — exactly once
      store.deleteIfExists(p)
      race(6)(i => store.createNew(p, s"x$i".getBytes("UTF-8")))
        .count(identity) shouldBe 1
    } finally CasProvider.unregister("weakfs")
  }

  test("an abandoned claim (winner died before writing) is contested after the grace window") {
    val provider = new FileCasProvider(tmpDir("cas-locks2"), hconf)
    CasProvider.register("weakfs", provider)
    val oldGrace = CasProvider.abandonedClaimGraceMs
    try {
      val store = weakStore("cas-crash")
      val p = store.child("_claim")
      // simulate the crash: the claim exists, the file was never written
      provider.claim(store.render(p), Array.emptyByteArray) shouldBe true
      store.createNew(p, "b".getBytes) shouldBe false // within grace: respected
      CasProvider.abandonedClaimGraceMs = 50L
      Thread.sleep(120)
      store.createNew(p, "b".getBytes) shouldBe true // abandoned: re-claimed
      store.exists(p) shouldBe true
    } finally {
      CasProvider.abandonedClaimGraceMs = oldGrace
      CasProvider.unregister("weakfs")
    }
  }

  test("renameNoReplace under a provider keeps claim state mirrored (lock-break protocol)") {
    CasProvider.register("weakfs", new FileCasProvider(tmpDir("cas-locks3"), hconf))
    try {
      val store = weakStore("cas-rename")
      val (a, b) = (store.child("_lock"), store.child("_lock.grave"))
      store.createNew(a, "t".getBytes) shouldBe true
      store.renameNoReplace(a, b) shouldBe true
      store.exists(a) shouldBe false
      store.exists(b) shouldBe true
      // a's claim was released by the rename: claimable again
      store.createNew(a, "t2".getBytes) shouldBe true
      // b is claimed: a second rename onto it must lose
      store.renameNoReplace(a, b) shouldBe false
      store.exists(a) shouldBe true // loser's source untouched
    } finally CasProvider.unregister("weakfs")
  }

  test("concurrent Icebox appends on weakfs:// with a provider lose no commits") {
    CasProvider.register("weakfs", new FileCasProvider(tmpDir("cas-locks4"), hconf))
    try {
      val dir = "weakfs://" + tmpDir("cas-icebox")
      Icebox(dir).append(Seq((0L, "seed")).toDF("id", "v"))
      val pool = Executors.newFixedThreadPool(4)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = (1 to 4).map { i =>
        val h = Icebox(dir)
        Future { (0 until 2).foreach(j => h.append(Seq((i * 10L + j, s"h$i-$j")).toDF("id", "v"))) }
      }
      Await.result(Future.sequence(futures), 180.seconds)
      pool.shutdown()
      Icebox(dir).read(spark).count() shouldBe 9L // 1 seed + 8 concurrent appends
    } finally CasProvider.unregister("weakfs")
  }
}
