package graft

import org.apache.spark.sql.functions._
import graft.table.{Catalog, Icebox}

/** Persistent namespace registry: create/list/drop/load by name, fresh
  * sessions resolving the whole warehouse from its URI alone, SQL
  * listing verbs, and cross-handle registration racing through the
  * registry's own atomic commits.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("register, list, and re-load tables by name from a fresh handle") {
    val wh = tmpDir("catalog")
    val cat = Catalog(wh)
    val sales = cat.create(spark, "analytics", "sales")
    sales.append(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "v"))
    val dims = cat.create(spark, "ref", "dims")
    dims.append(Seq(("a", "alpha"), ("b", "beta")).toDF("k", "label"))

    // fresh handle: resolve everything from the warehouse URI alone
    val fresh = Catalog(wh)
    fresh.tables(spark).select("namespace", "name").as[(String, String)].collect().toSeq shouldBe
      Seq(("analytics", "sales"), ("ref", "dims")).sorted
    fresh.namespaces(spark).as[String].collect().toSeq shouldBe Seq("analytics", "ref")
    val joined = fresh.load(spark, "analytics", "sales").read(spark)
      .join(fresh.load(spark, "ref", "dims").read(spark), "k")
    joined.count() shouldBe 2
    joined.agg(sum("v")).as[Double].head() shouldBe 30.0
  }

  test("re-register re-points the name; drop retires it without deleting data") {
    val wh = tmpDir("catalog-drop")
    val cat = Catalog(wh)
    val t1 = cat.create(spark, "ns", "t")
    t1.append(Seq(1L, 2L).toDF("id"))
    // re-point the same name at a different physical table
    val otherDir = tmpDir("catalog-other")
    Icebox(otherDir).append(Seq(10L, 20L, 30L).toDF("id"))
    cat.register(spark, "ns", "t", otherDir)
    cat.tables(spark).count() shouldBe 1
    cat.load(spark, "ns", "t").read(spark).count() shouldBe 3

    cat.drop(spark, "ns", "t")
    cat.exists(spark, "ns", "t") shouldBe false
    cat.tables(spark).count() shouldBe 0
    an[Exception] should be thrownBy cat.load(spark, "ns", "t")
    Icebox(otherDir).read(spark).count() shouldBe 3 // data untouched
  }

  test("registerAll wires every cataloged table into the session SQL surface") {
    val wh = tmpDir("catalog-sql")
    val cat = Catalog(wh)
    cat.create(spark, "a", "x").append(Seq((1L, "p"), (2L, "q")).toDF("id", "s"))
    cat.create(spark, "b", "y").append(Seq((2L, 99.0)).toDF("id", "w"))

    val views = Catalog(wh).registerAll(spark)
    views.sorted shouldBe Seq("a_x", "b_y")
    spark.sql("SELECT s, w FROM a_x JOIN b_y USING (id)")
      .as[(String, Double)].collect().toSeq shouldBe Seq(("q", 99.0))
    // registered views carry the full SQL surface (DESCRIBE HISTORY verb)
    graft.sql.DmlSql.run(spark, "DESCRIBE HISTORY a_x").count() should be >= 1L
  }

  test("SHOW TABLES / SHOW NAMESPACES SQL verbs answer from the registry") {
    val wh = tmpDir("catalog-show")
    val cat = Catalog(wh)
    cat.create(spark, "n1", "t1")
    cat.create(spark, "n2", "t2")
    val listed = graft.sql.DmlSql.run(spark, s"SHOW TABLES IN '$wh'")
    listed.select("namespace", "name").as[(String, String)].collect().toSeq shouldBe
      Seq(("n1", "t1"), ("n2", "t2"))
    graft.sql.DmlSql.run(spark, s"SHOW NAMESPACES IN '$wh'")
      .as[String].collect().toSeq shouldBe Seq("n1", "n2")
    // an empty warehouse lists empty, not an error
    graft.sql.DmlSql.run(spark, s"SHOW TABLES IN '${tmpDir("catalog-empty")}'")
      .count() shouldBe 0
  }

  test("concurrent registrations from separate handles all land") {
    val wh = tmpDir("catalog-race")
    val names = (1 to 8).map(i => f"t$i%02d")
    val threads = names.map { n =>
      new Thread(() => Catalog(wh).create(spark, "ns", n))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    Catalog(wh).tables(spark).filter(col("namespace") === "ns").count() shouldBe 8
  }
}
