package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.normalize.Normalize
import graft.operators.Upsert
import graft.table.Icebox
import graft.types.TypeConverter

/** SURVEY §5 property tests: ScalaCheck generators (seeded → reproducible)
  * checked through the real Spark operators. (The scalatest↔scalacheck
  * bridge artifact isn't available offline, so generators are sampled
  * directly.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rowGen = Gen.listOfN(12, for {
    id <- Gen.chooseNum(1L, 8L)   // deliberately small key space → collisions
    v <- Gen.alphaStr.map(_.take(6))
    ver <- Gen.chooseNum(1L, 5L)
  } yield (id, v, ver))

  test("property: upsert is idempotent for any target/incoming batches") {
    for ((t, i) <- samples(rowGen, 8).zip(samples(rowGen, 8).reverse)) {
      val target = t.toDF("id", "v", "ver").dropDuplicates("id")
      val incoming = i.toDF("id", "v", "ver")
      val once = Upsert(target, incoming, Seq("id"), orderCol = Some("ver"))
      val twice = Upsert(once, incoming, Seq("id"), orderCol = Some("ver"))
      canon(twice) shouldBe canon(once)
    }
  }

  test("property: upsert result keys = target keys ∪ incoming keys, no dup keys") {
    for ((t, i) <- samples(rowGen, 8).zip(samples(rowGen, 8).reverse)) {
      val target = t.toDF("id", "v", "ver").dropDuplicates("id")
      val incoming = i.toDF("id", "v", "ver")
      val out = Upsert(target, incoming, Seq("id"), orderCol = Some("ver"))
      val keys = out.select("id").as[Long].collect().toSeq
      keys.distinct.size shouldBe keys.size
      keys.toSet shouldBe (t.map(_._1).toSet ++ i.map(_._1).toSet)
    }
  }

  test("property: normalize is idempotent") {
    for (rows <- samples(rowGen, 8) if rows.nonEmpty) {
      val df = rows.toDF("ID", "Val", "VER")
        .withColumn("D", when($"VER" > 2, lit(Double.NaN)).otherwise($"VER".cast("double")))
      val once = Normalize.prepare(df)
      val twice = Normalize.prepare(once)
      once.columns.toSeq shouldBe once.columns.map(_.toLowerCase).toSeq
      canon(twice) shouldBe canon(once)
      // NaN is actually gone
      once.filter(isnan($"d")).count() shouldBe 0L
    }
  }

  test("property: compaction preserves the row multiset") {
    for (nCommits <- Seq(1, 2, 4)) {
      val table = Icebox(tmpDir("prop-compact"))
      (1 to nCommits).foreach(i =>
        table.append(Seq((i.toLong, s"v$i"), (i * 10L, s"w$i")).toDF("id", "v")))
      val before = canon(table.read(spark))
      table.compact(spark)
      canon(table.read(spark)) shouldBe before
    }
  }

  test("property: TypeConverter is total over arbitrary type strings") {
    for (s <- samples(Gen.alphaNumStr.map(_.take(20)), 50) if s.nonEmpty) {
      noException should be thrownBy TypeConverter.oracleToSpark(s)
    }
  }

  test("property: chunks reassemble losslessly — dropping each chunk's overlap prefix " +
      "and concatenating reproduces the token stream") {
    import graft.functions.TextFunctions
    val docGen = for {
      n <- Gen.chooseNum(0, 60)
      ws <- Gen.listOfN(n, Gen.alphaLowerStr.map(w => if (w.isEmpty) "w" else w.take(5)))
    } yield ws.mkString(" ")
    val sizeOv = for { s <- Gen.chooseNum(2, 12); o <- Gen.chooseNum(0, s - 1) } yield (s, o)
    for ((doc, (size, overlap)) <- samples(docGen, 12).zip(samples(sizeOv, 12))) {
      val rows = Seq(doc).toDF("t")
        .select(explode(TextFunctions.chunks($"t", size, overlap)).as("c"))
        .select($"c.chunk_id", $"c.chunk").collect()
        .sortBy(_.getInt(0)).map(_.getString(1)).toSeq
      val reassembled = rows.zipWithIndex.flatMap { case (chunk, i) =>
        val toks = chunk.split(" ").filter(_.nonEmpty).toSeq
        if (i == 0) toks else toks.drop(overlap)
      }
      val expected = doc.split("\\s+").filter(_.nonEmpty).toSeq
      reassembled shouldBe expected
      // every chunk except possibly the last has exactly `size` tokens
      rows.dropRight(1).foreach(c => c.split(" ").count(_.nonEmpty) shouldBe size)
    }
  }

  test("property: manifest stats round-trip — null counts, min/max, rows exact under random nulls") {
    // random nullable columns → append → REOPEN with a fresh handle (full
    // manifest JSON re-parse) → the recorded footer stats must equal what
    // a scan computes, for every generated table
    val tblGen = for {
      n <- Gen.chooseNum(5, 60)
      rows <- Gen.listOfN(n, for {
        a <- Gen.option(Gen.chooseNum(-1000L, 1000L))
        b <- Gen.option(Gen.chooseNum(-50.0, 50.0))
        s <- Gen.alphaLowerStr.map(_.take(4))
      } yield (a, b, s))
    } yield rows
    for ((rows, i) <- samples(tblGen, 12).zipWithIndex) {
      val dir = tmpDir(s"prop-mf$i")
      Icebox(dir).append(
        rows.toDF("a", "b", "s").repartition(3), collectStats = Seq("a", "b"))
      val t2 = Icebox(dir) // fresh handle: manifest parsed from bytes
      val fs = t2.currentSnapshot.get.files
      fs.map(_.rows).sum shouldBe rows.size.toLong
      // exact null counts: per-file entries fold to the scan's truth
      val nullsA = rows.count(_._1.isEmpty).toLong
      val nullsB = rows.count(_._2.isEmpty).toLong
      fs.map(_.nullCounts.getOrElse("a", -1L)).forall(_ >= 0L) shouldBe true
      fs.map(_.nullCounts("a")).sum shouldBe nullsA
      fs.map(_.nullCounts("b")).sum shouldBe nullsB
      // min/max (refused iff a column is all-null somewhere → conservative)
      val presentA = rows.flatMap(_._1)
      if (presentA.nonEmpty) t2.columnMinMaxMeta("a").foreach { case (lo, hi) =>
        lo shouldBe presentA.min.toDouble
        hi shouldBe presentA.max.toDouble
      }
    }
  }
}
