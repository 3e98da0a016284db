package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert
import graft.sql.{DmlSql, MergeSql}
import graft.table.Icebox

/** Model-based randomized check of the merge-on-read stack: a seeded random
  * interleaving of appends, MoR upserts, equality key-deletes, predicate
  * DML deletes, and compactions must agree with a trivial in-memory map
  * after EVERY step — across delete kinds, the depth-bound hybrid rewrite,
  * and materializing compactions.
  */
class MorModelSpec extends SparkSpec {
  import spark.implicits._

  for (rndSeed <- Seq(42, 1337))
  test(s"randomized append/upsert/delete/DML/compact agrees with an in-memory model (seed $rndSeed)") {
    val rnd = new scala.util.Random(rndSeed)
    val t = Icebox(tmpDir(s"mor-model-$rndSeed"))
    t.setProperties(Map(
      "write.upsert.mode" -> "merge-on-read",
      "write.delete.mode" -> "merge-on-read",
      "write.merge-on-read.max-delete-files" -> "3")) // exercise the hybrid often
    MergeSql.register("mor_model_t", t)
    var model = Map.empty[Long, String]
    var nextId = 0L
    def freshRows(n: Int): Seq[(Long, String)] =
      (1 to n).map { _ => nextId += 1; (nextId, s"v$nextId-${rnd.nextInt(100)}") }

    val seed = freshRows(50)
    t.append(seed.toDF("id", "s"))
    model ++= seed

    for (step <- 1 to 24) {
      rnd.nextInt(6) match {
        case 0 =>
          val rows = freshRows(rnd.nextInt(8) + 1)
          t.append(rows.toDF("id", "s"))
          model ++= rows
        case 1 => // MoR upsert: updates to existing keys + inserts
          val updates = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(5))
            .map(k => (k, s"upd$step-$k"))
          val batch = updates ++ freshRows(rnd.nextInt(3))
          if (batch.nonEmpty) {
            Upsert.intoTable(t, batch.toDF("id", "s"), Seq("id"))
            model ++= batch
          }
        case 2 => // equality delete by key stream
          val dels = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(5))
          if (dels.nonEmpty) {
            t.deleteByKeys(dels.toDF("id"))
            model --= dels
          }
        case 3 => // predicate DML delete (position deletes, MoR mode)
          val m = step % 17
          DmlSql.delete(spark, s"DELETE FROM mor_model_t WHERE id % 17 = $m")
          model = model.filter { case (k, _) => k % 17 != m }
        case 4 => t.compact(spark) // materializes both delete kinds
        case 5 => // delete-then-reinsert the same key within one step
          rnd.shuffle(model.keys.toSeq).headOption.foreach { k =>
            t.deleteByKeys(Seq(k).toDF("id"))
            t.append(Seq((k, s"reborn$step")).toDF("id", "s"))
            model += (k -> s"reborn$step")
          }
      }
      val got = t.read(spark).as[(Long, String)].collect().toMap
      withClue(s"divergence after step $step: ") { got shouldBe model }
    }
    // end-state invariants: indexed read agrees too, history survives
    t.readIndexed(spark).as[(Long, String)].collect().toMap shouldBe model
    t.allSnapshots.size should be > 20
  }
}
