package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

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

  test("decodeImage genuinely parses PNG bytes: dimensions, bands, exact pixel mean") {
    val m = Multimodal.decodeImage(Multimodal.syntheticPng(20, 12, 77)).get
    (m.width, m.height, m.channels) shouldBe ((20, 12, 3))
    m.meanIntensity shouldBe 77.0 // every sample is 77 — mean is exact
    // non-uniform image: top half 10, bottom half 30 → mean 20
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(10, 10, 10)); g.fillRect(0, 0, 4, 2)
    g.setColor(new java.awt.Color(30, 30, 30)); g.fillRect(0, 2, 4, 2)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    Multimodal.decodeImage(out.toByteArray).get.meanIntensity shouldBe 20.0
    // undecodable inputs
    Multimodal.decodeImage("definitely not an image".getBytes("UTF-8")) shouldBe None
    Multimodal.decodeImage(Array.emptyByteArray) shouldBe None
    Multimodal.decodeImage(null) shouldBe None
  }

  test("decodeImageMeta decodes per row; undecodable blobs null out") {
    val df = Seq(
      (1L, Multimodal.syntheticPng(10, 8, 200)),
      (2L, "nope".getBytes("UTF-8"))).toDF("doc_id", "media_bytes")
    val r = Multimodal.decodeImageMeta(df).orderBy("doc_id").collect()
    (r(0).getInt(1), r(0).getInt(2), r(0).getInt(3), r(0).getDouble(4)) shouldBe
      ((10, 8, 3, 200.0))
    (1 to 4).foreach(i => r(1).isNullAt(i) shouldBe true)
  }

  test("decodeFeatures switches to pixel-derived features for real images") {
    val df = Seq((1L, Multimodal.syntheticPng(16, 16, 128))).toDF("doc_id", "media_bytes")
    val f = Multimodal.decodeFeatures(df).select("features").as[Array[Float]].head()
    f.length shouldBe 8
    f(0) shouldBe 16 / 4096f           // width
    f(3) shouldBe (128 / 255.0).toFloat // mean intensity, normalized
    f(7) shouldBe 1f                   // is-image flag
  }

  test("decodeAudio genuinely decodes WAV PCM: rate, channels, frames, exact RMS") {
    val m = Multimodal.decodeAudio(
      Multimodal.syntheticWav(sampleRateHz = 16000, channels = 2, frames = 1600, v = 9000)).get
    (m.sampleRateHz, m.channels, m.frames, m.durationMs) shouldBe ((16000, 2, 1600L, 100L))
    m.rmsAmplitude shouldBe 9000.0 / 32768 // ±v square wave: RMS exactly v/32768
    // silence decodes to RMS 0
    Multimodal.decodeAudio(
      Multimodal.syntheticWav(8000, 1, 80, 0)).get.rmsAmplitude shouldBe 0.0
    // undecodable inputs
    Multimodal.decodeAudio("definitely not audio".getBytes("UTF-8")) shouldBe None
    Multimodal.decodeAudio(Array.emptyByteArray) shouldBe None
    Multimodal.decodeAudio(null) shouldBe None
  }

  test("decodeAudioMeta decodes per row; undecodable blobs null out") {
    val df = Seq(
      (1L, Multimodal.syntheticWav(8000, 1, 800, 3000)),
      (2L, "nope".getBytes("UTF-8"))).toDF("doc_id", "media_bytes")
    val r = Multimodal.decodeAudioMeta(df).orderBy("doc_id").collect()
    (r(0).getInt(1), r(0).getInt(2), r(0).getLong(3), r(0).getLong(4),
      r(0).getDouble(5)) shouldBe ((8000, 1, 800L, 100L, 3000.0 / 32768))
    (1 to 5).foreach(i => r(1).isNullAt(i) shouldBe true)
  }

  test("decodeFeatures switches to PCM-derived features for real audio") {
    val df = Seq((1L, Multimodal.syntheticWav(24000, 2, 2400, 16384)))
      .toDF("doc_id", "media_bytes")
    val f = Multimodal.decodeFeatures(df).select("features").as[Array[Float]].head()
    f.length shouldBe 8
    f(0) shouldBe 24000 / 48000f       // sample rate
    f(1) shouldBe 2 / 8f               // channels
    f(4) shouldBe 0.5f                 // RMS: 16384/32768
    f(6) shouldBe 1f                   // is-audio flag
    f(7) shouldBe 0f                   // not an image
  }

  test("decodeVideo genuinely parses AVI: per-frame pixel means, fps, duration") {
    // 3 PNG frames at distinct grays — the mean over frames (100+101+102)/3
    // = 101 is only reachable by decoding every frame, not replicating one
    val frames = (0 until 3).map(f => Multimodal.syntheticPng(12, 10, 100 + f))
    val avi = Multimodal.syntheticAvi(12, 10, 15, frames)
    val m = Multimodal.decodeVideo(avi).get
    m.width shouldBe 12
    m.height shouldBe 10
    m.frames shouldBe 3
    m.fps shouldBe 15.0
    m.durationMs shouldBe 200L        // 3 frames / 15 fps
    m.meanIntensity shouldBe 101.0
    Multimodal.decodeVideo("RIFF but not an avi".getBytes("UTF-8")) shouldBe None
    Multimodal.decodeVideo(Multimodal.syntheticWav(8000, 1, 80, 100)) shouldBe None
  }

  test("decodeVideo handles real MJPG (lossy) frames within tolerance") {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(128, 128, 128)); g.fillRect(0, 0, 16, 16); g.dispose()
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jout)
    val avi = Multimodal.syntheticAvi(16, 16, 10, Seq(jout.toByteArray, jout.toByteArray))
    val m = Multimodal.decodeVideo(avi).get
    m.width shouldBe 16
    m.frames shouldBe 2
    math.abs(m.meanIntensity - 128.0) should be < 3.0 // JPEG DC quantization
  }

  test("decodeVideoMeta decodes per row; undecodable blobs null out") {
    val ok = Multimodal.syntheticAvi(8, 8, 10,
      (0 until 2).map(f => Multimodal.syntheticPng(8, 8, 50 + 10 * f)))
    val df = Seq((1L, ok), (2L, "nope".getBytes("UTF-8"))).toDF("doc_id", "media_bytes")
    val r = Multimodal.decodeVideoMeta(df).orderBy("doc_id").collect()
    r(0).getInt(1) shouldBe 8
    r(0).getInt(3) shouldBe 2
    r(0).getDouble(6) shouldBe 55.0
    r(1).isNullAt(1) shouldBe true
  }

  test("sampleFrameMeans decodes only every stride-th frame") {
    val frames = (0 until 6).map(f => Multimodal.syntheticPng(8, 8, 10 * f))
    val avi = Multimodal.syntheticAvi(8, 8, 10, frames)
    Multimodal.sampleFrameMeans(avi, 1).map(_._1) shouldBe Seq(0, 1, 2, 3, 4, 5)
    val every3 = Multimodal.sampleFrameMeans(avi, 3)
    every3 shouldBe Seq((0, 0.0), (3, 30.0))
  }

  test("decodeFeatures switches to frame-derived features for real video") {
    val avi = Multimodal.syntheticAvi(16, 8, 30,
      (0 until 2).map(_ => Multimodal.syntheticPng(16, 8, 204)))
    val f = Multimodal.decodeFeatures(Seq((1L, avi)).toDF("doc_id", "media_bytes"))
      .select("features").as[Array[Float]].head()
    f(0) shouldBe 16 / 4096f
    f(3) shouldBe 0.25f               // 30 fps / 120
    f(4) shouldBe 0.8f                // 204 / 255
    (f(6), f(7)) shouldBe ((1f, 1f))  // video flags
  }

  // ------------------------------------------------- perceptual hashes

  /** Smooth grayscale test image: pixel = f(x/(w-1), y/(h-1)) — the SAME
    * continuous content at any raster size, so downsample-based hashes of
    * different renditions must agree.
    */
  private def smoothPng(w: Int, h: Int, f: (Double, Double) => Double): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x.toDouble / (w - 1), y.toDouble / (h - 1))
      img.getRaster.setSample(x, y, 0, math.max(0, math.min(255, v.round.toInt)))
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash: planted bit patterns round-trip exactly; perturbations move exactly those bits") {
    val bits = 0xDEADBEEFCAFEF00DL
    Multimodal.dHash(Multimodal.syntheticDHashPng(bits)) shouldBe Some(bits)
    // flipping one planted comparison flips exactly that hash bit
    val perturbed = bits ^ (1L << 17)
    hamming(bits, Multimodal.dHash(Multimodal.syntheticDHashPng(perturbed)).get) shouldBe 1
    // a consecutive-pair flip (the q_image_neardup construction) is Hamming 2
    hamming(bits, Multimodal.dHash(Multimodal.syntheticDHashPng(bits ^ (3L << 40))).get) shouldBe 2
    // undecodable bytes refuse, not crash
    Multimodal.dHash("not an image".getBytes) shouldBe None
    Multimodal.dHash(Array.emptyByteArray) shouldBe None
  }

  test("pHash survives resize and re-encode; distinct content stays far") {
    // photo-like content (smooth blobs + gradient): a broad decaying
    // spectrum, the regime perceptual hashing is built for — sparse-
    // spectrum synthetics leave most AC coefficients at ~0 where median-
    // relative signs are pure noise
    val photo = (u: Double, v: Double) =>
      128 + 90 * math.exp(-8 * ((u - 0.3) * (u - 0.3) + (v - 0.4) * (v - 0.4))) -
        70 * math.exp(-12 * ((u - 0.7) * (u - 0.7) + (v - 0.6) * (v - 0.6))) +
        30 * u - 20 * v
    val small = Multimodal.pHash(smoothPng(64, 64, photo)).get
    val big = Multimodal.pHash(smoothPng(160, 160, photo)).get // resized duplicate
    hamming(small, big) should be <= 8 // measured 4
    val wide = Multimodal.pHash(smoothPng(96, 48, photo)).get // aspect change
    hamming(small, wide) should be <= 8 // measured 2
    // lossless re-encode of identical pixels: identical hash
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(smoothPng(64, 64, photo)))
    val bmp = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmp)
    Multimodal.pHash(bmp.toByteArray) shouldBe Some(small)
    // structurally different content is far in both hashes
    val other = (u: Double, v: Double) =>
      128 - 80 * math.exp(-10 * ((u - 0.8) * (u - 0.8) + (v - 0.2) * (v - 0.2))) +
        85 * math.exp(-6 * ((u - 0.2) * (u - 0.2) + (v - 0.8) * (v - 0.8))) -
        25 * u + 35 * v
    hamming(small, Multimodal.pHash(smoothPng(64, 64, other)).get) should be > 16 // 30
    val d1 = Multimodal.dHash(smoothPng(64, 64, photo)).get
    val d2 = Multimodal.dHash(smoothPng(160, 160, photo)).get // dHash resize-stable too
    hamming(d1, d2) should be <= 6 // measured 1
    hamming(d1, Multimodal.dHash(smoothPng(64, 64, other)).get) should be > 12 // 20
  }

  test("audioDHash: planted envelopes round-trip exactly; scale/resample invariant") {
    val bits = 0x0123456789ABCDEFL
    val wav = Multimodal.syntheticAudioDHashWav(bits, framesPerWindow = 16)
    Multimodal.audioDHash(wav) shouldBe Some(bits)
    // more frames per window = a longer clip of the SAME loudness contour
    // (the resample analog: windows are clip fractions, not sample counts)
    Multimodal.audioDHash(
      Multimodal.syntheticAudioDHashWav(bits, framesPerWindow = 48)) shouldBe Some(bits)
    // a perturbed envelope moves exactly its bits
    hamming(bits, Multimodal.audioDHash(
      Multimodal.syntheticAudioDHashWav(bits ^ (3L << 20), 16)).get) shouldBe 2
    // amplitude scaling preserves every strict energy comparison: decode
    // the synth WAV's PCM, halve every sample, re-wrap as WAV
    val half = {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val data = src.readAllBytes()
      var i = 0
      while (i < data.length / 2) {
        val s = ((((data(2 * i + 1) & 0xFF) << 8) | (data(2 * i) & 0xFF)).toShort / 2).toShort
        data(2 * i) = (s & 0xFF).toByte
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      val ais2 = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), src.getFormat, data.length / 2L)
      val o = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais2,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, o)
      o.toByteArray
    }
    Multimodal.audioDHash(half) shouldBe Some(bits)
    // too-short clips and non-audio refuse, not crash
    Multimodal.audioDHash(Multimodal.syntheticWav(8000, 1, 30, 100)) shouldBe None
    Multimodal.audioDHash("not audio".getBytes) shouldBe None
    // the provider fallback path hashes AIFF-decodable audio too: write
    // the same PCM as AIFF and expect the identical envelope hash
    val pcmWav = Multimodal.syntheticAudioDHashWav(bits, 16)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(pcmWav))
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    Multimodal.audioDHash(out.toByteArray) shouldBe Some(bits)
  }

  test("videoDHash: frame-majority vote survives a corrupt/dissenting minority frame") {
    val bits = 0xFEDCBA9876543210L
    val frame = Multimodal.syntheticDHashPng(bits)
    Multimodal.videoDHash(
      Multimodal.syntheticAvi(9, 8, 10, Seq(frame, frame, frame))) shouldBe Some(bits)
    // a single dissenting frame (one planted bit-pair flipped) is outvoted
    val odd = Multimodal.syntheticDHashPng(bits ^ (3L << 10))
    Multimodal.videoDHash(
      Multimodal.syntheticAvi(9, 8, 10, Seq(frame, odd, frame))) shouldBe Some(bits)
    // an undecodable frame is skipped, not fatal
    Multimodal.videoDHash(Multimodal.syntheticAvi(9, 8, 10,
      Seq(frame, "junk frame".getBytes, frame))) shouldBe Some(bits)
    // stride samples every n-th frame
    Multimodal.videoDHash(
      Multimodal.syntheticAvi(9, 8, 10, Seq(frame, odd, frame, odd)),
      stride = 2) shouldBe Some(bits)
    // non-video and frameless containers refuse
    Multimodal.videoDHash("not a video".getBytes) shouldBe None
    Multimodal.videoDHash(Multimodal.syntheticAvi(9, 8, 10, Nil)) shouldBe None
  }

  test("imageNearDupInsert: batch collapses, index probe drops re-offers, fresh groups append") {
    def png(g: Long, m: Int): Array[Byte] = {
      var bits = 0L
      for (i <- 0 until 64) if (((g >> (i % 2)) & 1L) == 1L) bits |= 1L << i
      if (m > 0) bits ^= 3L << (2 * m)
      Multimodal.syntheticDHashPng(bits)
    }
    val corpus = graft.table.Icebox(tmpDir("img-ins-c"))
    val index = graft.table.Icebox(tmpDir("img-ins-i"))
    // wave 1: groups 0,1,2 with two members each -> 3 survivors
    val w1 = (0L until 6L).map(id => (id, png(id % 3, (id / 3).toInt)))
      .toDF("doc_id", "media_bytes")
    Dedup.imageNearDupInsert(corpus, index, w1, "media_bytes", "doc_id") shouldBe 3L
    // wave 2: four MORE members of the indexed groups (dropped via the
    // pruned index probe — the hash rides in the index, no corpus fetch)
    // plus two docs of a brand-new group that collapse to one fresh doc
    val w2 = ((6L until 10L).map(id => (id, png(id % 3, (id / 3).toInt))) ++
      Seq((200L, png(3L, 9)), (201L, png(3L, 10))))
      .toDF("doc_id", "media_bytes")
    Dedup.imageNearDupInsert(corpus, index, w2, "media_bytes", "doc_id") shouldBe 1L
    corpus.read(spark).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      Seq(0L, 1L, 2L, 200L)
    // the index holds bands for exactly the surviving docs
    index.read(spark).select("doc_id").distinct().count() shouldBe 4L
  }

  test("imageNearDup labels planted groups through decode->hash->band->verify->components") {
    // 3 groups x 4 members: consecutive-pair perturbations per member
    val docs = (0L until 12L).map { id =>
      val g = id % 3
      var bits = 0L
      for (i <- 0 until 64) if (((g >> (i % 2)) & 1L) == 1L) bits |= 1L << i
      val m = (id / 3).toInt
      if (m > 0) bits ^= 3L << (2 * m)
      (id, Multimodal.syntheticDHashPng(bits))
    }.toDF("doc_id", "media_bytes")
    val out = Dedup.imageNearDup(docs, "media_bytes", "doc_id",
      maxHamming = 8, bands = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    for (id <- 0L until 12L) out(id) shouldBe ((id % 3, id >= 3))
  }

  test("lock-free synthetic encoders produce containers the STANDARD decoders parse") {
    // synthesis no longer goes through ImageIO.write / AudioSystem.write
    // (synchronized provider registries serialize parallel kernels); the
    // hand-rolled containers must still parse under the real decoders
    val png = Multimodal.syntheticDHashPng(0x0123456789ABCDEFL)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    img.getWidth shouldBe 9
    img.getHeight shouldBe 8
    img.getRaster.getNumBands shouldBe 1
    img.getRaster.getSample(0, 0, 0) shouldBe 128 // the planted walk's anchor
    val rgb = Multimodal.syntheticPng(5, 4, 77)
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rgb))
    img2.getRaster.getNumBands shouldBe 3
    img2.getRaster.getSample(2, 1, 0) shouldBe 77
    val wav = Multimodal.syntheticWav(8000, 2, 100, 1234)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    ais.getFormat.getChannels shouldBe 2
    ais.getFormat.getSampleRate shouldBe 8000f
    ais.getFrameLength shouldBe 100L
  }

  test("imageNearDupCandidates emits each pair exactly once (first-band attribution)") {
    // group members share most of their 8 band slices — the first-colliding-
    // band rule must yield unique rows without a distinct() shuffle
    val docs = (0L until 12L).map { id =>
      val g = id % 3
      var bits = 0L
      for (i <- 0 until 64) if (((g >> (i % 2)) & 1L) == 1L) bits |= 1L << i
      val m = (id / 3).toInt
      if (m > 0) bits ^= 3L << (2 * m)
      (id, Multimodal.syntheticDHashPng(bits))
    }.toDF("doc_id", "media_bytes")
    val pairs = Dedup.imageNearDupCandidates(docs, "media_bytes", "doc_id",
      maxHamming = 8, bands = 8)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.length shouldBe pairs.toSet.size
    // every same-group pair within Hamming 8 must still be found
    pairs.toSet should contain((0L, 3L))
  }
}
