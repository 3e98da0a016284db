package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch decode / feature-extract plumbing.
  *
  * The IMAGE decode kernel is REAL ([[decodeImage]] — `javax.imageio`,
  * which ships in every JVM: PNG/JPEG/GIF/BMP bytes are actually parsed to
  * dimensions, channel count, and pixel statistics). Audio/video kernels
  * remain STUBS — no such codecs ship in this environment — replaced by a
  * deterministic fake deriving "features" from the bytes (`decodeStub`).
  * Everything around both is real and tested: the schema contract, the
  * binary column plumbing, partition sizing for large blobs, and the
  * `mapPartitions` batch shape (the Scala analog of `mapInPandas`: one
  * iterator per partition, amortized per-batch setup, bounded memory).
  *
  * Scale notes for 100 TB of media:
  *  - blobs ride in parquet binary columns; `maxRecordsPerFile`/partition
  *    sizing keeps row groups bounded (`repartitionForBlobs`)
  *  - decode is a narrow transformation — no shuffle; metadata-only queries
  *    never touch the bytes (parquet column pruning drops the blob column)
  */
object Multimodal {

  /** Typed metadata carried next to every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),    // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate_hz", IntegerType),
    StructField("duration_ms", LongType)))

  /** Attach a binary payload column (utf-8 bytes of `textCol` — the testdata
    * has no real media, so documents stand in as blobs) plus stub metadata.
    */
  def asMediaTable(df: DataFrame, textCol: String, mediaType: String = "image"): DataFrame =
    df.withColumn("media_bytes", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        (length(col(textCol)) % 1024 + 1).cast("int").as("width"),
        (length(col(textCol)) % 768 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate_hz"),
        (length(col(textCol)).cast("long") * 10L).as("duration_ms")))

  /** Cheap metadata/feature extraction as pure column expressions — no UDF,
    * no decode: byte length, content hash, leading magic bytes.
    */
  def blobStats(df: DataFrame, binCol: String = "media_bytes"): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("content_hash", sha2(col(binCol), 256))
      .withColumn("magic", hex(substring(col(binCol), 1, 4)))

  /** STUB decode kernel for AUDIO/VIDEO (no such codecs in this
    * environment; a real deployment swaps in JNI / javacv / a sidecar
    * service — images use the real [[decodeImage]]). Deterministic fake: 8
    * pseudo-features derived from byte content. The signature — one
    * partition-iterator in, one out, batch-amortized — is the real
    * contract.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    Array.tabulate(8)(j => (((h >>> (j * 8)) & 0xFF).toFloat) / 255.0f)
  }

  /** Decoded image facts — every field computed from the actually-parsed
    * pixel data, not from metadata.
    */
  final case class ImageMeta(width: Int, height: Int, channels: Int, meanIntensity: Double)

  /** REAL image decode (`javax.imageio`): parse `bytes` as PNG/JPEG/GIF/BMP
    * and compute dimensions, raster channel count, and the mean sample
    * value over every pixel of every band. None when the bytes are not a
    * decodable image (callers fall back or null out). Thread-safe;
    * `ImageIO.setUseCache(false)` keeps decode in-memory (no temp files on
    * executors).
    */
  def decodeImage(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val raster = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      Some(ImageMeta(w, h, bands, sum / (w.toLong * h * bands)))
    } catch { case _: Exception => None }
  }

  /** Deterministic synthetic PNG: `width`×`height`, every pixel the uniform
    * gray `(v, v, v)` — the ENCODE side of the round-trip the decode oracle
    * verifies (an external oracle can predict exactly what [[decodeImage]]
    * must return: dimensions, 3 bands, mean intensity v).
    */
  def syntheticPng(width: Int, height: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(v & 0xFF, v & 0xFF, v & 0xFF))
    g.fillRect(0, 0, width, height)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Batched REAL image decode over partitions: (id, binary) in →
    * `(id, width, height, channels, mean_intensity)` out, every output
    * column computed from the decoded raster. Rows whose bytes don't parse
    * as an image yield nulls (width == null marks them). Narrow op — no
    * shuffle; per-partition kernel setup amortized like `decodeFeatures`.
    */
  def decodeImageMeta(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media_bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in: Dataset[Row] = df.select(col(idCol).cast("long"), col(binCol))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        decodeImage(bytes) match {
          case Some(m) => (id, Option(m.width), Option(m.height), Option(m.channels),
            Option(m.meanIntensity))
          case None => (id, None: Option[Int], None: Option[Int], None: Option[Int],
            None: Option[Double])
        }
      }
    }.toDF(idCol, "width", "height", "channels", "mean_intensity")
  }

  /** Batched decode / feature extraction over partitions — the `mapInPandas`
    * analog. Input must contain (`idCol`: long, `binCol`: binary); output is
    * (id, features array<float>). Blobs that parse as a real image get
    * pixel-derived features from [[decodeImage]]; anything else falls back
    * to the deterministic stub (audio/video placeholder). Narrow op: no
    * shuffle, bounded memory (one row at a time off the iterator,
    * per-partition setup done once).
    */
  def decodeFeatures(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media_bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in: Dataset[Row] = df.select(col(idCol).cast("long"), col(binCol))
    in.mapPartitions { rows =>
      // per-partition setup (a real codec would init its context here, once)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        val feats = decodeImage(bytes) match {
          case Some(m) => Array(
            m.width / 4096f, m.height / 4096f, m.channels / 4f,
            (m.meanIntensity / 255.0).toFloat,
            m.width.toFloat / (m.width + m.height),
            math.min(1.0, bytes.length / (1024.0 * 1024.0)).toFloat,
            0f, 1f) // trailing flags: reserved, is-image
          case None => decodeStub(bytes)
        }
        (id, feats)
      }
    }.toDF(idCol, "features")
  }

  /** Compare-friendly audit of the decode path: every column is a scalar
    * computed INSIDE the kernel from the raw bytes, so an external oracle can
    * verify the binary plumbing end-to-end (byte count survives the binary
    * cast, the kernel ran once per row, emitted the full feature vector, and
    * every feature landed in the documented [0,1] range) without having to
    * reproduce the codec. Exact stub-feature values are pinned by unit test.
    */
  def decodeAudit(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "media_bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in: Dataset[Row] = df.select(col(idCol).cast("long"), col(binCol))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        // same kernel selection as decodeFeatures: real image decode when
        // the bytes parse, stub otherwise
        val feats = decodeImage(bytes) match {
          case Some(m) => Array(m.width / 4096f, m.height / 4096f, m.channels / 4f,
            (m.meanIntensity / 255.0).toFloat, m.width.toFloat / (m.width + m.height),
            math.min(1.0, bytes.length / (1024.0 * 1024.0)).toFloat, 0f, 1f)
          case None => decodeStub(bytes)
        }
        (id, bytes.length.toLong, feats.length.toLong,
          feats.forall(f => f >= 0.0f && f <= 1.0f))
      }
    }.toDF(idCol, "n_bytes", "n_features", "features_ok")
  }

  /** Deterministic frame sampling plan for video blobs: every `everyMs`
    * timestamp in [0, duration) — metadata-only (no decode), pure exprs.
    */
  def frameSamplePlan(df: DataFrame, everyMs: Long = 1000L): DataFrame =
    df.withColumn("frame_ts_ms",
      explode(sequence(lit(0L), greatest(col("media_meta.duration_ms") - 1, lit(0L)),
        lit(everyMs))))

  /** Partition sizing for blob tables: target ~`targetMb` per output
    * partition given an average blob size — keeps parquet row groups and
    * task memory bounded when blobs are MBs each.
    *
    * Sizing does NOT run an extra `count()` scan (the count-before-write
    * pattern SURVEY §4 flags in the reference): callers that know the row
    * count pass it, otherwise the optimizer's plan statistics supply a row
    * count or a size estimate (for file scans these come from file-listing
    * metadata, no data read). The one remaining fallback to `count()` is
    * when the plan reports the unknown-size default — rare, and explicit.
    */
  def repartitionForBlobs(df: DataFrame, avgBlobBytes: Long, targetMb: Int = 256,
      rowCount: Option[Long] = None): DataFrame = {
    val rowsPerPartition = math.max(1L, targetMb.toLong * 1024 * 1024 / math.max(1L, avgBlobBytes))
    val stats = df.queryExecution.optimizedPlan.stats
    val unknown = BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes)
    val rows: Long = rowCount
      .orElse(stats.rowCount.map(_.toLong))
      .getOrElse {
        if (stats.sizeInBytes < unknown)
          (stats.sizeInBytes / math.max(1L, avgBlobBytes)).toLong max 1L
        else df.count()
      }
    val n = math.max(1, (rows.toDouble / rowsPerPartition).ceil.toInt)
    df.repartition(n)
  }
}
