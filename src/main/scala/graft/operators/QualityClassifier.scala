package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the fastText-style third leg of a
  * production quality stack next to rule-based scoring (Gopher) and LM
  * perplexity (CCNet): a LINEAR model over hashed unigram+bigram features,
  * fit on a small labeled sample, applied to the whole corpus as a
  * map-only projection (what GPT-3/Llama data cards describe as the
  * "quality classifier" stage, with logistic regression standing in for
  * fastText's linear classifier over hashed n-grams — the same model
  * class).
  *
  * Features are [[Dsir.bucketOf]]'s md5 buckets (deterministic,
  * partitioning-independent, and replicable in SQL oracles), document
  * vector = bucket-count / n-grams (fastText's mean pooling). Training is
  * DRIVER-SIDE full-batch logistic GD on a bounded labeled sample — the
  * [[Similarity.pqTrain]] pattern: an explicit size guard, deterministic
  * iteration order (docs sorted by collection order of the caller's
  * sample), no RNG. The fit cost is O(sample · grams · epochs) on the
  * driver, independent of corpus size.
  *
  * 100 TB shape: the MODEL is `buckets` doubles of metadata riding the
  * plan as one array literal; scoring is a narrow projection (tokenize →
  * hash → gather-add → threshold) with no join, no shuffle, no broadcast
  * table — the corpus is touched exactly once. Emit DECISIONS
  * (`z > 0` ⇔ `sigmoid(z) ≥ 0.5`), not interpolated floats, so oracle
  * comparison is bit-safe.
  */
object QualityClassifier {

  /** Trained model: dense per-bucket weights + bias. */
  final case class Model(weights: Array[Double], bias: Double, buckets: Int)

  /** Word unigrams + bigrams of a BOUND word-array column (callers must
    * materialize the split once in its own projection — inlining the
    * split into every bigram index is the O(words²) trap Dsir documents).
    */
  private def gramsOf(wordsCol: String): Column = {
    val bigrams = when(size(col(wordsCol)) >= 2,
      expr(s"transform(sequence(1, size($wordsCol) - 1), " +
        s"i -> concat_ws(' ', $wordsCol[i-1], $wordsCol[i]))"))
      .otherwise(array().cast("array<string>"))
    concat(col(wordsCol), bigrams)
  }

  private def wordsCol(textCol: String): Column =
    filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")

  /** Driver-side replica of [[Dsir.bucketOf]]'s arithmetic: first 15 hex
    * chars of md5(utf8) as a base-16 long, mod `buckets`.
    */
  private[graft] def bucketColumn(g: Column, buckets: Int): Column =
    Dsir.bucketOf(g, buckets)

  private[graft] def bucketOfLocal(gram: String, buckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % buckets).toInt
  }

  private def featurize(text: String, buckets: Int): Array[(Int, Double)] = {
    val ws = text.trim.split("\\s+").filter(_.nonEmpty)
    val grams = ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    if (grams.isEmpty) return Array.empty
    val n = grams.length.toDouble
    grams.groupBy(g => bucketOfLocal(g, buckets)).toArray.sortBy(_._1)
      .map { case (b, gs) => (b, gs.length / n) }
  }

  /** Fit logistic weights on `labeled` (`labelCol` ∈ {0, 1} / boolean).
    * The sample COLLECTS to the driver — `maxTrainDocs` is the explicit
    * guard (same contract as pqTrain's bounded-sample requirement): a
    * labeled quality set is small by construction; corpus-sized inputs
    * fail loud rather than OOM the driver. Deterministic: full-batch
    * gradients (order-stable sums over the id-sorted sample), fixed
    * epochs, no RNG.
    */
  def train(labeled: DataFrame, textCol: String, labelCol: String, idCol: String,
      buckets: Int = 8192, epochs: Int = 50, lr: Double = 2.0,
      maxTrainDocs: Int = 1 << 17): Model = {
    val rows = labeled
      .select(col(idCol).cast("long"), col(textCol).cast("string"),
        col(labelCol).cast("double"))
      .limit(maxTrainDocs + 1).collect()
    require(rows.length <= maxTrainDocs,
      s"quality-classifier training sample exceeds $maxTrainDocs documents — " +
      "training is driver-side by design; pass a bounded labeled sample")
    require(rows.nonEmpty, "empty training sample")
    val docs = rows.sortBy(_.getLong(0))
      .map(r => (r.getDouble(2), featurize(r.getString(1), buckets)))
    require(docs.exists(_._1 > 0.5) && docs.exists(_._1 < 0.5),
      "training sample needs both classes")
    val w = new Array[Double](buckets)
    var b = 0.0
    val n = docs.length.toDouble
    var epoch = 0
    while (epoch < epochs) {
      val gw = new Array[Double](buckets)
      var gb = 0.0
      docs.foreach { case (y, feats) =>
        var z = b
        feats.foreach { case (k, v) => z += w(k) * v }
        val err = 1.0 / (1.0 + math.exp(-z)) - y
        gb += err
        feats.foreach { case (k, v) => gw(k) += err * v }
      }
      var k = 0
      while (k < buckets) { w(k) -= lr * gw(k) / n; k += 1 }
      b -= lr * gb / n
      epoch += 1
    }
    Model(w, b, buckets)
  }

  /** The model as a persistable `(bucket, weight)` frame (bias at bucket
    * −1) — the pqTrain/ivfTrain persistence convention.
    */
  def modelToDF(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    ((-1, m.bias) +: m.weights.zipWithIndex.collect {
      case (v, i) if v != 0.0 => (i, v)
    }.toSeq).toDF("bucket", "weight")
  }

  def modelFromDF(df: DataFrame, buckets: Int = 8192): Model = {
    val rows = df.select(col("bucket").cast("int"), col("weight").cast("double"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    val w = new Array[Double](buckets)
    var bias = 0.0
    rows.foreach { case (b, v) => if (b == -1) bias = v else w(b) = v }
    Model(w, bias, buckets)
  }

  /** Score `df`: `(idCol, n_feats, keep)` where `keep` ⇔ the logistic
    * score exceeds 0.5 ⇔ the linear margin `z > 0`. One narrow
    * projection: tokenize once (bound word array), hash each gram with
    * the Dsir bucket arithmetic, gather the weight from the model's
    * ARRAY LITERAL (one plan constant — no join, no broadcast exchange,
    * no shuffle), mean-pool, add bias, threshold. Docs with no grams
    * score the bias alone.
    */
  def score(df: DataFrame, textCol: String, idCol: String, model: Model): DataFrame = {
    val wLit = typedLit(model.weights.toSeq)
    val gathered = aggregate(col("__g"), lit(0.0), (acc, g) =>
      acc + element_at(wLit, (Dsir.bucketOf(g, model.buckets) + 1).cast("int")))
    df.select(col(idCol), wordsCol(textCol).as("__w"))
      .select(col(idCol), gramsOf("__w").as("__g"))
      .select(col(idCol), size(col("__g")).as("n_feats"),
        (lit(model.bias) + when(size(col("__g")) === 0, lit(0.0))
          .otherwise(gathered / size(col("__g")))).as("__z"))
      .select(col(idCol), col("n_feats").cast("long").as("n_feats"),
        (col("__z") > 0).as("keep"))
  }
}
