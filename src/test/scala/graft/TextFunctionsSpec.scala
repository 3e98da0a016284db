package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).collect()(0).getAs[T]("v")

  test("tokenCount handles empty / whitespace / multi-space text") {
    one[Int](tokenCount($"t"), "hello world") shouldBe 2
    one[Int](tokenCount($"t"), "") shouldBe 0
    one[Int](tokenCount($"t"), "   ") shouldBe 0
    one[Int](tokenCount($"t"), "  a   b\tc  ") shouldBe 3
  }

  test("approxBpeCount adds subword units for long words") {
    one[Long](approxBpeCount($"t"), "hi there") shouldBe 2L
    one[Long](approxBpeCount($"t"), "internationalization") shouldBe 5L // 1 + (20-4)/4
  }

  test("gopherRules: each rule rejects its own pathology, clean text keeps") {
    def rules(text: String): org.apache.spark.sql.Row =
      Seq(text).toDF("t").select(gopherRules($"t", minWords = 5).as("g"))
        .select("g.*").collect()(0)
    val clean = "the quick brown fox jumps over a lazy dog and runs on for miles"
    rules(clean).getAs[Boolean]("keep") shouldBe true
    // word-count floor
    rules("the of a").getAs[Boolean]("g_word_count") shouldBe false
    // mean word length out of [3,10]
    rules("a b c d e f g h").getAs[Boolean]("g_mean_word_len") shouldBe false
    // symbol ratio: hashes overwhelm the words
    rules("the # of # and # to # in #").getAs[Boolean]("g_symbol") shouldBe false
    // ...and '...' counts as a symbol too (3 chars -> 1 hit)
    rules("w1... w2... w3... the of and").getAs[Boolean]("g_symbol") shouldBe false
    // bullet lines
    rules("- one\n- two\n- three\n* four\n• five").getAs[Boolean]("g_bullet") shouldBe false
    // ellipsis line endings
    rules("first line...\nsecond line...\nthird").getAs[Boolean]("g_ellipsis") shouldBe false
    // alphabetic-word floor
    rules("1 2 3 4 5 6 7 8 9 10 the of").getAs[Boolean]("g_alpha") shouldBe false
    // stopword floor (no English stopwords at all)
    rules("zygote xylem quartz vortex jumbo").getAs[Boolean]("g_stop") shouldBe false
    // empty text: ratio rules pass vacuously, word count rejects
    val empty = rules("")
    empty.getAs[Long]("word_count") shouldBe 0L
    empty.getAs[Boolean]("g_symbol") shouldBe true
    empty.getAs[Boolean]("g_word_count") shouldBe false
    empty.getAs[Boolean]("keep") shouldBe false
  }

  test("punct/digit/upper ratios") {
    one[Double](punctRatio($"t"), "ab..") shouldBe 0.5
    one[Double](punctRatio($"t"), "") shouldBe 0.0
    one[Double](digitRatio($"t"), "a1b2") shouldBe 0.5
    one[Double](upperRatio($"t"), "AbCd") shouldBe 0.5
  }

  test("langId picks the language whose stopwords dominate") {
    one[String](langId($"t"), "the cat sat on the mat and it is fine") shouldBe "en"
    one[String](langId($"t"), "der hund und die katze ist nicht da") shouldBe "de"
    one[String](langId($"t"), "el perro y la casa es de madera") shouldBe "es"
    one[String](langId($"t"), "xyzzy qwerty") shouldBe null
  }

  test("langIdByDoc matches the scalar langId on every doc (incl. ties and empties)") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it is fine"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "el perro y la casa es de madera"),
      (4L, "le chat est dans la maison pour un moment"),
      (5L, "的 是 了 在 和"),
      (6L, "xyzzy qwerty"),            // no hits -> null
      (7L, ""),                        // no tokens -> null
      (8L, "de la")                    // tie between languages -> argmax tie-break
    ).toDF("doc_id", "text")
    val scalar = docs.select($"doc_id", langId($"text").as("lang_pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val table = langIdByDoc(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    table shouldBe scalar
    table(6L) shouldBe null
    table(7L) shouldBe null
  }

  test("fingerprint is case/whitespace insensitive") {
    val fp1 = one[String](fingerprint($"t"), "Hello   World")
    val fp2 = one[String](fingerprint($"t"), "hello world")
    fp1 shouldBe fp2
  }

  test("shingles: distinct char n-grams, short text → empty") {
    one[Seq[String]](shingles($"t", 3), "abcd") shouldBe Seq("abc", "bcd")
    one[Seq[String]](shingles($"t", 5), "abc") shouldBe Seq()
    // repeated content collapses (distinct)
    one[Seq[String]](shingles($"t", 2), "aaa") shouldBe Seq("aa")
  }

  test("qualityScore rewards normal prose, penalizes junk") {
    val good = one[Double](qualityScore($"t"), "the quick brown fox jumps over the lazy dog again")
    val junk = one[Double](qualityScore($"t"), "$$$ !!! ??? ,,, ;;; 12345 67890 11 22 33")
    good shouldBe 1.0
    junk should be < 0.5 // no letters + punct-heavy fails alpha/punct/digit gates
  }

  test("stopwordRatio") {
    one[Double](stopwordRatio($"t", "en"), "the dog and the cat") shouldBe 0.6
  }

  test("chunks: overlapping windows, short docs one chunk, empty docs none") {
    import org.apache.spark.sql.Row
    def chunkRows(s: String, size: Int, overlap: Int) =
      Seq(s).toDF("t").select(explode(chunks($"t", size, overlap)).as("c"))
        .select($"c.chunk_id", $"c.chunk").collect().toSeq
    chunkRows("a b c d e", 3, 1) shouldBe Seq(
      Row(0, "a b c"), Row(1, "c d e"))          // step 2, exact cover
    chunkRows("a b c d e f", 3, 1) shouldBe Seq(
      Row(0, "a b c"), Row(1, "c d e"), Row(2, "e f")) // short tail chunk
    chunkRows("a b", 10, 2) shouldBe Seq(Row(0, "a b")) // doc <= size
    chunkRows("   ", 5, 0) shouldBe Seq.empty            // empty doc: no chunks
  }

  test("topNgramCharRatioByDoc: repeated bigram dominates; tiny docs score 0") {
    val df = Seq(
      (1L, "aa bb aa bb aa"),   // "aa bb" x2 covers 10 of 14 chars
      (2L, "all words unique here now"),
      (3L, "solo")              // < 2 tokens: no bigram, ratio 0
    ).toDF("doc_id", "text")
    val out = topNgramCharRatioByDoc(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out(1L) shouldBe (10.0 / 14.0) +- 1e-9
    out(2L) should be < out(1L)
    out(3L) shouldBe 0.0
  }

  test("dupLineRatio counts repeated non-blank lines") {
    one[Double](round(dupLineRatio($"t"), 4), "x\ny\nx\n\n  \nz") shouldBe 0.25 // 4 lines, 1 dup
    one[Double](dupLineRatio($"t"), "single line") shouldBe 0.0
    one[Double](dupLineRatio($"t"), "") shouldBe 0.0
  }

  test("redactPii scrubs emails, phones, and IPs; leaves clean text alone") {
    one[String](redactPii($"t"), "mail a.b+c@sub.example.org now") shouldBe
      "mail <EMAIL> now"
    one[String](redactPii($"t"), "call 555-867-5309 or 555.867.5309 or 555 867 5309") shouldBe
      "call <PHONE> or <PHONE> or <PHONE>"
    one[String](redactPii($"t"), "from 10.0.0.1 and 192.168.255.254") shouldBe
      "from <IP> and <IP>"
    // version strings with fewer than 4 groups survive; digit runs without
    // separators are not phone-shaped
    one[String](redactPii($"t"), "v1.2.3 build 5558675309") shouldBe
      "v1.2.3 build 5558675309"
    one[String](redactPii($"t"), "no pii here") shouldBe "no pii here"
  }

  test("piiCounts audits per category") {
    val r = Seq("a@b.co and c@d.org at 10.0.0.1").toDF("t")
      .select(piiCounts($"t").as("p")).selectExpr("p.emails", "p.phones", "p.ips")
      .collect()(0)
    (r.getInt(0), r.getInt(1), r.getInt(2)) shouldBe ((2, 0, 1))
  }

  test("bm25 matches the hand-computed Okapi formula") {
    val docs = Seq((1L, "join join scan"), (2L, "scan filter"), (3L, ""))
      .toDF("doc_id", "text")
    val out = bm25(docs, "text", "doc_id", Seq("join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, df(join)=1 → idf = ln((3-1+0.5)/(1+0.5)+1); doc1: tf=2, dl=3,
    // avgdl=(3+2+0)/3 → denom = 2 + 1.2*(0.25 + 0.75*3/(5.0/3))
    val idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1)
    val expected = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3.0 / (5.0 / 3)))
    out(1L) shouldBe expected +- 1e-9
    out(2L) shouldBe 0.0 // no query term
    out(3L) shouldBe 0.0 // empty doc
  }
}
