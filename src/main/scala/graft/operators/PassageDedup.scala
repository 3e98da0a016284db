package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Passage-level deduplication: dedup WITHIN documents at sub-document
  * granularity, the layer the whole-document methods in [[Dedup]] cannot
  * see. Two standard web-corpus moves:
  *
  *  - [[paragraphDedup]]: CCNet-style global paragraph dedup — every
  *    paragraph (split on a separator) is kept only at its first corpus
  *    occurrence, which strips boilerplate headers/footers/navigation that
  *    repeat across pages while keeping each page's unique body.
  *  - [[duplicatedNgramStats]] / [[duplicatedNgramFilter]]: Lee-et-al-style
  *    duplicated-n-gram scoring — the fraction of a document's n-grams that
  *    occur in more than `minDf` documents; documents that are mostly
  *    corpus-repeated content get dropped.
  *
  * 100 TB design: both are explode → ONE hash shuffle on the passage key →
  * doc-side reassembly/aggregate. Paragraph selection shuffles each
  * paragraph once (window over the paragraph hash — same shape as
  * [[Dedup.exact]]); reassembly is a second shuffle of the surviving rows
  * keyed by doc, unavoidable because document order must be restored.
  * N-gram scoring never reassembles: the doc-frequency side aggregates
  * (ngram-hash, docs) with map-side partials before the shuffle, and the
  * join back to per-doc n-grams is a plain shuffle join on the hash — no
  * all-pairs anywhere, no driver state.
  */
object PassageDedup {

  /** Global first-occurrence paragraph dedup (CCNet's dedup unit). Splits
    * `textCol` on `sep`, keeps each distinct normalized paragraph only in
    * the document where it first appears — "first" = lowest (`idCol`,
    * position), a total order so the result is deterministic — and
    * reassembles the survivors in document order. Documents whose every
    * paragraph was seen earlier disappear. Comparison key is the
    * whitespace-trimmed lowercased paragraph; empty paragraphs are dropped.
    *
    * Output: (`idCol`, `textCol` rebuilt with `sep`, `kept_paragraphs`,
    * `dropped_paragraphs`).
    */
  def paragraphDedup(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = df
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__para")))
      .withColumn("__key", lower(trim(col("__para"))))
      .filter(col("__key") =!= "")
    val firstWin = Window.partitionBy(col("__key"))
      .orderBy(col("__id"), col("__pos"))
    val perDoc = paras
      .withColumn("__rn", row_number().over(firstWin))
      .groupBy(col("__id"))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(when(col("__rn") === 1,
            struct(col("__pos"), col("__para"))))),
          s => s.getField("__para"))).as(textCol),
        count(when(col("__rn") === 1, 1)).as("kept_paragraphs"),
        count(when(col("__rn") =!= 1, 1)).as("dropped_paragraphs"))
      .filter(col("kept_paragraphs") > 0)
    perDoc.withColumnRenamed("__id", idCol)
  }

  /** Per-document duplicated-n-gram statistics: for word `n`-grams (split
    * on whitespace), the count of the document's n-gram OCCURRENCES whose
    * n-gram appears in more than `minDf` distinct documents, and the
    * fraction of the document that is such corpus-repeated content.
    * Documents shorter than `n` words have zero n-grams and report a 0.0
    * fraction. Output: (`idCol`, `total_ngrams`, `dup_ngrams`,
    * `dup_fraction`).
    */
  def duplicatedNgramStats(df: DataFrame, textCol: String, idCol: String,
      n: Int, minDf: Long): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    // one row per n-gram occurrence: (doc, xxhash64 of the n words)
    val grams = df
      .select(col(idCol).as("__id"),
        split(col(textCol), "\\s+").as("__w"))
      .select(col("__id"), explode(
        // when() guard: sequence(0, -1) DESCENDS in Spark, so docs shorter
        // than n words must map to an empty array (explode then emits no
        // rows; the right_outer below restores them with 0)
        when(size(col("__w")) >= n,
          transform(sequence(lit(0), size(col("__w")) - n),
            i => xxhash64(concat_ws("", slice(col("__w"), i + 1, lit(n))))))
          .otherwise(array().cast("array<long>")))
          .as("__g"))
    // collapse occurrences to per-(doc, gram) counts first (map-side
    // partials absorb within-doc repeats), then derive doc frequency from
    // that much smaller aggregate. The aggregate feeds two consumers (hot
    // detection + the semi join), which Spark recomputes rather than
    // reuses; at production scale persist/checkpoint perDocGram before
    // this call's return is consumed — the skew-safe alternative (window
    // count per gram) would funnel every doc containing a hot gram into
    // one partition, and hot grams are precisely what this operator hunts
    val perDocGram = grams
      .groupBy(col("__id"), col("__g")).agg(count(lit(1)).as("__occ"))
    val hot = perDocGram
      .groupBy(col("__g")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > minDf)
    perDocGram
      .join(hot.hint("shuffle_hash"), Seq("__g"), "left_semi")
      .groupBy(col("__id")).agg(sum(col("__occ")).as("dup_ngrams"))
      .join(
        df.select(col(idCol).as("__id"),
          greatest(size(split(col(textCol), "\\s+")) - n + 1, lit(0))
            .cast("long").as("total_ngrams")),
        Seq("__id"), "right_outer")
      .select(col("__id").as(idCol), col("total_ngrams"),
        coalesce(col("dup_ngrams"), lit(0L)).as("dup_ngrams"),
        when(col("total_ngrams") > 0,
          coalesce(col("dup_ngrams"), lit(0L)) / col("total_ngrams"))
          .otherwise(lit(0.0)).as("dup_fraction"))
  }

  /** Keep documents whose duplicated-n-gram fraction is at most
    * `maxDupFraction` — the Lee-et-al filter for pages that are mostly
    * templated/repeated corpus content. Returns the input rows (original
    * columns) that survive.
    */
  def duplicatedNgramFilter(df: DataFrame, textCol: String, idCol: String,
      n: Int, minDf: Long, maxDupFraction: Double): DataFrame = {
    val stats = duplicatedNgramStats(df, textCol, idCol, n, minDf)
      .filter(col("dup_fraction") <= maxDupFraction)
      .select(col(idCol))
    df.join(stats, Seq(idCol), "left_semi")
  }

  /** ExactSubstr-style duplicated-SPAN removal (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better": cut the duplicated
    * substring, keep the rest of the document). The suffix-array pass of
    * the paper is inherently sequential; the distributed surrogate is the
    * standard L-gram cover, and at granularity L it is EXACT: a position
    * lies inside some corpus-duplicated substring of length ≥ `minWords`
    * iff it lies inside some duplicated `minWords`-gram window (a span of
    * length ≥ L duplicates iff all its L-windows do, and the windows tile
    * every position of the span).
    *
    * Semantics, fully deterministic: tokenize on whitespace; every
    * `minWords`-gram occurring MORE THAN ONCE in the corpus marks its
    * window at every occurrence EXCEPT the global first — "first" =
    * lowest (`idCol`, position), so one canonical copy of each repeated
    * passage always survives, the paper's practical variant. Marked
    * windows merge into spans per document (overlap merge); covered words
    * are cut and the survivors rejoin with single spaces (output text is
    * whitespace-canonical for every document, touched or not).
    *
    * Output: (`idCol`, `clean_text`, `removed_words`, `total_words`).
    *
    * 100 TB shape: one map-side-combined aggregation over gram TEXT (the
    * exactness contract — a hash would admit collision false-positives;
    * grams shuffle once, ~L× the corpus bytes, the price the paper's
    * method also pays in suffix-array bytes), one shuffle join of gram
    * occurrences back to the duplicated grams, then per-document windows
    * and reassembly keyed by `idCol`. No all-pairs, no driver state;
    * per-gram state is (first occurrence, count) — a million-fold repeated
    * boilerplate gram folds to one row.
    */
  def removeDuplicateSpans(df: DataFrame, textCol: String, idCol: String,
      minWords: Int): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    val L = minWords
    val words = df.select(col(idCol).as("__id"),
      split(trim(col(textCol)), "\\s+").as("__w"))
    // one row per L-gram occurrence, 1-based position, gram as text
    val grams = words
      .select(col("__id"), col("__w"),
        explode(when(size(col("__w")) >= L,
          sequence(lit(1), size(col("__w")) - L + 1))
          .otherwise(array().cast("array<int>"))).as("__i"))
      .select(col("__id"), col("__i"),
        concat_ws(" ", slice(col("__w"), col("__i"), lit(L))).as("__gram"))
    // per-gram: global first occurrence + occurrence count (map-side
    // partials collapse hot boilerplate grams before the shuffle)
    val dupGrams = grams
      .groupBy(col("__gram"))
      .agg(min(struct(col("__id"), col("__i"))).as("__first"),
        count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select(col("__gram"), col("__first"))
    // duplicated occurrences = all but the keeper
    val dups = grams
      .join(dupGrams.hint("shuffle_hash"), Seq("__gram"))
      .filter(!(col("__id") === col("__first.__id") && col("__i") === col("__first.__i")))
      .select(col("__id"), col("__i"))
    // overlap-merge the L-windows into spans per document
    val prevEnd = Window.partitionBy(col("__id")).orderBy(col("__i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ordered = Window.partitionBy(col("__id")).orderBy(col("__i"))
    val spans = dups
      .withColumn("__brk",
        when(max(col("__i")).over(prevEnd) + L - 1 >= col("__i"), 0).otherwise(1))
      .withColumn("__island", sum(col("__brk")).over(ordered))
      .groupBy(col("__id"), col("__island"))
      .agg(min(col("__i")).as("__s"), (max(col("__i")) + L - 1).as("__e"))
      .groupBy(col("__id"))
      .agg(collect_list(struct(col("__s"), col("__e"))).as("__spans"))
    // cut covered words, rejoin with single spaces. Indexed lambdas (i is
    // 0-based; spans are 1-based): a null __spans (untouched doc) makes
    // exists() null — IF picks the keep branch and filter drops the
    // element, i.e. zero removal, no coalesce ceremony needed. concat_ws
    // skips the nulls the cut leaves behind.
    val covered = "iv -> i + 1 >= iv.__s AND i + 1 <= iv.__e"
    words.join(spans, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        concat_ws(" ", expr(
          s"transform(__w, (w, i) -> IF(exists(__spans, $covered), NULL, w))"))
          .as("clean_text"),
        expr(s"size(filter(__w, (w, i) -> exists(__spans, $covered)))")
          .cast("long").as("removed_words"),
        size(col("__w")).cast("long").as("total_words"))
  }
}
