package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenizer-accurate token counting: greedy byte-pair-encoding merges
  * from a bounded vocabulary, as ONE native expression.
  *
  * Whitespace counts misprice token budgets corpus-dependently (code
  * tokenizes ~2-4× its word count, CJK far more), so budget/packing
  * operators accept a tokens column — this expression makes that column
  * TOKENIZER-accurate. The algorithm is the standard BPE encode loop
  * (GPT-2 `encoder.py` shape): per whitespace word, start from
  * characters, repeatedly merge the LOWEST-RANK adjacent pair present
  * (left-to-right within a rank), stop when no listed pair remains; the
  * document count is the sum over words.
  *
  * The merge list rides the plan as ONE array<string> literal of
  * "left right" pairs in rank order — bounded vocabulary, no join, no
  * broadcast exchange, no shuffle; the kernel memoizes per-word results
  * (Zipf makes the hit rate extreme) and parses the merge literal once
  * per task, not per row. Generated code is a single static call — the
  * janino 64 KB lesson (PqExpressions) applied from the start.
  */
object BpeExpressions {

  val CountName = "graft_bpe_count"
  val EncodeName = "graft_bpe_encode"
  val SplitName = "graft_bpe_split"

  /** Idempotently register in this session's registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(CountName))) {
      reg.registerFunction(
        FunctionIdentifier(CountName),
        new ExpressionInfo(classOf[BpeCountExpr].getName, CountName),
        (children: Seq[Expression]) => BpeCountExpr(children(0), children(1)))
    }
    if (!reg.functionExists(FunctionIdentifier(EncodeName))) {
      reg.registerFunction(
        FunctionIdentifier(EncodeName),
        new ExpressionInfo(classOf[BpeEncodeExpr].getName, EncodeName),
        (children: Seq[Expression]) => BpeEncodeExpr(children(0), children(1), children(2)))
    }
    if (!reg.functionExists(FunctionIdentifier(SplitName))) {
      reg.registerFunction(
        FunctionIdentifier(SplitName),
        new ExpressionInfo(classOf[BpeSplitExpr].getName, SplitName),
        (children: Seq[Expression]) => BpeSplitExpr(children(0), children(1)))
    }
  }

  /** BPE token count of `text` under `merges` (array<string> of
    * "left right" pairs, rank order — pass a `typedLit`).
    */
  def tokenCount(spark: SparkSession, text: Column, merges: Column): Column = {
    register(spark)
    call_function(CountName, text, merges)
  }

  /** BPE token IDS of `text` under `merges`, ids assigned by position in
    * `vocab` (array<string> literal; id = 0-based index of the token
    * string). Tokens absent from the vocabulary emit −1 — a trained BPE
    * vocabulary covers its alphabet plus every merge output, so −1 marks
    * out-of-alphabet input, never a vocabulary hole. The id stream is the
    * per-word concatenation in document order (the same whitespace-word
    * walk [[tokenCount]] sums over).
    */
  def encode(spark: SparkSession, text: Column, merges: Column, vocab: Column): Column = {
    register(spark)
    call_function(EncodeName, text, merges, vocab)
  }

  /** BPE token STRINGS of a single word under `merges` — the raw merge
    * walk, exposed for merge-list TRAINING (pair counting needs the token
    * sequence, not its length). Input is treated as ONE word: whitespace
    * is not split here.
    */
  def splitWord(spark: SparkSession, word: Column, merges: Column): Column = {
    register(spark)
    call_function(SplitName, word, merges)
  }

  // ------------------------------------------------------------- kernel

  /** Parsed ranks PLUS the per-word memo, bound together per merge-list
    * instance: a memoized count is only ever served alongside the ranks
    * it was computed under, so two merge lists in one session (or one
    * query) can never cross-contaminate. A literal evaluates to the SAME
    * ArrayData instance every row, so one parse serves the whole task;
    * the identity map holds a handful of states so alternating merge
    * columns don't thrash the parse either.
    */
  private final class MergeState(val ranks: java.util.HashMap[String, Integer]) {
    val memo = new java.util.HashMap[String, java.lang.Long]()
    // token-string memo for the split/encode paths (word → merged tokens)
    val splitMemo = new java.util.HashMap[String, Array[String]]()
    // per-vocab-instance id lookup + word→ids memo, nested under the
    // merge state so ids can never be served across (merges, vocab) pairs
    val vocabStates = new java.util.IdentityHashMap[AnyRef, VocabState]()
  }

  private final class VocabState(val ids: java.util.HashMap[String, Integer]) {
    val memo = new java.util.HashMap[String, Array[Long]]()
  }

  private def vocabStateOf(st: MergeState, vocab: ArrayData): VocabState = {
    var vs = st.vocabStates.get(vocab)
    if (vs == null) {
      if (st.vocabStates.size() >= MaxStates) st.vocabStates.clear()
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      val n = vocab.numElements()
      while (i < n) {
        val tok = vocab.getUTF8String(i).toString
        if (!m.containsKey(tok)) m.put(tok, i)
        i += 1
      }
      vs = new VocabState(m)
      st.vocabStates.put(vocab, vs)
    }
    vs
  }

  private val stateCache =
    new ThreadLocal[java.util.IdentityHashMap[AnyRef, MergeState]]() {
      override def initialValue() = new java.util.IdentityHashMap[AnyRef, MergeState]()
    }
  private val MaxStates = 8
  private val MaxWordCache = 1 << 16

  private def stateOf(merges: ArrayData): MergeState = {
    val cache = stateCache.get()
    var st = cache.get(merges)
    if (st == null) {
      if (cache.size() >= MaxStates) cache.clear()
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      val n = merges.numElements()
      while (i < n) {
        val pair = merges.getUTF8String(i).toString
        if (!m.containsKey(pair)) m.put(pair, i)
        i += 1
      }
      st = new MergeState(m)
      cache.put(merges, st)
    }
    st
  }

  private def bpeWordCount(word: String, ranks: java.util.HashMap[String, Integer]): Long =
    bpeWordTokens(word, ranks).length.toLong

  private def bpeWordTokens(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var tokens = word.toCharArray.map(_.toString)
    var done = false
    while (!done && tokens.length > 1) {
      // lowest-rank pair present
      var best = Int.MaxValue
      var i = 0
      while (i < tokens.length - 1) {
        val r = ranks.get(tokens(i) + " " + tokens(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge that rank's occurrences left-to-right (adjacent runs
        // re-pair with the NEXT token after the merge, the encoder.py walk)
        val out = new scala.collection.mutable.ArrayBuffer[String](tokens.length)
        var j = 0
        while (j < tokens.length) {
          if (j < tokens.length - 1 && {
            val r = ranks.get(tokens(j) + " " + tokens(j + 1)); r != null && r == best
          }) {
            out += tokens(j) + tokens(j + 1)
            j += 2
          } else {
            out += tokens(j)
            j += 1
          }
        }
        tokens = out.toArray
      }
    }
    tokens
  }

  /** Static entry the generated code calls. */
  def countTokens(text: UTF8String, merges: ArrayData): Long = {
    if (text == null) return 0L
    val st = stateOf(merges)
    val ranks = st.ranks
    val cache = st.memo
    var total = 0L
    val words = text.toString.trim.split("\\s+")
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var c = cache.get(w)
        if (c == null) {
          if (cache.size() >= MaxWordCache) cache.clear()
          c = bpeWordCount(w, ranks)
          cache.put(w, c)
        }
        total += c
      }
      i += 1
    }
    total
  }

  /** Static entry for [[BpeEncodeExpr]]'s generated code. */
  def encodeIds(text: UTF8String, merges: ArrayData, vocab: ArrayData): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val st = stateOf(merges)
    val vs = vocabStateOf(st, vocab)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val words = text.toString.trim.split("\\s+")
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var ids = vs.memo.get(w)
        if (ids == null) {
          if (vs.memo.size() >= MaxWordCache) vs.memo.clear()
          ids = bpeWordTokens(w, st.ranks).map { t =>
            val id = vs.ids.get(t)
            if (id == null) -1L else id.longValue()
          }
          vs.memo.put(w, ids)
        }
        var j = 0
        while (j < ids.length) { out += ids(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Static entry for [[BpeSplitExpr]]'s generated code. */
  def splitTokens(word: UTF8String, merges: ArrayData): ArrayData = {
    if (word == null) return new GenericArrayData(Array.empty[Any])
    val st = stateOf(merges)
    val w = word.toString
    var toks = st.splitMemo.get(w)
    if (toks == null) {
      if (st.splitMemo.size() >= MaxWordCache) st.splitMemo.clear()
      toks = bpeWordTokens(w, st.ranks)
      st.splitMemo.put(w, toks)
    }
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))
  }
}

/** Greedy-BPE token count — see [[BpeExpressions]]. */
case class BpeCountExpr(text: Expression, merges: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = merges
  override def dataType: DataType = LongType
  override def prettyName: String = BpeExpressions.CountName

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, merges.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got " +
          s"(${text.dataType.simpleString}, ${merges.dataType.simpleString})")
    }

  override def nullSafeEval(t: Any, m: Any): Any =
    BpeExpressions.countTokens(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = graft.functions.BpeExpressions.countTokens($t, $m);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(text = l, merges = r)
}

/** Greedy-BPE token ids from a positional vocabulary — see
  * [[BpeExpressions.encode]].
  */
case class BpeEncodeExpr(text: Expression, merges: Expression, vocab: Expression)
    extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = merges
  override def third: Expression = vocab
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = BpeExpressions.EncodeName

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, merges.dataType, vocab.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>, array<string>), got " +
          s"(${text.dataType.simpleString}, ${merges.dataType.simpleString}, " +
          s"${vocab.dataType.simpleString})")
    }

  override def nullSafeEval(t: Any, m: Any, v: Any): Any =
    BpeExpressions.encodeIds(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData],
      v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m, v) =>
      s"${ev.value} = graft.functions.BpeExpressions.encodeIds($t, $m, $v);")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): Expression = copy(text = a, merges = b, vocab = c)
}

/** Greedy-BPE merge walk of ONE word to token strings — see
  * [[BpeExpressions.splitWord]].
  */
case class BpeSplitExpr(word: Expression, merges: Expression)
    extends BinaryExpression {

  override def left: Expression = word
  override def right: Expression = merges
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = BpeExpressions.SplitName

  override def checkInputDataTypes(): TypeCheckResult =
    (word.dataType, merges.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got " +
          s"(${word.dataType.simpleString}, ${merges.dataType.simpleString})")
    }

  override def nullSafeEval(w: Any, m: Any): Any =
    BpeExpressions.splitTokens(w.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, m) =>
      s"${ev.value} = graft.functions.BpeExpressions.splitTokens($w, $m);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(word = l, merges = r)
}
