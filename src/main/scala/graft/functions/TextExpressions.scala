package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object TextOps {
  /** Occurrences (with multiplicity) of array elements in `set` — the
    * marker-counting kernel. Null elements don't count. */
  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Single-pass text normalization, semantically identical to
    * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", " "), " +", " "))`:
    * lowercase, then emit maximal `[a-z0-9]+` runs joined by single spaces.
    *
    * Equivalence argument: the inner regex maps every UTF-16 code unit
    * outside `[a-z0-9 ]` to a space (surrogate halves each count as one
    * unit — so does `charAt` here); the outer regex collapses space runs;
    * trim drops the ends. Composed, that is exactly "alnum runs joined by
    * one space". Lowercasing goes through `UTF8String.toLowerCase`, the
    * same call Spark's `lower()` makes. One pass, no regex engine — this
    * sits under every dedup/text-analysis operator, so it is the hottest
    * scalar kernel in the library. */
  /** |A ∩ B| for two arrays SORTED ascending by UTF8String binary order
    * (Spark's `sort_array` ordering for strings) with no duplicates —
    * a single merge pass with binary compares. Callers guarantee the
    * contract (graft stores per-document DISTINCT token arrays via
    * sort_array); unsorted input silently undercounts, so this is
    * deliberately NOT a general-purpose intersect.
    *
    * vs `size(array_intersect(a, b))`: no per-call hash-set build, no
    * intersection-array allocation — the verification step of the
    * PPJoin operator evaluates this once per candidate inside a join
    * condition, where the optimizer may duplicate the expression, so
    * per-eval cost matters more than anywhere else. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  def normalize(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val n = lowered.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = lowered.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        sb.append(c)
        pendingSpace = false
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd membership counter over a string array against a literal set:
  * `size(filter(arr, w -> w.isInCollection(items)))` computes the same
  * value through an interpreted per-element lambda (~100x slower on hot
  * paths — each element pays closure dispatch + boxing); this is one
  * static call per row with a shared hash set. */
case class CountInSet(child: Expression, items: Seq[String])
    extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](items.size * 2)
    items.foreach(i => s.add(UTF8String.fromString(i)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_in_set expects ARRAY<STRING>, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  override protected def nullSafeEval(input: Any): Any =
    TextOps.countInSet(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("set", set, "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.countInSet($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

/** Codegen'd [[TextOps.normalize]]: one static call in generated code in
  * place of two regexp_replace passes. */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    TextOps.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextOps.normalize($a);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Codegen'd [[TextOps.sortedIntersectCount]]: merge-count over two
  * sorted deduplicated ARRAY<STRING> columns. See the kernel scaladoc
  * for the sortedness contract. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two ARRAY<STRING>, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextOps.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** Ranked BPE merge table as a single reference object (plan-size
  * rationale of IvfIndex/PlaneSet/ProjMatrix). Tokenization is the
  * classic greedy algorithm: per word, repeatedly merge every
  * occurrence of the lowest-rank adjacent symbol pair until no pair is
  * in the table. Deterministic for a fixed merge list. */
final class BpeTable(merges: Seq[(String, String)]) extends Serializable {
  require(merges.nonEmpty, "empty merge table")

  private val rank = new java.util.HashMap[String, Integer](merges.size * 2)
  merges.zipWithIndex.foreach { case ((a, b), i) =>
    rank.putIfAbsent(a + "\u0000" + b, i)
  }

  private def tokenizeWord(word: String,
      out: java.util.ArrayList[UTF8String]): Unit = {
    if (word.isEmpty) return
    var parts = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) { // split into full code points, not chars
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      parts.add(word.substring(i, i + n))
      i += n
    }
    var done = false
    while (!done && parts.size > 1) {
      var best = Int.MaxValue
      var j = 0
      while (j < parts.size - 1) {
        val r = rank.get(parts.get(j) + "\u0000" + parts.get(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val merged = new java.util.ArrayList[String](parts.size)
        var k = 0
        while (k < parts.size) {
          if (k < parts.size - 1 && {
            val r = rank.get(parts.get(k) + "\u0000" + parts.get(k + 1))
            r != null && r == best
          }) {
            merged.add(parts.get(k) + parts.get(k + 1))
            k += 2
          } else {
            merged.add(parts.get(k))
            k += 1
          }
        }
        parts = merged
      }
    }
    var m = 0
    while (m < parts.size) { out.add(UTF8String.fromString(parts.get(m))); m += 1 }
  }

  /** Subword tokens of a whitespace-separated text, in order. */
  def encode(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val s = text.toString
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) tokenizeWord(s.substring(start, i), out)
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[UTF8String](out.size)).asInstanceOf[Array[Any]])
  }
}

/** BPE subword tokenization of a STRING column against a driver-built
  * [[BpeTable]]: returns the subword tokens in order. */
case class BpeEncode(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    table.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $t.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Unigram-LM tokenizer vocabulary (SentencePiece family) as a single
  * serializable reference object: piece → integer micro log2-probability
  * score, plus the exact Viterbi DP that segments a chunk under it.
  *
  * Determinism contract (the SQL oracle unrolls the identical DP):
  *  - dp over 0..len with dpS(0) = 0; at each position j, candidates are
  *    the vocab pieces ending at j with length ≤ `maxPieceLen`, plus the
  *    single-character UNK fallback at `unkScore` when the 1-char piece
  *    is absent (single chars of the training corpus are always in the
  *    vocab, so UNK only fires on unseen serve-time characters);
  *  - dpS(j) = max candidate score; dpN(j) = MIN piece count among the
  *    score-optimal candidates — the value pair is unique even when
  *    multiple paths tie, so (score, n_pieces) is engine-identical
  *    without needing a backtrack tie-break.
  * All arithmetic is exact Long sums of micro scores (|score| ≤ 62·10⁶
  * per piece). Callers chunk input to ≤ 16 characters (the oracle
  * unrolls 16 DP steps); the DP itself handles any length. */
final class UnigramVocab(pieces: Seq[(String, Long)], val maxPieceLen: Int,
    val unkScore: Long = -40000000L) extends Serializable {
  require(pieces.nonEmpty && maxPieceLen >= 1, "empty vocab / bad piece len")

  private val scores = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
  pieces.foreach { case (p, s) => scores.putIfAbsent(p, s) }

  def size: Int = scores.size

  /** (best score_micro, min piece count at that score) for one chunk. */
  def stats(chunk: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = chunk.toString
    val len = s.length
    if (len == 0)
      return org.apache.spark.sql.catalyst.InternalRow(0L, 0L)
    val NEG = Long.MinValue / 4
    val dpS = Array.fill(len + 1)(NEG)
    val dpN = new Array[Long](len + 1)
    dpS(0) = 0L
    var j = 1
    while (j <= len) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (dpS(i) > NEG) {
          val sc = scores.get(s.substring(i, j))
          val pieceScore: java.lang.Long =
            if (sc != null) sc
            else if (j - i == 1) java.lang.Long.valueOf(unkScore)
            else null
          if (pieceScore != null) {
            val cs = dpS(i) + pieceScore.longValue()
            val cn = dpN(i) + 1L
            if (cs > dpS(j) || (cs == dpS(j) && cn < dpN(j))) {
              dpS(j) = cs; dpN(j) = cn
            }
          }
        }
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(dpS(len), dpN(len))
  }
}

/** Viterbi segmentation stats of a STRING chunk against a driver-built
  * [[UnigramVocab]]: struct(score_micro, n_pieces). The per-row work is
  * a whole DP, so interpreted eval is already tight; CodegenFallback
  * keeps surrounding stages codegen'd (the [[MinWindowMd5]] pattern). */
case class UnigramSegmentStats(child: Expression, vocab: UnigramVocab)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_segment_stats expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("score_micro", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))
  override def prettyName: String = "unigram_segment_stats"

  override protected def nullSafeEval(input: Any): Any =
    vocab.stats(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): UnigramSegmentStats =
    copy(child = newChild)
}

/** WordPiece tokenizer vocabulary (the greedy longest-match-first third
  * of the subword triad, next to [[BpeTable]] and [[UnigramVocab]]) as a
  * single serializable reference object: two piece sets — word-INITIAL
  * pieces and CONTINUATION pieces (the `##`-prefixed entries of a
  * published WordPiece vocab, kept here as a boolean dimension instead
  * of a string prefix) — plus the greedy segmentation.
  *
  * Determinism contract (the SQL oracle unrolls the identical greedy
  * walk, one piece per step):
  *  - at position p, the candidate set is the pieces of the matching
  *    kind (initial at p = 0, continuation at p > 0) that prefix-match
  *    the remaining chunk with length ≤ `maxPieceLen`;
  *  - the LONGEST candidate wins (no scores — WordPiece's serve-time
  *    rule), the cursor advances by its length;
  *  - if NO candidate matches, the WHOLE chunk is UNK: exactly one
  *    piece, flagged — the reference WordPiece behavior of mapping the
  *    full word to [UNK] rather than emitting a partial segmentation.
  * Each step advances ≥ 1 character, so a ≤ 16-char chunk finishes in
  * ≤ 16 steps — the unroll bound the oracle shares. */
final class WordPieceVocab(initial: Seq[String], continuation: Seq[String],
    val maxPieceLen: Int) extends Serializable {
  require(maxPieceLen >= 1, "bad piece len")

  private val init = new java.util.HashSet[String](initial.size * 2)
  initial.foreach(init.add)
  private val cont = new java.util.HashSet[String](continuation.size * 2)
  continuation.foreach(cont.add)

  def size: Int = init.size + cont.size

  /** (n_pieces, is_unk 0/1) for one chunk under greedy longest-match. */
  def stats(chunk: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = chunk.toString
    val len = s.length
    if (len == 0)
      return org.apache.spark.sql.catalyst.InternalRow(0L, 0L)
    var pos = 0
    var n = 0L
    while (pos < len) {
      val set = if (pos == 0) init else cont
      var l = math.min(maxPieceLen, len - pos)
      var matched = 0
      while (l >= 1 && matched == 0) {
        if (set.contains(s.substring(pos, pos + l))) matched = l
        l -= 1
      }
      if (matched == 0)
        return org.apache.spark.sql.catalyst.InternalRow(1L, 1L)
      pos += matched
      n += 1L
    }
    org.apache.spark.sql.catalyst.InternalRow(n, 0L)
  }
}

/** Greedy WordPiece segmentation stats of a STRING chunk against a
  * driver-built [[WordPieceVocab]]: struct(n_pieces, is_unk). The
  * [[UnigramSegmentStats]] posture: whole-walk per row, CodegenFallback
  * keeps surrounding stages codegen'd. */
case class WordPieceSegmentStats(child: Expression, vocab: WordPieceVocab)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wordpiece_segment_stats expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("is_unk", LongType, nullable = false)))
  override def prettyName: String = "wordpiece_segment_stats"

  override protected def nullSafeEval(input: Any): Any =
    vocab.stats(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): WordPieceSegmentStats =
    copy(child = newChild)
}

object TextFunctions {
  def count_in_set(arr: Column, items: Seq[String]): Column =
    shim.column(CountInSet(shim.expression(arr), items))
  def unigram_segment_stats(c: Column, vocab: UnigramVocab): Column =
    shim.column(UnigramSegmentStats(shim.expression(c), vocab))
  def wordpiece_segment_stats(c: Column, vocab: WordPieceVocab): Column =
    shim.column(WordPieceSegmentStats(shim.expression(c), vocab))
  def normalize_text(c: Column): Column =
    shim.column(NormalizeText(shim.expression(c)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    shim.column(SortedIntersectCount(shim.expression(a), shim.expression(b)))
  def bpe_encode(c: Column, table: BpeTable): Column =
    shim.column(BpeEncode(shim.expression(c), table))
}
