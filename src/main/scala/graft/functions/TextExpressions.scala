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

object TextFunctions {
  def count_in_set(arr: Column, items: Seq[String]): Column =
    shim.column(CountInSet(shim.expression(arr), items))
  def normalize_text(c: Column): Column =
    shim.column(NormalizeText(shim.expression(c)))
}
