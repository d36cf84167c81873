package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass regex tokenizer: matches `pattern` against the input and
  * returns ALL capture groups as an array (NULL if the line doesn't match).
  *
  * The log-parse hot path needs a filter + N token projections from the
  * same pattern; with stock `rlike` + N×`regexp_extract` every row pays
  * N+1 full matches (each with the parser regexes' heavy backtracking).
  * This expression pays exactly one (reference analogue:
  * core/parser.go:64-80 — FindStringSubmatch, one match per line).
  */
case class RegexGroups(child: Expression, pattern: String) extends UnaryExpression {

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"regex_groups expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "regex_groups"

  override protected def nullSafeEval(input: Any): Any =
    RegexGroups.matchGroups(compiled, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef = ctx.addReferenceObj("pattern", compiled, classOf[Pattern].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object ${ev.value}_r = graft.functions.RegexGroups.matchGroups($patternRef, $c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) ${ev.value}_r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexGroups =
    copy(child = newChild)
}

object RegexGroups {
  /** Find-anywhere (Go FindStringSubmatch semantics); null ⇒ no match.
    * Unmatched optional groups come back as empty string, matching Go's
    * behaviour of returning "" for absent submatches. */
  def matchGroups(p: Pattern, s: UTF8String): GenericArrayData = {
    val m = p.matcher(s.toString)
    if (!m.find()) return null
    val n = m.groupCount()
    val arr = new Array[AnyRef](n)
    var i = 1
    while (i <= n) {
      val g = m.group(i)
      arr(i - 1) = if (g == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(g)
      i += 1
    }
    new GenericArrayData(arr)
  }
}

object RegexFunctions {
  def regex_groups(c: Column, pattern: String): Column =
    shim.column(RegexGroups(shim.expression(c), pattern))
}
