package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hot-loop kernels shared by interpreted eval and generated code. Scala
  * object methods get static forwarders, so generated Java calls them
  * directly (`graft.functions.VecOps.dotF(...)`). */
object VecOps {

  /** Σ aᵢ·bᵢ over float arrays, promoting each element to double before the
    * multiply and accumulating left-to-right — exactly the semantics of the
    * interpreted `zip_with`/`aggregate` formulation and the DuckDB oracle's
    * CAST(... AS DOUBLE[]) dot product. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  /** Minimum md5-hex over all `window`-char sliding windows of an ASCII
    * string (k-gram winnowing fingerprint). One digest instance per call,
    * reused across windows. Matches
    * `array_min(transform(..., i -> md5(substring(s, i, w))))` for ASCII
    * input (the normalized-text contract). */
  def minWindowMd5(s: UTF8String, window: Int): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = "0123456789abcdef".toCharArray
    var best: String = null
    val last = math.max(n - window, 0)
    var i = 0
    while (i <= last) {
      md.reset()
      md.update(bytes, i, math.min(window, n - i))
      val d = md.digest()
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < 16) {
        sb.append(hex((d(j) >> 4) & 0xf)).append(hex(d(j) & 0xf))
        j += 1
      }
      val h = sb.toString
      if (best == null || h.compareTo(best) < 0) best = h
      i += 1
    }
    if (best == null) UTF8String.fromString(md5Hex(md, Array.emptyByteArray))
    else UTF8String.fromString(best)
  }

  private def md5Hex(md: java.security.MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    md.digest(bytes).map(b => f"$b%02x").mkString
  }
}

/** Codegen'd dot product over two ArrayType(Float|Double) columns — the
  * kernel of the similarity-search operators. A single static call in
  * generated code; no per-element lambda dispatch, no boxing. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) == FloatType || elemType(e) == DoubleType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two arrays of float/double elements, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def kernel: String = (elemType(left), elemType(right)) match {
    case (FloatType, FloatType) => "dotF"
    case (DoubleType, DoubleType) => "dotD"
    case (FloatType, DoubleType) => "dotFD"
    case _ => "dotDF"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    kernel match {
      case "dotF" => VecOps.dotF(x, y)
      case "dotD" => VecOps.dotD(x, y)
      case "dotFD" => VecOps.dotFD(x, y)
      case _ => VecOps.dotDF(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.$kernel($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Winnowing fingerprint expression: min md5 over sliding windows. The
  * per-row work is a whole loop, so interpreted eval is already tight;
  * CodegenFallback keeps surrounding stages codegen'd. */
case class MinWindowMd5(child: Expression, window: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && window > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("min_window_md5 expects (STRING, window>0)")

  override def dataType: DataType = StringType
  override def prettyName: String = "min_window_md5"

  override protected def nullSafeEval(input: Any): Any =
    VecOps.minWindowMd5(input.asInstanceOf[UTF8String], window)

  override protected def withNewChildInternal(newChild: Expression): MinWindowMd5 =
    copy(child = newChild)
}

object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column =
    shim.column(VecDot(shim.expression(a), shim.expression(b)))
  def min_window_md5(c: Column, window: Int): Column =
    shim.column(MinWindowMd5(shim.expression(c), window))
}
