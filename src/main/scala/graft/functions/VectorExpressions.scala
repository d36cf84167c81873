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

/** Driver-built IVF centroid index, attached to expressions as a single
  * reference object (`ctx.addReferenceObj`) rather than per-element
  * literals — the plan and generated code stay O(1) in centroid count, so
  * a 100k-centroid quantizer neither blows the constant pool nor the
  * 64KB JIT method limit. Serializable: ships once per executor inside
  * the task binary, like a broadcast.
  *
  * Centroids are stored as doubles: float centroids promote exactly, and
  * integer micro-unit centroids ([[IvfIndex.fromMicro]], the
  * oracle-exact k-means path) ride as exact integers — cosine is
  * scale-invariant, so micro-unit coordinates assign identically to the
  * micro/10⁶ centroids they encode, with no float-precision loss.
  *
  * Arithmetic contract (must stay oracle-exact): cosine = dotFD-style
  * left-to-right double accumulation, rounded HALF_UP to `roundTo`
  * places exactly like Spark's `round()`; ties broken by lowest
  * centroid id. `ids` must be sorted ascending. Zero-norm vectors or
  * centroids produce NaN similarities whose ordering is NOT
  * engine-portable (this scan keeps the first index; SQL engines sort
  * NaN highest) — callers must not feed all-zero vectors.
  */
final class IvfIndex private (val ids: Array[Long], vecs: Array[Array[Double]],
    roundTo: Int) extends Serializable {
  require(ids.length == vecs.length && ids.nonEmpty, "empty/ragged centroid set")

  def this(ids: Array[Long], vecs: Array[Array[Float]], roundTo: Int) =
    this(ids, vecs.map(v => v.map(_.toDouble)): Array[Array[Double]], roundTo)

  private val norms: Array[Double] = vecs.map { cv =>
    var acc = 0.0; var i = 0
    while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
    math.sqrt(acc)
  }

  def size: Int = ids.length

  /** Lossless lazy-rounding band, derived from `roundTo` (NOT a constant:
    * a 2e-6 band is only safe for roundTo >= 6). Rounding HALF_UP moves a
    * value by at most half a quantum q = 10^-roundTo, so any candidate
    * more than 2q below the raw maximum rounds strictly below the rounded
    * maximum and can never win or tie — the exact argument the lazy scan
    * in [[nearestCells]] relies on, now valid for every roundTo. */
  private val band: Double = 2.0 * math.pow(10.0, -roundTo)

  private def roundN(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Ids of the `topN` nearest centroids by (rounded cosine desc, id asc).
    *
    * Selection is bit-identical to rounding every similarity with
    * [[roundN]] and scanning with the same strict-> loop, but the
    * BigDecimal rounding (Double.toString inside `valueOf` — the hot
    * spot at a few million assignments per pass) runs LAZILY: per pick,
    * a raw pre-pass finds the unrounded maximum, and only candidates
    * within one rounding step of it (±5e-7 each, 2e-6 is a safe band)
    * are rounded exactly — anything below the band rounds strictly
    * lower than the rounded raw maximum and can never win or tie. The
    * band loop scans ascending with the identical comparison, so
    * rounded-tie winners (lowest index) and the NaN quirk (a leading
    * NaN is never displaced — callers must not feed zero-norm vectors)
    * are preserved exactly. Typically one rounding per pick instead of
    * `size`. */
  def nearestCells(v: ArrayData, topN: Int): ArrayData = {
    val n = ids.length
    val d = v.numElements()
    var vAcc = 0.0
    var i = 0
    while (i < d) { val x = v.getFloat(i).toDouble; vAcc += x * x; i += 1 }
    val vNorm = math.sqrt(vAcc)
    val sims = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cv = vecs(c)
      val m = math.min(d, cv.length)
      var acc = 0.0
      i = 0
      while (i < m) { acc += v.getFloat(i).toDouble * cv(i); i += 1 }
      sims(c) = acc / (vNorm * norms(c))
      c += 1
    }
    val rounded = new Array[Double](n)
    val hasRounded = new Array[Boolean](n)
    def rn(c: Int): Double = {
      if (!hasRounded(c)) { rounded(c) = roundN(sims(c)); hasRounded(c) = true }
      rounded(c)
    }
    val k = math.min(topN, n)
    val out = new Array[Long](k)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < k) {
      var rawBest = -1
      c = 0
      while (c < n) {
        if (!taken(c) && (rawBest < 0 || sims(c) > sims(rawBest))) rawBest = c
        c += 1
      }
      val thr = sims(rawBest) - band
      var best = -1
      c = 0
      while (c < n) {
        // strict > keeps the earliest (lowest-id) centroid on rounded ties
        if (!taken(c) && (sims(c) >= thr || c == rawBest) &&
            (best < 0 || rn(c) > rn(best))) best = c
        c += 1
      }
      taken(best) = true
      out(r) = ids(best)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object IvfIndex {
  /** Index over integer micro-unit centroids (element = micro/10⁶,
    * [[graft.ops.Similarity.trainIvfCentroidsMicro]]): each long converts
    * to double exactly (|micro| < 2⁵³ always holds here), so assignment
    * arithmetic is bit-reproducible in any engine that evaluates the same
    * rounded-cosine argmax over the same integers. */
  def fromMicro(ids: Array[Long], micro: Array[Array[Long]],
      roundTo: Int): IvfIndex =
    new IvfIndex(ids, micro.map(v => v.map(_.toDouble)), roundTo)
}

/** BIT-EXACT integer-micro cosine kernels — the engine-portable similarity
  * contract that removes floating point from the oracle replay entirely
  * (the fix for the round(double, 6) half-way-boundary divergence that a
  * different DuckDB build's dot-product accumulation order can flip).
  *
  * Contract, identical in Spark and any SQL oracle:
  *  - vectors are quantized once to integer micro units
  *    mᵢ = floor(xᵢ·10⁶) (the repo-wide convention — the double multiply
  *    and floor are IEEE-deterministic, so both engines quantize
  *    identically);
  *  - dot and squared norms are exact 64-bit integer sums (every
  *    intermediate < 2⁵³, so even a double-based replay like DuckDB's
  *    `list_dot_product` over the micro values is exact integer
  *    arithmetic in disguise, REGARDLESS of accumulation order);
  *  - cosMicro = trunc(dot·10⁶ / isqrt(na·nb)) — integer square root and
  *    truncating division, both order-free. No rounding boundary exists
  *    anywhere: equal inputs give equal outputs on every engine.
  *
  * Magnitude guard: callers must keep each squared norm below 4e15
  * (|element| ≤ 7.9e6 micro ≈ raw 7.9 at 64 dims — comfortably above any
  * normalized-embedding corpus). Within that bound the double-seeded
  * isqrt error is provably < 1 (ulp(na·nb)/2√(na·nb) ≤ √(na·nb)·2⁻⁵² ≤
  * 0.9), so the single ±1 correction step — expressible in one SQL CASE —
  * is exact, and dot·10⁶ fits the 128-bit intermediates both engines use
  * (BigInteger here, HUGEINT in DuckDB). */
object ExactMicroOps {
  /** Max allowed squared norm (see class doc): keeps the ±1-corrected
    * isqrt exact and all intermediates within 128 bits. */
  val MaxNormSq: Long = 4000000000000000L

  /** Exact floor(sqrt(x)) for 0 <= x <= MaxNormSq², via a double seed and
    * one ±1 correction — the same arithmetic a SQL oracle replays with
    * CASE WHEN (s0+1)² <= x THEN s0+1 WHEN s0² > x THEN s0-1 ELSE s0 END. */
  def isqrt(x: java.math.BigInteger): java.math.BigInteger = {
    val s0 = java.math.BigInteger.valueOf(
      math.floor(math.sqrt(new java.math.BigDecimal(x).doubleValue())).toLong)
    val up = s0.add(java.math.BigInteger.ONE)
    if (up.multiply(up).compareTo(x) <= 0) up
    else if (s0.multiply(s0).compareTo(x) > 0) s0.subtract(java.math.BigInteger.ONE)
    else s0
  }

  /** [[isqrt]] over a non-negative Long — the column-expression entry
    * point ([[IsqrtLong]]); result always fits a Long (≤ 2³¹·√2). */
  def isqrtLong(x: Long): Long = {
    require(x >= 0L, s"isqrt_long: negative input $x")
    isqrt(java.math.BigInteger.valueOf(x)).longValueExact()
  }

  /** Exact micro-units log2 of a positive integer — the deterministic
    * fixed-point kernel both engines replay bit-for-bit (the
    * [[graft.ops.Linkage.log2Micro]] contract; see that scaladoc for
    * the derivation and the unrolled SQL twin):
    * e = ⌊log2 n⌋ exactly, x₀ = ⌊n·2³²/2ᵉ⌋, 16 truncating squaring
    * steps extract the fraction bits, result = ⌊(e·2¹⁶+frac)·10⁶/2¹⁶⌋.
    * Envelope: 1 ≤ n < 2⁶². */
  def log2Micro(n: Long): Long = {
    require(n >= 1L && n < (1L << 62), s"log2Micro: $n out of [1, 2^62)")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val x0 = if (e <= 32) n << (32 - e) else n >> (e - 32)
    var x = BigInt(x0)
    var frac = 0L
    val two33 = BigInt(1) << 33
    for (_ <- 1 to 16) {
      x = (x * x) >> 32
      if (x >= two33) { x >>= 1; frac = frac * 2 + 1 }
      else frac = frac * 2
    }
    ((e * 65536L + frac) * 1000000L) / 65536L
  }

  /** The 20 fractional powers of two 2^(2⁻ⁱ), i = 1..20, in 2³² fixed
    * point, derived purely from the [[isqrt]] kernel (c₁ = isqrt(2⁶⁵),
    * cᵢ = isqrt(cᵢ₋₁·2³²)) — no float constant anywhere, so a SQL
    * oracle rebuilds the identical table with 20 single-row isqrt CTEs. */
  private[graft] lazy val exp2Consts: Array[BigInt] = {
    val a = new Array[BigInt](20)
    var c = BigInt(1) << 33 // 2.0 in 2^32 fixed point
    var i = 0
    while (i < 20) {
      c = BigInt(isqrt((c << 32).bigInteger))
      a(i) = c
      i += 1
    }
    a
  }

  /** Exact micro-units 2^(x/10⁶) — the inverse kernel of [[log2Micro]],
    * deterministic integer arithmetic both engines replay bit-for-bit:
    * split x (shifted non-negative, so only non-negative `/`/`%` appear)
    * into integer exponent q and 20-bit fixed-point fraction F, multiply
    * the [[exp2Consts]] powers selected by F's bits with a truncating
    * 2³²-fixed-point product chain, then apply the 2^q scale as one
    * exact power-of-two multiply/divide. Envelope: −64·10⁶ ≤ x < 43·10⁶
    * (above it the micro result would overflow Long; far below it the
    * result truncates to 0, which is the correct fixed-point answer). */
  def exp2Micro(x: Long): Long = {
    require(x >= -64000000L && x < 43000000L,
      s"exp2Micro: $x out of [-64e6, 43e6)")
    val xs = x + 64000000L
    val q = xs / 1000000L - 64L
    val f = ((xs % 1000000L) << 20) / 1000000L
    var acc = BigInt(1) << 32
    var i = 1
    while (i <= 20) {
      if (((f >> (20 - i)) & 1L) == 1L)
        acc = (acc * exp2Consts(i - 1)) >> 32
      i += 1
    }
    val t = acc * 1000000L
    val res =
      if (q >= 32L) t << (q - 32L).toInt
      else if (32L - q > 117L) BigInt(0)
      else t >> (32L - q).toInt
    res.bigInteger.longValueExact()
  }

  /** Exact micro-units logistic sigmoid of a micro-units margin,
    * composed from [[exp2Micro]]: σ(m) = 10¹² / (10⁶ + 2^(−m·log₂e))
    * with log₂e as the truncated micro constant 1442695 and the
    * magnitude-then-sign product discipline on the exponent (the one
    * place a negative division could creep in). The exponent is clamped
    * to ±20·10⁶ — beyond it σ is 0 or 1 to sub-micro precision, and the
    * clamp keeps [[exp2Micro]] inside its envelope for any Long margin. */
  def sigmoidMicro(m: Long): Long = {
    val am = math.abs(m)
    val z0 = // |m|·log2(e) in micro, truncating — overflow-safe via BigInt
      (BigInt(am) * 1442695L / 1000000L).min(BigInt(20000000L)).toLong
    val e = if (m >= 0L) -z0 else z0 // 2^(−m·log2 e)
    1000000000000L / (1000000L + exp2Micro(e))
  }

  /** cosMicro from pre-accumulated integer parts: trunc(dot·10⁶ / s) with
    * s = isqrt(na·nb); 0 when either norm is 0 (the deterministic
    * zero-vector pin — no NaN anywhere on this path). Truncation toward
    * zero matches BigInteger.divide, DuckDB's integer `//`, and Spark's
    * `div` exactly, including on negative dots. */
  def cosMicroParts(dot: Long, na: Long, nb: Long): Long = {
    require(na <= MaxNormSq && nb <= MaxNormSq,
      s"cos_micro: squared norm exceeds $MaxNormSq (na=$na nb=$nb) — " +
        "quantized inputs out of the exact-isqrt envelope")
    if (na == 0L || nb == 0L) return 0L
    val nn = java.math.BigInteger.valueOf(na)
      .multiply(java.math.BigInteger.valueOf(nb))
    val s = isqrt(nn)
    java.math.BigInteger.valueOf(dot)
      .multiply(java.math.BigInteger.valueOf(1000000L))
      .divide(s).longValueExact()
  }

  /** Exact integer-micro cosine between two ARRAY<BIGINT> micro vectors.
    * Dot over the common prefix (the [[VecOps.dotF]] convention), each
    * squared norm over its full vector (the SQL `list_dot_product(v, v)`
    * convention) — with equal dims, the only case the operators feed,
    * the two conventions coincide. */
  def cosMicro(a: ArrayData, b: ArrayData): Long = {
    val la = a.numElements(); val lb = b.numElements()
    val m = math.min(la, lb)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < m) {
      val x = a.getLong(i); val y = b.getLong(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    i = m
    while (i < la) { val x = a.getLong(i); na += x * x; i += 1 }
    i = m
    while (i < lb) { val y = b.getLong(i); nb += y * y; i += 1 }
    cosMicroParts(dot, na, nb)
  }
}

/** Bit-exact integer-micro IVF centroid index — the [[IvfIndex]] shape
  * (one serializable reference object, O(1) plan size in centroid count)
  * over [[ExactMicroOps]] arithmetic. Assignment ranks cells by
  * (cosMicro desc, id asc): pure integer comparisons, so the argmax is
  * identical on every engine with NO rounding band, lazy or otherwise.
  * `ids` must be sorted ascending (index order = id order, making the
  * tie-break a plain earliest-wins scan). */
final class IvfIndexMicro(val ids: Array[Long], cents: Array[Array[Long]])
    extends Serializable {
  require(ids.length == cents.length && ids.nonEmpty, "empty/ragged centroid set")
  require(ids.toSeq == ids.toSeq.sorted, "centroid ids must be ascending")

  private val normsSq: Array[Long] = cents.map { cv =>
    var acc = 0L; var i = 0
    while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
    require(acc <= ExactMicroOps.MaxNormSq, s"centroid norm² $acc out of envelope")
    acc
  }

  def size: Int = ids.length

  /** Ids of the `topN` nearest centroids by (exact cosMicro desc, id asc). */
  def nearestCells(v: ArrayData, topN: Int): ArrayData = {
    val n = ids.length
    val d = v.numElements()
    var vAcc = 0L
    var i = 0
    while (i < d) { val x = v.getLong(i); vAcc += x * x; i += 1 }
    val sims = new Array[Long](n)
    var c = 0
    while (c < n) {
      val cv = cents(c)
      val m = math.min(d, cv.length)
      var dot = 0L
      i = 0
      while (i < m) { dot += v.getLong(i) * cv(i); i += 1 }
      sims(c) = ExactMicroOps.cosMicroParts(dot, vAcc, normsSq(c))
      c += 1
    }
    val k = math.min(topN, n)
    val out = new Array[Long](k)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < k) {
      var best = -1
      c = 0
      while (c < n) {
        // strict > keeps the earliest (lowest-id) centroid on exact ties
        if (!taken(c) && (best < 0 || sims(c) > sims(best))) best = c
        c += 1
      }
      taken(best) = true
      out(r) = ids(best)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd exact integer square root of a non-negative BIGINT —
  * [[ExactMicroOps.isqrt]] lifted to a column (the per-row form the
  * cartography variability readout needs: isqrt(T·Σp² − (Σp)²)). */
case class IsqrtLong(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"isqrt_long expects BIGINT, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "isqrt_long"

  override protected def nullSafeEval(input: Any): Any =
    ExactMicroOps.isqrtLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ExactMicroOps.isqrtLong($x);")

  override protected def withNewChildInternal(newChild: Expression): IsqrtLong =
    copy(child = newChild)
}

/** Codegen'd [[ExactMicroOps.log2Micro]] over a positive BIGINT column —
  * the in-plan form of the shared fixed-point log2 kernel (per-row,
  * so vocabulary-sized relations never leave the executors). */
case class Log2MicroExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"log2_micro expects BIGINT, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "log2_micro"

  override protected def nullSafeEval(input: Any): Any =
    ExactMicroOps.log2Micro(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ExactMicroOps.log2Micro($x);")

  override protected def withNewChildInternal(newChild: Expression): Log2MicroExpr =
    copy(child = newChild)
}

/** Codegen'd [[ExactMicroOps.exp2Micro]] over a BIGINT micro exponent —
  * the in-plan exact 2^x kernel (exponentiated-gradient updates). The
  * caller clamps into the [−64·10⁶, 43·10⁶) envelope; out-of-envelope
  * inputs fail loudly (the kernel's require), never silently. */
case class Exp2MicroExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exp2_micro expects BIGINT, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "exp2_micro"

  override protected def nullSafeEval(input: Any): Any =
    ExactMicroOps.exp2Micro(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ExactMicroOps.exp2Micro($x);")

  override protected def withNewChildInternal(newChild: Expression): Exp2MicroExpr =
    copy(child = newChild)
}

/** Codegen'd [[ExactMicroOps.sigmoidMicro]] over a BIGINT micro margin —
  * the in-plan exact logistic link of the integer-GD training path. */
case class SigmoidMicroExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sigmoid_micro expects BIGINT, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "sigmoid_micro"

  override protected def nullSafeEval(input: Any): Any =
    ExactMicroOps.sigmoidMicro(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ExactMicroOps.sigmoidMicro($x);")

  override protected def withNewChildInternal(newChild: Expression): SigmoidMicroExpr =
    copy(child = newChild)
}

/** Codegen'd exact integer-micro cosine over two ARRAY<BIGINT> micro
  * vectors ([[ExactMicroOps.cosMicro]]) — the pairwise-sim kernel of the
  * engine-portable similarity path. */
case class CosMicro(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cos_micro expects two ARRAY<BIGINT> micro vectors, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "cos_micro"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExactMicroOps.cosMicro(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ExactMicroOps.cosMicro($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosMicro =
    copy(left = l, right = r)
}

/** Nearest-centroid assignment against a driver-built [[IvfIndexMicro]]
  * over an ARRAY<BIGINT> micro vector column — [[NearestCells]]' exact
  * sibling for the bit-exact similarity path. */
case class NearestCellsMicro(child: Expression, index: IvfIndexMicro, topN: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if topN > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells_micro expects (ARRAY<BIGINT>, topN>0), got ${child.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells_micro"

  override protected def nullSafeEval(input: Any): Any =
    index.nearestCells(input.asInstanceOf[ArrayData], topN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("ivfIndexMicro", index, classOf[IvfIndexMicro].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $idx.nearestCells($a, $topN);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsMicro =
    copy(child = newChild)
}

/** Nearest-centroid assignment against a driver-built [[IvfIndex]]:
  * returns the `topN` best cell ids as ArrayType(Long). The index rides
  * along as one reference object, so plan size is independent of the
  * centroid count (the fix for the lit-per-element formulation that
  * exploded at a few thousand centroids). */
case class NearestCells(child: Expression, index: IvfIndex, topN: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if topN > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects (ARRAY<FLOAT>, topN>0), got ${child.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any =
    index.nearestCells(input.asInstanceOf[ArrayData], topN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("ivfIndex", index, classOf[IvfIndex].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $idx.nearestCells($a, $topN);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** Sign-LSH hyperplane set as a single reference object (same plan-size
  * rationale as [[IvfIndex]]): bit p of the bucket is sign(v·plane_p),
  * dotFD-promoted exactly like the literal-array formulation it replaces. */
final class PlaneSet(planes: Array[Array[Double]]) extends Serializable {
  require(planes.nonEmpty && planes.length <= 63, "1..63 planes")

  def bucket(v: ArrayData): Long = {
    var b = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val m = math.min(v.numElements(), pl.length)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += v.getFloat(i).toDouble * pl(i); i += 1 }
      if (acc >= 0) b |= (1L << p)
      p += 1
    }
    b
  }
}

/** Sign-LSH bucket id over an ArrayType(Float) column. */
case class SignLshBucket(child: Expression, planeSet: PlaneSet)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_bucket expects ARRAY<FLOAT>, got ${child.dataType.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"

  override protected def nullSafeEval(input: Any): Any =
    planeSet.bucket(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("planeSet", planeSet, classOf[PlaneSet].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ps.bucket($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}

/** Dense projection matrix as a single reference object (plan-size
  * rationale of [[IvfIndex]]/[[PlaneSet]]): out[j] = Σᵢ v[i]·m[j][i],
  * dotFD-promoted left-to-right — the fixed fold order keeps results
  * bit-stable and oracle-exact. */
final class ProjMatrix(rows: Array[Array[Double]]) extends Serializable {
  require(rows.nonEmpty, "empty projection matrix")

  def outDim: Int = rows.length

  def project(v: ArrayData): ArrayData = {
    val out = new Array[Double](rows.length)
    var j = 0
    while (j < rows.length) {
      val r = rows(j)
      val m = math.min(v.numElements(), r.length)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += v.getFloat(i).toDouble * r(i); i += 1 }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Matrix-vector projection of an ArrayType(Float) column against a
  * driver-built [[ProjMatrix]]. */
case class VecProject(child: Expression, matrix: ProjMatrix)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_project expects ARRAY<FLOAT>, got ${child.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_project"

  override protected def nullSafeEval(input: Any): Any =
    matrix.project(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("projMatrix", matrix, classOf[ProjMatrix].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $m.project($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecProject =
    copy(child = newChild)
}

/** Product-quantization codebook (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011) as a single
  * reference object — same plan-size rationale as [[IvfIndex]]: m·k·subDim
  * centroid elements ride the plan as ONE object, not per-element literals.
  *
  * All arithmetic is EXACT integer micro-units, so encoding and ADC
  * distances are bit-reproducible across engines (the oracle replays them
  * in SQL): an element quantizes to floor(x·10⁶) (a long), a sub-distance
  * is Σᵢ(xᵢ−cᵢ)² over longs, ties break to the LOWEST cell (strict `<`
  * scan). Envelope: |element| ≤ 30 keeps every per-subspace sum inside a
  * long for subDim ≤ 1024 ((6·10⁷)²·1024 < 2⁶³); the unit-normalized
  * embeddings this engine quantizes sit far inside it.
  *
  * `books(s)(c)` is the micro-unit centroid of cell `c` in subspace `s`;
  * all subspaces share the cell count k. */
final class PqCodebook(val subDim: Int, books: Array[Array[Array[Long]]])
    extends Serializable {
  require(books.nonEmpty && books.forall(_.length == books(0).length) &&
    books(0).nonEmpty, "empty/ragged codebook")

  /** Number of subspaces. */
  def m: Int = books.length
  /** Cells per subspace. */
  def k: Int = books(0).length

  @inline private def micro(x: Float): Long =
    math.floor(x.toDouble * 1000000.0).toLong

  private def subDist(v: ArrayData, s: Int, cm: Array[Long]): Long = {
    var d = 0L
    var i = 0
    val base = s * subDim
    while (i < subDim) {
      val diff = micro(v.getFloat(base + i)) - cm(i)
      d += diff * diff
      i += 1
    }
    d
  }

  /** As [[subDist]] but over an ALREADY-micro long-array vector — the
    * residual-space input ([[graft.ops.Pq.trainResidualPq]]'s v_micro −
    * coarse-centroid arrays), which must not be re-quantized. */
  private def subDistMicro(v: ArrayData, s: Int, cm: Array[Long]): Long = {
    var d = 0L
    var i = 0
    val base = s * subDim
    while (i < subDim) {
      val diff = v.getLong(base + i) - cm(i)
      d += diff * diff
      i += 1
    }
    d
  }

  private def encodeWith(v: ArrayData, dist: (ArrayData, Int, Array[Long]) => Long): ArrayData = {
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val d = dist(v, s, book(c))
        // strict < keeps the lowest cell on exact-integer ties
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toLong
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Code (cell id) per subspace: exact-integer L2 argmin, ties to the
    * lowest cell. */
  def encode(v: ArrayData): ArrayData = encodeWith(v, subDist)

  /** [[encode]] over an ARRAY<BIGINT> micro-unit vector. */
  def encodeMicro(v: ArrayData): ArrayData = encodeWith(v, subDistMicro)

  /** Asymmetric distance (ADC): exact micro-unit squared L2 between the
    * RAW query vector and the code-addressed centroids — the query pays
    * full precision, the corpus only its m-byte code. */
  def adc(q: ArrayData, codes: ArrayData): Long = {
    var total = 0L
    var s = 0
    while (s < m) {
      total += subDist(q, s, books(s)(codes.getLong(s).toInt))
      s += 1
    }
    total
  }

  /** [[adc]] over an ARRAY<BIGINT> micro-unit query vector. */
  def adcMicro(q: ArrayData, codes: ArrayData): Long = {
    var total = 0L
    var s = 0
    while (s < m) {
      total += subDistMicro(q, s, books(s)(codes.getLong(s).toInt))
      s += 1
    }
    total
  }
}

/** PQ encoding of a vector against a driver-built [[PqCodebook]]:
  * ArrayType(Long) of one cell id per subspace. Accepts ARRAY<FLOAT>
  * (raw vectors, floor(x·10⁶) quantization inside the kernel) or
  * ARRAY<BIGINT> (already-micro residual vectors — no re-quantization). */
case class PqEncode(child: Expression, codebook: PqCodebook)
    extends UnaryExpression {

  private def micro: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects ARRAY<FLOAT> or ARRAY<BIGINT>, got ${child.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    if (micro) codebook.encodeMicro(input.asInstanceOf[ArrayData])
    else codebook.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, classOf[PqCodebook].getName)
    val fn = if (micro) "encodeMicro" else "encode"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cb.$fn($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC distance between a query vector (ARRAY<FLOAT> raw, or
  * ARRAY<BIGINT> micro-unit residual) and an ArrayType(Long) PQ code
  * word, against a driver-built [[PqCodebook]]. */
case class PqAdc(left: Expression, right: Expression, codebook: PqCodebook)
    extends BinaryExpression {

  private def micro: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (ARRAY<FLOAT>|ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    if (micro) codebook.adcMicro(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])
    else codebook.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, classOf[PqCodebook].getName)
    val fn = if (micro) "adcMicro" else "adc"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cb.$fn($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
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
  def isqrt_long(c: Column): Column =
    shim.column(IsqrtLong(shim.expression(c)))
  def log2_micro(c: Column): Column =
    shim.column(Log2MicroExpr(shim.expression(c)))
  def sigmoid_micro(c: Column): Column =
    shim.column(SigmoidMicroExpr(shim.expression(c)))
  def exp2_micro(c: Column): Column =
    shim.column(Exp2MicroExpr(shim.expression(c)))
  def min_window_md5(c: Column, window: Int): Column =
    shim.column(MinWindowMd5(shim.expression(c), window))
  def nearest_cells(v: Column, index: IvfIndex, topN: Int): Column =
    shim.column(NearestCells(shim.expression(v), index, topN))
  def cos_micro(a: Column, b: Column): Column =
    shim.column(CosMicro(shim.expression(a), shim.expression(b)))
  def nearest_cells_micro(v: Column, index: IvfIndexMicro, topN: Int): Column =
    shim.column(NearestCellsMicro(shim.expression(v), index, topN))
  def vec_project(v: Column, matrix: ProjMatrix): Column =
    shim.column(VecProject(shim.expression(v), matrix))
  def sign_lsh_bucket(v: Column, planeSet: PlaneSet): Column =
    shim.column(SignLshBucket(shim.expression(v), planeSet))
  def pq_encode(v: Column, codebook: PqCodebook): Column =
    shim.column(PqEncode(shim.expression(v), codebook))
  def pq_adc(q: Column, codes: Column, codebook: PqCodebook): Column =
    shim.column(PqAdc(shim.expression(q), shim.expression(codes), codebook))
}
