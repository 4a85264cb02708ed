package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The higher-order-function route (`aggregate(zip_with(a, b, *), ...)`)
  * allocates a lambda frame per element and defeats whole-stage codegen —
  * at 2M candidate pairs × 64 dims that was ~24 s. This expression
  * generates a tight primitive loop inside whole-stage codegen
  * (`doGenCode`), accumulating float (or double) elements in double
  * precision — identical numerics, ~20× faster, and the hot inner loop a
  * 100 TB similarity pass actually spends its time in.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"dot_product needs array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    // element accessors per SIDE — a float×double mix (e.g. raw vectors
    // against trained double centroids) must not read float storage as
    // doubles; this interpreted path serves higher-order-function
    // lambdas, where codegen never runs
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val getL = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val getR = if (elemIsFloat(right)) "getFloat" else "getDouble"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$a.$getL($i) * (double)$b.$getR($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for a random-hyperplane LSH sketch: bit p
  * of the result is sign(v · plane_p), all `bits` planes in one pass.
  *
  * The declarative route (`aggregate(zip_with(v, signs, *), ...)` per
  * bit) allocates a lambda frame per element per plane — measured ~3 s
  * of pure sketching on a 4k×64-dim corpus with 64 planes. This
  * generates one tight two-level loop inside whole-stage codegen. The
  * accumulation order (dimension-ascending, double precision) is
  * IDENTICAL to the higher-order formulation and to DuckDB's
  * `list_inner_product`, so sketches — and therefore LSH buckets —
  * stay engine-exact for the oracle.
  */
case class HyperplaneSketch(child: Expression, signs: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // the sketch packs one bit per plane into an Int: bits >= 32 would
  // silently wrap `1 << p` and corrupt every bucket key
  require(signs.length >= 1 && signs.length <= 31,
    s"hyperplane_sketch supports 1..31 bits, got ${signs.length}")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "hyperplane_sketch"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"hyperplane_sketch needs array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    var sk = 0
    var p = 0
    while (p < signs.length) {
      val row = signs(p)
      val n = math.min(row.length, v.numElements())
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += (if (isF) v.getFloat(d).toDouble else v.getDouble(d)) * row(d)
        d += 1
      }
      if (acc > 0) sk |= (1 << p)
      p += 1
    }
    sk
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.addReferenceObj("signs", signs, "double[][]")
      val get = if (elemIsFloat) "getFloat" else "getDouble"
      val (sk, p, d, n, acc, row) = (ctx.freshName("sk"), ctx.freshName("p"),
        ctx.freshName("d"), ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("row"))
      s"""
         |int $sk = 0;
         |for (int $p = 0; $p < $s.length; $p++) {
         |  double[] $row = $s[$p];
         |  int $n = java.lang.Math.min($row.length, $v.numElements());
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += (double)$v.$get($d) * $row[$d];
         |  }
         |  if ($acc > 0) $sk |= (1 << $p);
         |}
         |${ev.value} = $sk;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The 64-bit SimHash token lane, straight from the md5 digest bytes:
  * bit j of the result = bit (j mod 16) of the 16-bit word formed by
  * digest bytes (2·⌊j/16⌋, 2·⌊j/16⌋+1) big-endian — EXACTLY the value
  * the portable formulation reads back out of
  * `conv(substring(md5(w), 1+4p, 4), 16, 10)`, so the DuckDB oracle
  * (which parses the hex) sees identical bits. Skipping the hex
  * render + 4 string parses per token is the point: this runs once
  * per token instance in the SimHash aggregation's hot loop. */
case class Md5Lane64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5_lane64"

  private def laneOf(bytes: Array[Byte]): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var lane = 0L
    var p = 0
    while (p < 4) {
      val word = ((digest(2 * p) & 0xff) << 8) | (digest(2 * p + 1) & 0xff)
      var j = 0
      while (j < 16) {
        if (((word >> j) & 1) == 1) lane |= (1L << (16 * p + j))
        j += 1
      }
      p += 1
    }
    lane
  }

  override def nullSafeEval(a: Any): Any =
    laneOf(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5lane", this, classOf[Md5Lane64].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = (long) $self.evalBytes($v.getBytes());")
  }

  /** codegen entry point */
  def evalBytes(bytes: Array[Byte]): Long = laneOf(bytes)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The 32-bit md5 head as a long — EXACTLY the value the portable
  * formulation `conv(substring(md5(x), 1, 8), 16, 10)` parses back out
  * of the hex render: digest bytes 0..3 big-endian. Skipping the
  * 32-char hex render and the base-16 string parse is the point — this
  * runs once per N-GRAM INSTANCE in the KMV sketch's hot loop (500M+
  * evaluations per corpus pass at the 5M-doc probe, where the string
  * round-trip was ~1/3 of the kernel). The digest object is
  * thread-local: MessageDigest.getInstance per row costs an allocation
  * and a provider lookup the loop doesn't need. */
case class Md5Head32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5_head32"

  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** codegen + interpreted entry point */
  def evalBytes(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  override def nullSafeEval(a: Any): Any =
    evalBytes(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5head", this, classOf[Md5Head32].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = (long) $self.evalBytes($v.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The ∞-normalized fixed-point similarity projection: f_i =
  * floor(x_i / max_j|x_j| · 2²⁰), emitted as integer-VALUED doubles
  * (an all-zero vector maps to zeros).
  *
  * This is the projection every ordering-deciding cosine in the IVF /
  * k-means family consumes (routing argmax, pair thresholds, top-k
  * ranks). The point is ENGINE-BUILD determinism: |f_i| ≤ 2²⁰, so a
  * dot product's terms are ≤ 2⁴⁰ and every PARTIAL sum is an integer
  * ≤ dims·2⁴⁰ < 2⁵³ (dims ≤ 4096) — exactly representable in double
  * no matter the accumulation order. A float cosine's value depends
  * on its summation order (SIMD/threading/version of the other
  * engine's kernel), and the r16/r17 m10 driver failure was exactly
  * two equal-by-construction routing cosines resolving in opposite
  * orders on a different DuckDB build. Every step here is a SINGLE
  * correctly-rounded IEEE op on exact operands (max is exact, x/m one
  * division, ·2²⁰ a pure exponent shift, floor exact), so Spark and
  * any DuckDB build derive bit-identical projections — and therefore
  * bit-identical cosines, argmaxes, and ranks. Cosine is invariant
  * under per-vector scaling, so the ∞-normalization changes only the
  * quantization granularity, not the semantics. */
case class FixedUnitProject(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "fixed_unit"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"fixed_unit needs array<float|double>, got $t")
  }

  /** codegen + interpreted entry point */
  def evalArray(v: ArrayData): ArrayData = {
    val isF = elemIsFloat
    val n = v.numElements()
    require(n <= 4096,
      s"fixed_unit: $n dims exceed the 2^53 exact-dot budget (dims·2^40 must stay < 2^53)")
    var m = 0.0
    var i = 0
    while (i < n) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      val a = math.abs(x)
      if (a > m) m = a
      i += 1
    }
    val out = new Array[Double](n)
    if (m > 0.0) {
      i = 0
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = math.floor(x / m * 1048576.0)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = evalArray(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("fixedUnit", this, classOf[FixedUnitProject].getName)
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalArray($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native PQ encoder: raw vector → m sub-codes in ONE per-row pass —
  * norm, fixed-point unit projection, and the per-subspace argmin over
  * the (driver-collected, metadata-sized) codebook all fused, so corpus
  * encoding is map-only with NO subspace explode, broadcast join, or
  * (id, sub)/(id) aggregation shuffles (the declarative route paid two
  * corpus-keyed Exchanges).
  *
  * Engine-exact vs the DuckDB oracle: every quantity is an INTEGER in
  * exact double range — fu = floor(x/max|x|·2^20) reproduces the shared fixed-unit projection
  * including evaluation order; Σ(fu−cw)² in long equals the oracle's
  * double ‖x‖²−2x·c+‖c‖² algebraically (all terms ≤ 2^45, exact in
  * both arithmetics); ties break to the lowest code, matching the
  * oracle's `ORDER BY l2, code`. */
case class PqEncode(child: Expression, books: Array[Array[Long]], m: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"pq_encode needs array<float|double>, got $t")
  }

  /** codegen + interpreted entry point */
  def evalArray(v: ArrayData): ArrayData = {
    val isF = elemIsFloat
    val n = v.numElements()
    // ∞-normalization, NOT L2 (changed with the r18 exactness sweep):
    // max is exact and order-independent where an L2 norm is a float
    // ACCUMULATION — a 1-ulp norm divergence on another engine build
    // flips floor() whenever x/‖v‖·2²⁰ sits on an integer, and it
    // sits EXACTLY on one for any single-nonzero-coordinate vector
    // (x/‖x‖ = 1.0) — the media head-profile populations are full of
    // those. x/max = 1.0 is a single exact division: no divergence.
    var mx = 0.0
    var d = 0
    while (d < n) {
      val x = if (isF) v.getFloat(d).toDouble else v.getDouble(d)
      val a = math.abs(x)
      if (a > mx) mx = a
      d += 1
    }
    if (mx == 0.0) throw new IllegalArgumentException(
      "pq_encode: all-zero vector cannot be encoded (x/max|x| is undefined) — " +
        "filter dead embeddings before PQ indexing")
    val fu = new Array[Long](n)
    d = 0
    while (d < n) {
      val x = if (isF) v.getFloat(d).toDouble else v.getDouble(d)
      fu(d) = math.floor(x / mx * 1048576.0).toLong; d += 1
    }
    val dsub = n / m
    // the vector must tile the codebook exactly: a dimension mismatch
    // would otherwise compare truncated codewords (or read past them)
    // and append silently wrong codes to a standing index
    val cwWidth = {
      var i = 0; var w = -1
      while (w < 0 && i < books.length) { if (books(i) != null) w = books(i).length; i += 1 }
      w
    }
    if (n % m != 0 || dsub != cwWidth) throw new IllegalArgumentException(
      s"pq_encode: vector dims $n do not tile m=$m subspaces of codeword width $cwWidth")
    val codes = new Array[Long](m)
    var sub = 0
    while (sub < m) {
      var bestCode = -1L
      var bestD2 = Long.MaxValue
      var c = 0
      while (c < ksub) {
        val cw = books(sub * ksub + c)
        if (cw != null) {
          var d2 = 0L
          var j = 0
          while (j < dsub) { val diff = fu(sub * dsub + j) - cw(j); d2 += diff * diff; j += 1 }
          if (d2 < bestD2) { bestD2 = d2; bestCode = c } // ascending c: ties keep lowest
        }
        c += 1
      }
      codes(sub) = bestCode
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override def nullSafeEval(a: Any): Any = evalArray(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalArray($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {

  /** Column-level dot product over array<float>/array<double>. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expr(a), ColumnBridge.expr(b)))

  /** L2 norm via the same codegen'd kernel. */
  def l2norm(v: Column): Column = org.apache.spark.sql.functions.sqrt(dot(v, v))

  /** ∞-normalized fixed-point similarity projection (engine-build-
    * deterministic cosine operands — see [[FixedUnitProject]]). */
  def fixedUnit(v: Column): Column =
    ColumnBridge.column(FixedUnitProject(ColumnBridge.expr(v)))

  /** 32-bit md5 head (≡ `conv(substring(md5(x), 1, 8), 16, 10)`),
    * without the hex round-trip. */
  def md5Head32(c: Column): Column =
    ColumnBridge.column(Md5Head32(ColumnBridge.expr(c)))
}
