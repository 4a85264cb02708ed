package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native BPE ENCODER: a words array → the flat token-ID sequence the
  * training loader actually consumes ([[BpeCount]] is its counting
  * shadow — same segmentation via the shared [[BpeRuntime]] loop, so
  * `size(bpe_encode(ws)) == bpe_count(ws)` by construction). One
  * map-only pass, the metadata-sized vocab riding the expression as a
  * reference object — no join, no per-word shuffle, the x8 shape.
  *
  * VOCAB ID CONTRACT (public, deterministic, shared verbatim with the
  * SQL oracle), parameterized by the BASE ALPHABET:
  *
  *  - `byteBase = false` (the x12 contract): ids 0–35 are the fixed
  *    base alphabet `a..z 0..9` (the only symbols
  *    `TextAnalysis.words` can emit); merge r's symbol gets 36 + r.
  *  - `byteBase = true` (the GPT-2-style byte-level contract): each
  *    word is first encoded to UTF-8 BYTES; ids 0–255 are the 256
  *    byte symbols — a base symbol's id IS its byte value — and merge
  *    r's symbol gets 256 + r. TRUE byte-level: any text encodes
  *    (a multi-byte char decomposes into its UTF-8 bytes — 'é' →
  *    [0xC3, 0xA9]), never an out-of-vocab error, no per-deployment
  *    alphabet. Merge-table symbols are accordingly byte strings
  *    (each char ≤ 0xFF, enforced at construction) — for ASCII-
  *    trained tables, identical to their plain text.
  *
  * The mapping is by SYMBOL STRING, which requires the table's merged
  * strings to be distinct — enforced at construction via
  * [[BpeRuntime.requireTrainedShape]] (two merges can in principle
  * produce the same string, e.g. (a,bc) and (ab,c) → "abc", and a
  * string-keyed oracle could not tell their ids apart).
  */
case class BpeEncodeIds(child: Expression, merges: Array[Array[String]],
                        byteBase: Boolean = false)
    extends UnaryExpression {

  // distinct merged strings (the id-map precondition) is enforced for
  // both kernels inside requireTrainedShape
  BpeRuntime.requireTrainedShape(merges)
  if (byteBase) BpeRuntime.requireByteSymbols(merges)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  private lazy val checkInput: Unit = child.dataType match {
    case ArrayType(StringType, _) => ()
    case t => throw new IllegalArgumentException(s"bpe_encode needs array<string>, got $t")
  }

  @transient private lazy val rank = BpeRuntime.rankMap(merges)

  /** Offset of merge-symbol ids: the base alphabet's size. */
  private def mergeIdBase: Int = if (byteBase) 256 else 36

  /** symbol string → vocab id (base alphabet first, then merges). */
  @transient private lazy val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](mergeIdBase + merges.length * 2)
    if (byteBase) {
      var c = 0
      while (c < 256) { m.put(String.valueOf(c.toChar), Integer.valueOf(c)); c += 1 }
    } else {
      val base = "abcdefghijklmnopqrstuvwxyz0123456789"
      var i = 0
      while (i < base.length) { m.put(String.valueOf(base.charAt(i)), Integer.valueOf(i)); i += 1 }
    }
    var r = 0
    while (r < merges.length) { m.put(merges(r)(2), Integer.valueOf(mergeIdBase + r)); r += 1 }
    m
  }

  /** codegen + interpreted entry point */
  def evalIds(ws: ArrayData): ArrayData = {
    checkInput
    val out = new java.util.ArrayList[Any](ws.numElements() * 4)
    var wi = 0
    val n = ws.numElements()
    while (wi < n) {
      val w0 = ws.getUTF8String(wi).toString
      // byte base: symbols are UTF-8 BYTES, carried as chars 0–255 —
      // any input encodes, nothing is out-of-vocab by construction
      val w = if (byteBase) BpeRuntime.toByteChars(w0) else w0
      if (w.nonEmpty) {
        val syms = BpeRuntime.encodeWord(w, merges, rank)
        var j = 0
        while (j < syms.size) {
          val id = idOf.get(syms.get(j))
          if (id == null)
            throw new IllegalStateException(s"symbol '${syms.get(j)}' outside the vocab " +
              "(input must be TextAnalysis.words output: [a-z0-9]+)")
          out.add(id.intValue())
          j += 1
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  // content-based equality, the BpeCount rationale
  override def equals(o: Any): Boolean = o match {
    case b: BpeEncodeIds =>
      child == b.child && byteBase == b.byteBase && java.util.Arrays.deepEquals(
        merges.asInstanceOf[Array[AnyRef]], b.merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + (if (byteBase) 1 else 0)) +
      java.util.Arrays.deepHashCode(merges.asInstanceOf[Array[AnyRef]])

  override def nullSafeEval(a: Any): Any = evalIds(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncodeIds].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalIds($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
