package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native BPE token counter: a words array → the total number of BPE
  * tokens under a FIXED merges table (the `PqEncode` pattern — the
  * metadata-sized vocab rides the expression as a reference object, so
  * corpus counting is ONE map-only pass, no join, no explode, no
  * per-word shuffle).
  *
  * Apply semantics (shared verbatim with the DuckDB oracle): each word
  * starts as its character sequence; merges apply IN RANK ORDER, one
  * left-to-right non-overlapping sweep each. For a merges table
  * produced by BPE training this is equivalent to the classic
  * lowest-rank-pair-first loop: applying merge r can only create the
  * symbol `ab`, and every merge consuming `ab` was created after it —
  * i.e. has a higher rank — so no pair of rank ≤ r ever reappears
  * once rank r's sweep is done (symbols only become adjacent when a
  * merge between them fires, and that merged symbol must be one of
  * the pair's own components — created earlier by construction). The
  * oracle implements the rank-order sweep as a chain of
  * `replace('(a)(b)' → '(ab)')` over the parenthesis-wrapped symbol
  * string, whose left-to-right non-overlapping scan matches this
  * kernel symbol for symbol; FunctionsSpec pins kernel ≡ sweep on
  * random words under the checked-in vocab, the `graft.BpeScale`
  * probe re-verifies it per distinct corpus word at 4k merges, and
  * tables OUTSIDE the trained shape are rejected at construction
  * ([[BpeRuntime.requireTrainedShape]]) — on such a table the two
  * loops can genuinely disagree.
  *
  * The kernel RUNS the classic lowest-rank-first loop, not the
  * literal rank sweep: a rank sweep costs O(merges · len) per word —
  * merge-count-bound, ruinous at a realistic 32k–100k vocab — while
  * the rank-map loop is O(len²) hash lookups per word, INDEPENDENT of
  * vocab size (the r9→r10 change that makes real-tokenizer vocabs
  * practical; BpeScale measures throughput flat in merge count).
  */
case class BpeCount(child: Expression, merges: Array[Array[String]],
                    byteBase: Boolean = false)
    extends UnaryExpression {

  // the classic loop is only sweep-equivalent on trained-shape tables
  // — reject the rest loudly instead of silently diverging from the
  // SQL oracle (see BpeRuntime.requireTrainedShape)
  BpeRuntime.requireTrainedShape(merges)
  if (byteBase) BpeRuntime.requireByteSymbols(merges)

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  // resolved-time check (construction sees an unresolved child);
  // lazy so the hot loop pays it once
  private lazy val checkInput: Unit = child.dataType match {
    case ArrayType(StringType, _) => ()
    case t => throw new IllegalArgumentException(s"bpe_count needs array<string>, got $t")
  }

  /** codegen + interpreted entry point */
  def evalTokens(ws: ArrayData): Long = {
    checkInput
    var total = 0L
    var wi = 0
    val n = ws.numElements()
    while (wi < n) {
      total += countWord(ws.getUTF8String(wi).toString)
      wi += 1
    }
    total
  }

  @transient private lazy val rank = BpeRuntime.rankMap(merges)

  private def countWord(w0: String): Long = {
    // byte base: segment the word's UTF-8 BYTES (the encoder's
    // alphabet), so count ≡ encode length for ANY text, not just
    // single-byte — the shared-segmentation contract
    val w = if (byteBase) BpeRuntime.toByteChars(w0) else w0
    if (w.isEmpty) return 0L
    if (w.length == 1) return 1L
    BpeRuntime.encodeWord(w, merges, rank).size.toLong
  }

  // case-class equality on Array falls back to reference identity,
  // which would make two semantically identical bpe_count expressions
  // never compare equal — defeating Catalyst canonicalization and
  // common-subexpression elimination. Compare merge CONTENTS.
  override def equals(o: Any): Boolean = o match {
    case b: BpeCount =>
      child == b.child && byteBase == b.byteBase && java.util.Arrays.deepEquals(
        merges.asInstanceOf[Array[AnyRef]], b.merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + (if (byteBase) 1 else 0)) +
      java.util.Arrays.deepHashCode(merges.asInstanceOf[Array[AnyRef]])

  override def nullSafeEval(a: Any): Any = evalTokens(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeCount", this, classOf[BpeCount].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = (long) $self.evalTokens($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
