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
  * once rank r's sweep is done. The oracle implements the exact same
  * sweep as a chain of `replace('(a)(b)' → '(ab)')` over the
  * parenthesis-wrapped symbol string, whose left-to-right
  * non-overlapping scan matches this fold symbol for symbol.
  */
case class BpeCount(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {

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

  private def countWord(w: String): Long = {
    if (w.isEmpty) return 0L
    var cur = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) { cur.add(String.valueOf(w.charAt(i))); i += 1 }
    var mi = 0
    while (mi < merges.length && cur.size > 1) {
      val a = merges(mi)(0); val b = merges(mi)(1); val ab = merges(mi)(2)
      val out = new java.util.ArrayList[String](cur.size)
      var j = 0
      while (j < cur.size) {
        val s = cur.get(j)
        if (!out.isEmpty && out.get(out.size - 1) == a && s == b)
          out.set(out.size - 1, ab) // merged symbol can't re-match: ab != a
        else out.add(s)
        j += 1
      }
      cur = out
      mi += 1
    }
    cur.size.toLong
  }

  // case-class equality on Array falls back to reference identity,
  // which would make two semantically identical bpe_count expressions
  // never compare equal — defeating Catalyst canonicalization and
  // common-subexpression elimination. Compare merge CONTENTS.
  override def equals(o: Any): Boolean = o match {
    case b: BpeCount =>
      child == b.child && java.util.Arrays.deepEquals(
        merges.asInstanceOf[Array[AnyRef]], b.merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode + java.util.Arrays.deepHashCode(
      merges.asInstanceOf[Array[AnyRef]])

  override def nullSafeEval(a: Any): Any = evalTokens(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeCount", this, classOf[BpeCount].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = (long) $self.evalTokens($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
