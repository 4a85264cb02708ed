package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * h = Σ byte·31^i  mod 1e9+7 (unsigned bytes, left-to-right fold) —
  * the document-fingerprint kernel.
  *
  * The pure-functions formulation (`aggregate(transform(sequence(1,
  * length(s)), i -> ascii(substr(s, i, 1))), ...)`) materializes an int
  * array and a single-char string per character; this expression is one
  * tight loop over the existing UTF8String bytes inside whole-stage
  * codegen — the difference between a fingerprint pass being
  * memory-bound and allocation-bound at corpus scale. Byte-wise ≡
  * codepoint-wise on ASCII (which the oracle's per-char ascii() checks).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31L + (bytes(i) & 0xffL)) % 1000000007L; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {

  /** Static kernel called from generated code (and usable directly). */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31L + (bytes(i) & 0xffL)) % 1000000007L; i += 1 }
    h
  }

  def polyHash(c: Column): Column = ColumnBridge.column(PolyHash(ColumnBridge.expr(c)))
}
