package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a BROADCAST Bloom sketch — the
  * map-side prefilter that makes huge semi-joins cheap when the probe
  * key set is too large to broadcast exactly but its SKETCH is not
  * (e.g. 10⁸ eval grams ≈ GBs of md5 strings vs ~10⁸·10 bits ≈ 120 MB
  * of Bloom at 1% fpp). False positives survive the filter (a later
  * exact join kills them); false negatives cannot occur, so composing
  * `filter(bloom) → exact join` is RESULT-IDENTICAL to the plain join
  * while shuffling only `fpp · |input| + |matches|` rows.
  *
  * The sketch rides a Spark Broadcast (torrent-distributed once per
  * executor, not per task, exactly like a broadcast-hash-join build
  * side); the probe itself is one virtual call per row inside
  * whole-stage codegen (the `BpeCount` reference-object pattern).
  * `label` names the sketch in plans and keeps two filters over
  * different sketches from canonicalizing together.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter],
                             label: String)
    extends UnaryExpression with Predicate {

  override def prettyName: String = s"bloom_might_contain_$label"

  private lazy val checkInput: Unit = child.dataType match {
    case LongType => ()
    case t => throw new IllegalArgumentException(s"bloom_might_contain needs a LONG key, got $t")
  }

  /** codegen + interpreted entry point */
  def test(v: Long): Boolean = { checkInput; bloom.value.mightContainLong(v) }

  override def nullSafeEval(a: Any): Any = test(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomMc", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.test($v);")
  }

  // Broadcast handles have no content equality; two probes are the
  // same expression only when they probe the same broadcast id with
  // the same key (label disambiguates logically distinct sketches
  // that might share an id across sessions)
  override def equals(o: Any): Boolean = o match {
    case b: BloomMightContain =>
      child == b.child && label == b.label && bloom.id == b.bloom.id
    case _ => false
  }
  override def hashCode(): Int =
    (31 * child.hashCode + label.hashCode) * 31 + bloom.id.hashCode

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
