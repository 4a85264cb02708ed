package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded-memory k-minimum-values aggregate: the k smallest DISTINCT
  * long values of the input, as an ascending array — the state a KMV
  * cardinality sketch (Bar-Yossef et al. 2002) actually needs, computed
  * WITHOUT any distinct shuffle.
  *
  * This is the aggregate that makes the sketch path cheaper than the
  * exact count at scale: the declarative formulation (global
  * `.distinct()` then a top-k window) pays an Exchange whose input is
  * every n-gram instance and whose output is the full vocabulary — the
  * one thing a sketch exists to avoid. Here each task folds its rows
  * into a capped in-memory sorted set (≤ k longs — partition-local
  * dedup falls out of the set semantics, no pre-aggregation needed),
  * and only the serialized ≤ k-long states cross the wire: the final
  * merge reads ≤ tasks·k values per group. Partial aggregation is
  * Spark's own ObjectHashAggregate machinery (the
  * ApproximatePercentile deployment shape), so map-side combine,
  * spill, and buffer serialization all come for free.
  *
  * Determinism: the k smallest distinct values of a multiset are
  * independent of row order and partitioning, so the result — unlike
  * most imperative aggregates — is engine-exact and oracle-checkable:
  * DuckDB's rank-over-distinct picks the identical minima. NULL inputs
  * are ignored; an empty group evaluates to an empty array; a group
  * with fewer than k distinct values returns ALL of them (the
  * saturated case, where the sketch IS the exact set). */
case class KmvMinima(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 1, s"kmv_minima needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_minima"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], x: Long): Unit = {
    // capped insert: below capacity always; at capacity only values
    // smaller than the current k-th minimum displace it. TreeSet.add
    // returning false = duplicate, which must not evict anything.
    if (buf.size < k || x < buf.last()) {
      if (buf.add(x) && buf.size > k) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    // b2 ascends, so once a value fails the capped insert every later
    // one would too — but insert() already short-circuits; keep the
    // loop simple and bounded by |b2| ≤ k
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinima =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinima =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinima =
    copy(child = newChild)
}

object KmvMinima {

  /** Column-level entry: ascending array of the k smallest distinct
    * longs in `c` per group. */
  def kmvMinima(c: Column, k: Int): Column =
    ColumnBridge.column(KmvMinima(ColumnBridge.expr(c), k).toAggregateExpression())
}
