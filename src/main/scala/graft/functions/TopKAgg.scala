package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._

/** Native bounded top-k-by-distance aggregate: a `TypedImperativeAggregate`
  * over [[TopKHeap]], so the hot path reads (id, dist) straight from
  * InternalRows — no per-row encoder round-trip (the `udaf()` wrapper
  * deserializes every input row into a case class; at millions of candidate
  * pairs that dominates the kNN profile). The buffer is the heap object
  * itself; serialization happens only at shuffle boundaries.
  *
  * Semantics identical to [[TopKAggregator]]: keep the k smallest
  * (dist, id) pairs, emit them ascending.
  */
case class TopKNeighborsAgg(k: Int, idExpr: Expression, distExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(idExpr, distExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("dist", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_neighbors"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val id = idExpr.eval(input)
    val d = distExpr.eval(input)
    if (id != null && d != null) {
      buf.add(id.asInstanceOf[Long], d.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = buf.mergeIn(other)

  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sorted
    new GenericArrayData(sorted.map { n =>
      new GenericInternalRow(Array[Any](n.id, n.dist))
    }.toArray[Any])
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ids(i)).putDouble(buf.dists(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt(); val n = bb.getInt()
    val h = new TopKHeap(kk)
    var i = 0
    while (i < n) { h.add(bb.getLong(), bb.getDouble()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKNeighborsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKNeighborsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKNeighborsAgg =
    copy(idExpr = newChildren(0), distExpr = newChildren(1))
}

object TopKNeighborsAgg {
  /** Column form: `topk(k, id, dist)` → array<struct<id,dist>> */
  def topk(k: Int, id: Column, dist: Column): Column =
    GraftShims.column(
      TopKNeighborsAgg(k, GraftShims.expression(id), GraftShims.expression(dist))
        .toAggregateExpression())
}
