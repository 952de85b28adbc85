package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType}

/** Native aggregate: per-node triangle contributions of the
  * compact-forward closing, accumulated straight into a long→long map —
  * one update per EDGE instead of one Spark row per TRIANGLE.
  *
  * For each input (src, dst, I = N⁺(src) ∩ N⁺(dst)): src and dst each
  * earn |I| triangles, every c ∈ I earns 1. The r10 plan emitted those
  * as |I| + 2 struct rows per edge through explode + hash agg — 124 M
  * rows at sf0.1, half the query's cost in pure row-pipeline overhead.
  * Here the same arithmetic happens inside the aggregate's update loop;
  * Spark only ever sees one buffer per partition.
  *
  * Memory shape: each partial buffer is bounded by the distinct nodes
  * seen in that partition — IDENTICAL to the hash-agg map the explode
  * shape maintains per task — but the FINAL merge materializes the
  * whole node-grain map in one task, so callers gate this path on the
  * node count (Graph.triangleCounts switches to the explode shape past
  * the gate, where the node-grain result must stay distributed).
  */
case class TriangleContribs(
    src: Expression,
    dst: Expression,
    inter: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(src, dst, inter)

  override def nullable: Boolean = false

  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (src.dataType, dst.dataType, inter.dataType) match {
      case (LongType, LongType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, d, i) => TypeCheckResult.TypeCheckFailure(
        s"triangle_contribs needs (bigint, bigint, array<bigint>), got ($s, $d, $i)")
    }

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty[Long]

  override def update(buf: scala.collection.mutable.LongMap[Long],
                      input: InternalRow): scala.collection.mutable.LongMap[Long] = {
    val iv = inter.eval(input)
    if (iv != null) {
      val arr = iv.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n > 0) {
        val s = src.eval(input).asInstanceOf[Long]
        val d = dst.eval(input).asInstanceOf[Long]
        buf(s) = buf.getOrElse(s, 0L) + n
        buf(d) = buf.getOrElse(d, 0L) + n
        var i = 0
        while (i < n) {
          val c = arr.getLong(i)
          buf(c) = buf.getOrElse(c, 0L) + 1L
          i += 1
        }
      }
    }
    buf
  }

  override def merge(b1: scala.collection.mutable.LongMap[Long],
                     b2: scala.collection.mutable.LongMap[Long]): scala.collection.mutable.LongMap[Long] = {
    b2.foreach { case (k, v) => b1(k) = b1.getOrElse(k, 0L) + v }
    b1
  }

  override def eval(buf: scala.collection.mutable.LongMap[Long]): Any = {
    val ks = new Array[Long](buf.size)
    val vs = new Array[Long](buf.size)
    var i = 0
    buf.foreach { case (k, v) => ks(i) = k; vs(i) = v; i += 1 }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override def serialize(buf: scala.collection.mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new scala.collection.mutable.LongMap[Long](math.max(n, 1))
    var i = 0
    while (i < n) { buf(bb.getLong) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TriangleContribs =
    copy(mutableAggBufferOffset = n)

  override def withNewInputAggBufferOffset(n: Int): TriangleContribs =
    copy(inputAggBufferOffset = n)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TriangleContribs =
    copy(src = newChildren(0), dst = newChildren(1), inter = newChildren(2))

  override def prettyName: String = "triangle_contribs"
}
