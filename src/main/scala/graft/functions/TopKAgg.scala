package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the `k` smallest `(distance, id)` pairs
  * of a group in a size-capped max-heap — the distributed twin of the
  * reference's size-k+1 BinaryHeap (`src/cores/index.rs:201-209`), as a
  * first-class Catalyst aggregate.
  *
  * This replaces the `slice(sort_array(collect_list(struct(d, id))), 1, k)`
  * formulation in per-group top-k: `collect_list` buffers the WHOLE group
  * before slicing (memory ∝ group size — the map-side group of a batch
  * kNN is the query's full candidate slice of a partition), while this
  * buffer never exceeds k entries regardless of group size, and merges
  * partial-aggregate heaps pairwise. Output: array<struct<distance,id>>
  * ascending by (distance, id) — identical to the sliced-sort result.
  */
case class TopKPairsAgg(
    distance: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsAgg.Heap] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(distance, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("distance", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKPairsAgg.Heap =
    new TopKPairsAgg.Heap(k)

  override def update(buf: TopKPairsAgg.Heap, input: InternalRow): TopKPairsAgg.Heap = {
    val d = distance.eval(input)
    val i = id.eval(input)
    if (d != null && i != null)
      buf.offer(d.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKPairsAgg.Heap, b: TopKPairsAgg.Heap): TopKPairsAgg.Heap = {
    b.foreach(a.offer)
    a
  }

  override def eval(buf: TopKPairsAgg.Heap): Any = {
    val sorted = buf.sortedAscending
    new GenericArrayData(sorted.map { case (d, i) =>
      InternalRow(d, i)
    }.toArray[Any])
  }

  override def serialize(buf: TopKPairsAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.sortedAscending
    out.writeInt(entries.length)
    entries.foreach { case (d, i) => out.writeDouble(d); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = new TopKPairsAgg.Heap(k)
    (0 until n).foreach(_ => heap.offer(in.readDouble(), in.readLong()))
    heap
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(distance = newChildren(0), id = newChildren(1))
}

object TopKPairsAgg {

  /** Size-capped max-heap on (distance, id): the root is the current
    * WORST retained pair, evicted when a better pair arrives. */
  final class Heap(k: Int) {
    private val ord: Ordering[(Double, Long)] = Ordering.Tuple2[Double, Long]
    private val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
    def offer(d: Double, i: Long): Unit = {
      if (pq.size < k) pq.enqueue((d, i))
      else if (ord.lt((d, i), pq.head)) { pq.dequeue(); pq.enqueue((d, i)) }
    }
    def offer(p: (Double, Long)): Unit = offer(p._1, p._2)
    def foreach(f: ((Double, Long)) => Unit): Unit = pq.foreach(f)
    def sortedAscending: Seq[(Double, Long)] = pq.toSeq.sorted(ord)
  }

  /** `Column` form: array<struct<distance,id>> of the k smallest pairs,
    * ascending — drop-in for `slice(sort_array(collect_list(...)), 1, k)`. */
  def topKPairs(distance: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKPairsAgg(ColumnBridge.expression(distance), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
