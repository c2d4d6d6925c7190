package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Elementwise mean of float vectors as a first-class Catalyst aggregate —
  * the distributed centroid-update kernel (reference intent of O10,
  * `src/cores/index.rs:255-263`: cluster centroid = mean of members).
  *
  * The declarative alternative — `posexplode(embedding)` then
  * `avg` grouped by `(group, pos)` — multiplies the row count by the
  * vector width BEFORE the shuffle: 60k × 64-dim members become 3.8M
  * exploded rows through two exchanges per k-means iteration. This
  * aggregate keeps one `(count, Σ per dimension)` buffer per group:
  * map-side partials combine locally and the shuffle carries one
  * ~dim·8-byte buffer per (partition, group) — the textbook distributed
  * mean, with per-element arithmetic identical to `avg` (double
  * accumulate, divide by count; result cast to float like the
  * `cast("float")` the exploded form applied). */
case class VectorMeanAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    // r4-QUANTIZED DOUBLE output (⌊mean·10⁴ + ½⌋ / 10⁴) instead of the
    // float cast — the quantize-before-compare rule applied to Lloyd
    // means: the double sum is partial-merge-order-dependent in its low
    // bits, and an independent engine (the DuckDB oracle replaying a
    // deterministic build) sums in ITS order; the coarse 1e-4 grid makes
    // both land on the same value except within ~1e-13 of a grid edge,
    // so downstream distance COMPARISONS are engine-independent. The
    // float cast gave a ~2^-24 grid — three orders of magnitude more
    // edge exposure per element.
    quantized: Boolean = false)
  extends TypedImperativeAggregate[VectorMeanAgg.Buf] {

  // Buf.add reads elements with getFloat unconditionally; an
  // array<double> input (e.g. re-averaging quantized centroids) would
  // silently misread bits, so reject it at ANALYSIS time instead.
  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_mean requires array<float>, got ${other.catalogString}")
  }

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (quantized) ArrayType(DoubleType, containsNull = false)
    else ArrayType(FloatType, containsNull = false)

  override def createAggregationBuffer(): VectorMeanAgg.Buf = new VectorMeanAgg.Buf

  override def update(buf: VectorMeanAgg.Buf, input: InternalRow): VectorMeanAgg.Buf = {
    val a = vec.eval(input).asInstanceOf[ArrayData]
    if (a != null) buf.add(a)
    buf
  }

  override def merge(a: VectorMeanAgg.Buf, b: VectorMeanAgg.Buf): VectorMeanAgg.Buf = {
    a.merge(b)
    a
  }

  override def eval(buf: VectorMeanAgg.Buf): Any =
    if (buf.count == 0L) null
    else {
      val out = new Array[Any](buf.sums.length)
      var i = 0
      while (i < buf.sums.length) {
        val m = buf.sums(i) / buf.count
        out(i) =
          if (quantized) math.floor(m * 10000.0 + 0.5) / 10000.0
          else m.toFloat
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(buf: VectorMeanAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    val dim = if (buf.sums == null) 0 else buf.sums.length
    out.writeInt(dim)
    var i = 0
    while (i < dim) { out.writeDouble(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorMeanAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VectorMeanAgg.Buf
    buf.count = in.readLong()
    val dim = in.readInt()
    if (dim > 0) {
      buf.sums = new Array[Double](dim)
      var i = 0
      while (i < dim) { buf.sums(i) = in.readDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMeanAgg =
    copy(vec = newChildren(0))
}

object VectorMeanAgg {

  /** Running (count, per-dimension double sums). The dimension is adopted
    * from the first vector seen; a later vector of a different width is a
    * caller bug and fails loudly rather than silently truncating. */
  final class Buf {
    var count: Long = 0L
    var sums: Array[Double] = _
    def add(a: ArrayData): Unit = {
      val n = a.numElements()
      if (sums == null) sums = new Array[Double](n)
      else require(sums.length == n,
        s"vector width mismatch in mean: ${sums.length} vs $n")
      var i = 0
      while (i < n) { sums(i) += a.getFloat(i); i += 1 }
      count += 1L
    }
    def merge(b: Buf): Unit = {
      if (b.count == 0L) return
      if (sums == null) { sums = b.sums.clone(); count = b.count; return }
      require(sums.length == b.sums.length,
        s"vector width mismatch in mean merge: ${sums.length} vs ${b.sums.length}")
      var i = 0
      while (i < sums.length) { sums(i) += b.sums(i); i += 1 }
      count += b.count
    }
  }

  /** `Column` form: elementwise mean of an `array<float>` column. */
  def vectorMean(vec: Column): Column =
    ColumnBridge.column(
      VectorMeanAgg(ColumnBridge.expression(vec)).toAggregateExpression())

  /** The r4-quantized double form (see the `quantized` field note) —
    * the mean the SQL-replayable deterministic builds use. */
  def vectorMeanQ4(vec: Column): Column =
    ColumnBridge.column(
      VectorMeanAgg(ColumnBridge.expression(vec), quantized = true)
        .toAggregateExpression())
}
