package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Exact integer second-moment (Gram) aggregate over pre-quantized
  * vectors: one pass producing `(n, Σq, Σ q·qᵀ)` — the sufficient
  * statistics of the covariance matrix, from which PCA/whitening run as
  * model-bounded driver math ([[graft.operators.VectorOps.pcaTop]]).
  *
  * Why a custom aggregate: the declarative alternative (double
  * `posexplode` to (i, j, qᵢ·qⱼ) then `sum` grouped by the pair)
  * multiplies the row count by d² BEFORE the shuffle — 60k 64-dim rows
  * become 245M exploded rows. This buffer keeps the d + d² running sums
  * per partition: map-side partials combine locally and the shuffle
  * carries ONE ~(d²·8)-byte buffer per partition — at 1000 executors
  * that is 1000 × 32 KB for d=64, independent of corpus size. The d²·n
  * multiply-adds are the inherent FLOP cost of a covariance; only the
  * upper triangle is accumulated (symmetry), mirrored at eval.
  *
  * Exactness contract: inputs are LONGS (quantize floats first — see
  * [[graft.operators.VectorOps.quantizeQ3]]), sums are exact 64-bit
  * integer adds, so the result is a pure function of the input multiset
  * — partition- and order-independent, reproducible bit-for-bit by the
  * DuckDB oracle. Overflow bound (caller's contract): n · max(q)² must
  * stay under 2⁶³ — at q3 quantization of unit-scale embeddings
  * (|q| ≲ 5·10³) that is ~3·10¹¹ rows per job; larger corpora
  * shard-sum the per-shard results in DECIMAL (the checksum rule).
  */
case class GramSumAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramSumAgg.Buf] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s1", ArrayType(LongType, containsNull = false)),
    StructField("s2", ArrayType(LongType, containsNull = false))))

  override def createAggregationBuffer(): GramSumAgg.Buf = new GramSumAgg.Buf

  override def update(buf: GramSumAgg.Buf, input: InternalRow): GramSumAgg.Buf = {
    val a = vec.eval(input).asInstanceOf[ArrayData]
    if (a != null) buf.add(a)
    buf
  }

  override def merge(a: GramSumAgg.Buf, b: GramSumAgg.Buf): GramSumAgg.Buf = {
    a.merge(b)
    a
  }

  override def eval(buf: GramSumAgg.Buf): Any =
    if (buf.count == 0L) null
    else {
      val d = buf.s1.length
      val full = new Array[Any](d * d)
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { // mirror the upper triangle
          val v: java.lang.Long = buf.s2(i * d + j)
          full(i * d + j) = v
          full(j * d + i) = v
          j += 1
        }
        i += 1
      }
      val s1 = new Array[Any](d)
      i = 0
      while (i < d) { s1(i) = buf.s1(i); i += 1 }
      new GenericInternalRow(Array[Any](
        buf.count, new GenericArrayData(s1), new GenericArrayData(full)))
    }

  override def serialize(buf: GramSumAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    val d = if (buf.s1 == null) 0 else buf.s1.length
    out.writeInt(d)
    var i = 0
    while (i < d) { out.writeLong(buf.s1(i)); i += 1 }
    i = 0
    while (i < d * d) { out.writeLong(buf.s2(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramSumAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new GramSumAgg.Buf
    buf.count = in.readLong()
    val d = in.readInt()
    if (d > 0) {
      buf.s1 = new Array[Long](d)
      var i = 0
      while (i < d) { buf.s1(i) = in.readLong(); i += 1 }
      buf.s2 = new Array[Long](d * d)
      i = 0
      while (i < d * d) { buf.s2(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramSumAgg =
    copy(vec = newChildren(0))
}

object GramSumAgg {

  /** Running `(count, Σq per dim, Σ qᵢqⱼ upper triangle)` in exact
    * longs. The dimension is adopted from the first vector seen; a
    * different later width is a caller bug and fails loudly. */
  final class Buf {
    var count: Long = 0L
    var s1: Array[Long] = _
    var s2: Array[Long] = _ // d*d, upper triangle (i <= j) populated
    def add(a: ArrayData): Unit = {
      val d = a.numElements()
      if (s1 == null) { s1 = new Array[Long](d); s2 = new Array[Long](d * d) }
      else require(s1.length == d,
        s"vector width mismatch in gram: ${s1.length} vs $d")
      var i = 0
      while (i < d) {
        // a null ELEMENT would unbox to 0 and silently zero the moments
        // — fail loudly like the width mismatch (quantize upstream of
        // this aggregate never produces one from a non-null component)
        require(!a.isNullAt(i), s"null vector element at position $i in gram")
        val qi = a.getLong(i)
        s1(i) += qi
        var j = i
        while (j < d) { s2(i * d + j) += qi * a.getLong(j); j += 1 }
        i += 1
      }
      count += 1L
    }
    def merge(b: Buf): Unit = {
      if (b.count == 0L) return
      if (s1 == null) {
        s1 = b.s1.clone(); s2 = b.s2.clone(); count = b.count; return
      }
      require(s1.length == b.s1.length,
        s"vector width mismatch in gram merge: ${s1.length} vs ${b.s1.length}")
      var i = 0
      while (i < s1.length) { s1(i) += b.s1(i); i += 1 }
      i = 0
      while (i < s2.length) { s2(i) += b.s2(i); i += 1 }
      count += b.count
    }
  }

  /** `Column` form: `struct(n, s1, s2)` of an `array<long>` column. */
  def gramSum(vec: Column): Column =
    ColumnBridge.column(
      GramSumAgg(ColumnBridge.expression(vec)).toAggregateExpression())
}
