package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass second-moment sufficient statistic of an `array<long>`
  * vector column: count, per-dimension sums, and the UPPER TRIANGLE of
  * the exact integer Gram matrix Σ x·xᵀ, all in one long-array buffer —
  * the covariance pass [[graft.operators.Similarity.pcaHouseholder]]
  * needs, in the [[VectorSumLong]] idiom.
  *
  * Why an aggregate and not a plan: the declarative alternative joins
  * the sample against two dim-ranges and shuffles `rows · dim²`
  * intermediate rows into a groupBy(i, j) — at production embedding
  * dims (768–4096) that is billions of rows for a BOUNDED 10k training
  * sample. This buffer moves O(rows) map-side and one
  * `1 + dim + dim(dim+1)/2` long array per (partition, group): the
  * map side streams rows at input cardinality, the combine is
  * elementwise addition, and the shuffle carries one buffer per
  * partition.
  *
  * Buffer layout (row-major upper triangle):
  * `[n, s1_0..s1_{dim-1}, s2(0,0)..s2(0,dim-1), s2(1,1)..s2(1,dim-1), …]`
  * with `s2(i,j) = Σ x_i·x_j` for `i <= j` (the matrix is symmetric —
  * the consumer mirrors). All arithmetic is `Math.addExact` /
  * `multiplyExact`, so overflow past 2^63 fails loudly instead of
  * wrapping — quantized grids at 1e6 with 10k-row samples sit ~3
  * decimal orders below the edge.
  *
  * Semantics: NULL vectors are skipped (n counts non-null rows only);
  * non-null vectors MUST have exactly `dim` elements (fail-fast — the
  * uniform-dim contract of [[graft.operators.Similarity.quantize]]
  * output); all-null/empty groups yield NULL.
  */
case class OuterProductSumLong(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1, s"dim must be >= 1 (got $dim)")

  private val bufLen = 1 + dim + dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_opsum"

  override def createAggregationBuffer(): Array[Long] = Array.empty

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dim,
      s"graft_opsum expects uniform dim=$dim vectors (got ${arr.numElements()})")
    val acc = if (buf.isEmpty) new Array[Long](bufLen) else buf
    acc(0) = Math.addExact(acc(0), 1L)
    val x = new Array[Long](dim)
    var i = 0
    while (i < dim) { x(i) = arr.getLong(i); i += 1 }
    i = 0
    var t = 1 + dim
    while (i < dim) {
      val xi = x(i)
      acc(1 + i) = Math.addExact(acc(1 + i), xi)
      var j = i
      while (j < dim) {
        acc(t) = Math.addExact(acc(t), Math.multiplyExact(xi, x(j)))
        t += 1; j += 1
      }
      i += 1
    }
    acc
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    var i = 0
    while (i < bufLen) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OuterProductSumLong =
    copy(child = newChildren.head)
}
