package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded grouped top-k: the k best (score, id) pairs per group, best
  * first — the scale-correct replacement for the `row_number() OVER
  * (PARTITION BY key ORDER BY score DESC) <= k` window idiom.
  *
  * Why this beats the window at 100 TB: WindowExec must shuffle and sort
  * EVERY input row by (key, score) before discarding all but k per key.
  * As a TypedImperativeAggregate, this rides Spark's two-phase hash
  * aggregation instead: the map side folds rows into a k-element heap per
  * (partition, group), so the shuffle carries at most k pairs per group
  * per partition — input-size-independent — and merge is a k-by-k heap
  * fold. Same chunk/combine topology as every registry reduction.
  *
  * Semantics: pairs order by (score DESC, id ASC) — the id tiebreak makes
  * the result deterministic under any partitioning whenever ids are
  * distinct (they are row identities). Rows with NULL/NaN score or NULL
  * id are skipped; a group with no valid rows yields NULL. Output is
  * `array<struct<score:double, id:bigint>>`, best first.
  *
  * Buffer: parallel-array binary min-heap keyed by "worseness" (root =
  * current worst kept pair), so a full heap replaces the root in O(log k)
  * only when the candidate beats it; arrays grow geometrically up to k;
  * serialized form is 16 bytes per kept pair.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, s"topk requires k > 0 (got $k)")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = s.asInstanceOf[Double]
      if (!sv.isNaN) buf.offer(sv, i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: TopKHeap, b2: TopKHeap): TopKHeap = {
    var i = 0
    while (i < b2.size) { b1.offer(b2.scores(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKHeap): Any = {
    if (buf.size == 0) return null
    val rows = buf.sortedBestFirst().map { case (s, i) =>
      InternalRow(s, i)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // serialized in heap-array order: re-offering restores a valid heap
    while (i < n) { heap.offer(bb.getDouble(), bb.getLong()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** k-bounded min-heap over (score, id), root = worst kept pair. Pair A is
  * better than B iff A.score > B.score, or scores equal and A.id < B.id
  * (total order when ids are distinct).
  *
  * Backing arrays grow geometrically up to k, so buffer memory tracks the
  * data actually seen, not the requested k: a large k (say 10^6) over many
  * small groups would otherwise eagerly pin k*16 bytes per (partition,
  * group) in the ObjectHashAggregate map before a single row arrived. */
final class TopKHeap(val k: Int) {
  var scores = new Array[Double](math.min(k, 16))
  var ids    = new Array[Long](math.min(k, 16))
  var size   = 0

  private def ensureRoom(): Unit =
    if (size == scores.length && size < k) {
      val cap = math.min(k.toLong, scores.length.toLong * 2).toInt
      scores = java.util.Arrays.copyOf(scores, cap)
      ids    = java.util.Arrays.copyOf(ids, cap)
    }

  /** a strictly worse than b (heap property: parent worse than children) */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def offer(s: Double, i: Long): Unit = {
    if (size < k) {
      // grow phase: append + sift up toward the worst-at-root invariant
      ensureRoom()
      var c = size
      scores(c) = s; ids(c) = i
      size += 1
      while (c > 0) {
        val p = (c - 1) >> 1
        if (worse(scores(c), ids(c), scores(p), ids(p))) {
          swap(c, p); c = p
        } else return
      }
    } else if (worse(scores(0), ids(0), s, i)) {
      // full and the candidate beats the current worst: replace + sift down
      scores(0) = s; ids(0) = i
      var c = 0
      while (true) {
        val l = 2 * c + 1
        val r = l + 1
        var w = c
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == c) return
        swap(c, w); c = w
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** (score, id) pairs ordered best -> worst. */
  def sortedBestFirst(): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }
}
