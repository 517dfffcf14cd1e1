package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a TypedImperativeAggregate —
  * the sketch half of [[graft.operators.TextAnalysis.heavyHitters]].
  *
  * The classic streaming algorithm (Misra & Gries 1982) keeps at most
  * `capacity` weighted counters; the mergeable-summaries form (Agarwal
  * et al., PODS 2012) combines partial summaries by adding counters and
  * re-truncating to capacity (subtract the (capacity+1)-th largest
  * count from all, drop non-positive). After ANY update/merge tree the
  * estimate satisfies  true_freq − n/(capacity+1) ≤ count ≤ true_freq,
  * so every item with true frequency > n/(capacity+1) is PRESENT in the
  * summary — the superset guarantee downstream exact verification
  * relies on. The summary CONTENT depends on arrival order (counts are
  * lower bounds, not exact), which is why no driver row exposes it raw:
  * the operator layer re-counts candidates exactly and filters on a
  * threshold above the guarantee line, making the composed result
  * deterministic under any partitioning.
  *
  * Why this shape at 100 TB: a token-frequency `groupBy` shuffles the
  * full vocabulary; this rides ObjectHashAggregate's two-phase path, so
  * the shuffle carries at most `capacity` (token, count) pairs per map
  * partition — input-size-independent, like [[TopKByScore]].
  *
  * Buffer: a HashMap keyed by cloned UTF8String (row buffers are
  * reused; storing uncloned keys aliases dead memory). A full-map miss
  * decrements all counters by 1 and prunes zeros — amortized O(1) per
  * row (each O(capacity) pass removes capacity+1 count units and at
  * most n units are ever added). NULL tokens are skipped. Output:
  * `array<struct<token:string,count:bigint>>` ordered (count DESC,
  * token ASC); an all-NULL group yields an empty array.
  */
case class MisraGriesSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] {

  require(capacity > 0, s"graft_mg requires capacity > 0 (got $capacity)")

  // analysis-time type gate (ADVICE r7): update() casts to UTF8String,
  // so a non-string child must fail analysis with a clear message, not
  // a runtime ClassCastException (AbstractDataType is private[sql], so
  // ExpectsInputTypes is off-limits outside Spark; checkInputDataTypes
  // is the public hook — the GraftFunctions builder double-checks too)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_mg requires a STRING token column (got ${child.dataType.sql})")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_mg"

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val t = child.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String])
    buf
  }

  override def merge(b1: MgSummary, b2: MgSummary): MgSummary = {
    val it = b2.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b1.addOwned(e.getKey, e.getValue)
    }
    b1.truncateToCapacity()
    b1
  }

  override def eval(buf: MgSummary): Any = {
    val entries = new Array[(UTF8String, Long)](buf.map.size())
    val it = buf.map.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0)
    }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(t, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MgSummary): Array[Byte] = {
    var bytes = 8
    val it0 = buf.map.keySet().iterator()
    while (it0.hasNext) bytes += 12 + it0.next().numBytes()
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.capacity).putInt(buf.map.size())
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes
      bb.putInt(tb.length).put(tb).putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgSummary(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](bb.getInt())
      bb.get(tb)
      buf.map.put(UTF8String.fromBytes(tb), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesSketch =
    copy(child = newChildren.head)
}

/** capacity-bounded counter map with the MG decrement rule. */
final class MgSummary(val capacity: Int) {
  val map = new java.util.HashMap[UTF8String, java.lang.Long](capacity * 2)

  /** Single arrival of `token` (clones before first insert). Classic
    * weight-1 MG step: hit increments; miss inserts if room; full-map
    * miss decrements every counter AND the arrival by 1 (the arrival's
    * unit cancels — it is not inserted). */
  def add(token: UTF8String): Unit = {
    val cur = map.get(token)
    if (cur != null) map.put(token, cur + 1L)
    else if (map.size() < capacity) map.put(token.clone(), java.lang.Long.valueOf(1L))
    else decrementAll(1L)
  }

  /** Merge-path insert: `token` is already an owned (deserialized or
    * previously cloned) key, no defensive copy needed. */
  def addOwned(token: UTF8String, w: Long): Unit = {
    val cur = map.get(token)
    if (cur != null) map.put(token, cur + w) else map.put(token, java.lang.Long.valueOf(w))
  }

  private def decrementAll(by: Long): Unit = {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  /** Mergeable-summaries truncation: if over capacity, subtract the
    * (capacity+1)-th largest count from every counter and prune. */
  def truncateToCapacity(): Unit = {
    val over = map.size() - capacity
    if (over <= 0) return
    val counts = new Array[Long](map.size())
    val it = map.values().iterator()
    var i = 0
    while (it.hasNext) { counts(i) = it.next(); i += 1 }
    java.util.Arrays.sort(counts)
    // counts ascending; the (capacity+1)-th largest is at size-capacity-1
    val cut = counts(map.size() - capacity - 1)
    decrementAll(cut)
  }
}
