package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native aggregate: Misra–Gries heavy hitters over a string stream —
  * the mergeable top-k-frequent summary (Misra & Gries 1982; the
  * counter-addition merge that PRESERVES the n/k error bound is from
  * Agarwal et al., "Mergeable Summaries", PODS'12). Completes the
  * engine's mergeable-sketch family: HLL (distinct), approximate
  * percentiles (rank), MG (frequency).
  *
  * State is ≤ k counters per group regardless of input size — the
  * bounded-state property an exact top-k (full term→count map) lacks
  * at 100 TB — and partials combine map-side like any aggregate.
  * Guarantees, independent of partitioning/merge order: every item
  * with true frequency > n/k survives in the summary, and each
  * reported count is an UNDER-count by at most n/k (`eval` also
  * reports the shared `max_deficit` so callers can bound the truth:
  * count ≤ true ≤ count + max_deficit). Counts at the margin may vary
  * with merge order — inherent to MG — so the oracle check is
  * rows-only and the spec asserts the GUARANTEES across different
  * partitionings, not byte equality.
  */
case class TopKFreqAgg(
  child: Expression,
  k: Int,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKFreqAgg.Summary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_freq"

  override def dataType: DataType = ArrayType(new StructType()
    .add("item", StringType).add("count", LongType).add("max_deficit", LongType),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument and k > 0, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): TopKFreqAgg.Summary =
    new TopKFreqAgg.Summary(k)

  override def update(buffer: TopKFreqAgg.Summary, input: InternalRow): TopKFreqAgg.Summary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(b1: TopKFreqAgg.Summary, b2: TopKFreqAgg.Summary): TopKFreqAgg.Summary = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buffer: TopKFreqAgg.Summary): Any = {
    val rows = buffer.counters.toSeq.sortBy { case (item, ct) => (-ct, item) }
      .map { case (item, ct) =>
        InternalRow(UTF8String.fromString(item), ct, buffer.deficit)
      }
    new GenericArrayData(rows.toArray)
  }

  override def serialize(buffer: TopKFreqAgg.Summary): Array[Byte] = {
    val items = buffer.counters.toSeq
    val bytes = items.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + 8 + items.map(i => 4 + 8).sum +
      bytes.map(_.length).sum)
    bb.putInt(items.length)
    bb.putLong(buffer.deficit)
    items.zip(bytes).foreach { case ((_, ct), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(ct)
    }
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): TopKFreqAgg.Summary = {
    val bb = ByteBuffer.wrap(storageFormat)
    val n = bb.getInt()
    val s = new TopKFreqAgg.Summary(k)
    s.deficit = bb.getLong()
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val b = new Array[Byte](len); bb.get(b)
      val ct = bb.getLong()
      s.counters.put(new String(b, StandardCharsets.UTF_8), ct)
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreqAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreqAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKFreqAgg =
    copy(child = newChildren.head)
}

object TopKFreqAgg {
  /** MG summary: ≤ k counters + the accumulated decrement (`deficit`)
    * every surviving count is short by at most. */
  final class Summary(val k: Int) {
    val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var deficit: Long = 0L

    def add(item: String, ct: Long): Unit = {
      counters.get(item) match {
        case Some(c) => counters.update(item, c + ct)
        case None =>
          counters.update(item, ct)
          if (counters.size > k) shrink()
      }
    }

    /** Subtract the (k+1)-th largest count from every counter and drop
      * the non-positive ones — the decrement batch that keeps ≤ k
      * counters while charging every survivor the same under-count. */
    private def shrink(): Unit = {
      val kth = counters.values.toSeq.sorted(Ordering[Long].reverse)
        .drop(k).headOption.getOrElse(0L)
      if (kth > 0) {
        deficit += kth
        val dead = counters.collect {
          case (item, c) if c - kth <= 0 => item
        }.toSeq
        counters.mapValuesInPlace((_, c) => c - kth)
        dead.foreach(counters.remove)
      }
    }

    /** Mergeable-summaries merge: add counts, then one shrink batch
      * restores the size bound; deficits add. */
    def mergeIn(other: Summary): Unit = {
      deficit += other.deficit
      other.counters.foreach { case (item, ct) =>
        counters.update(item, counters.getOrElse(item, 0L) + ct)
      }
      if (counters.size > k) shrink()
    }
  }
}
