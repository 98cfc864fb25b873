package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Native aggregate expression: 64-bit SimHash over a stream of
  * 64-bit token hashes. Each input hash votes +1/-1 on every bit
  * position; the sign of each position's tally becomes that bit of the
  * result (frequency-weighted SimHash).
  *
  * As a `TypedImperativeAggregate` the whole per-group state is one
  * 64-long array (long tallies: int would overflow past ~2.1B rows
  * per group) — versus composing it from 64 separate `sum(CASE …)`
  * aggregate columns, this is one buffer, one update loop, and a
  * mergeable partial (map-side combine works across partitions), which
  * is what a 100 TB grouped sketch needs.
  */
case class SimHashAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) != 0L) buffer(i) += 1 else buffer(i) -= 1
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    var out = 0L
    var i = 0
    while (i < 64) {
      if (buffer(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(storageFormat)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Reference implementation for the spec. */
  def reference(hashes: Seq[Long]): Long = {
    val tally = new Array[Long](64)
    hashes.foreach { h =>
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) != 0L) tally(i) += 1 else tally(i) -= 1
        i += 1
      }
    }
    var out = 0L
    (0 until 64).foreach(i => if (tally(i) > 0) out |= (1L << i))
    out
  }
}
