package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Native Theta-sketch aggregates (Datasketches) — the approximate
  * member of the distinct-set-ALGEBRA family. HLL answers only
  * cardinality-of-union; the Roaring bitmap family
  * ([[BitmapAgg]]) answers everything exactly but its state grows with
  * the set; a Theta sketch keeps O(k) state at ANY cardinality and
  * still supports union AND intersection (Dasgupta et al., "Theta
  * sketch framework"). At 100 TB audience-overlap serving ("users who
  * did A and B") this is the fixed-memory path; the bitmap is the
  * exact path for bounded id spaces; the spec pins the estimate
  * against the exact answer.
  *
  * Determinism: a theta sketch of a SET retains the k smallest hash
  * values — a pure set property, independent of insertion order and
  * partitioning — and union/intersection operate on those retained
  * sets, so every estimate here is partitioning-independent (the spec
  * re-checks under repartition(7)).
  *
  * `graft_theta_agg(id)` → BINARY compact sketch (partials union
  * map-side); `graft_theta_union_card(bin)` → estimate of |∪|;
  * `graft_theta_intersect_card(bin)` → estimate of |∩|.
  */
object ThetaSketchAgg {
  val NominalEntries = 4096

  def toSketch(bytes: Array[Byte]): Sketch = Sketch.heapify(Memory.wrap(bytes))
}

/** `graft_theta_agg(longCol)` → BINARY compact theta sketch. */
case class ThetaSketchAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_agg"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral id column, got ${other.catalogString}")
  }

  private def newUnion(): Union =
    SetOperation.builder().setNominalEntries(ThetaSketchAgg.NominalEntries).buildUnion()

  override def createAggregationBuffer(): Union = newUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    })
    buffer
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult); b1
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion()
    u.union(ThetaSketchAgg.toSketch(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Shared shell for the binary→estimate re-aggregators; buffers are a
  * list of compact sketch byte arrays folded at eval (intersection
  * needs its identity handled explicitly — an empty input group
  * estimates 0). */
abstract class ThetaCardAgg extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Array[Byte]]] {
  import scala.collection.mutable.ArrayBuffer
  def child: Expression
  protected def fold(sketches: Seq[Sketch]): Double

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY theta sketch, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): ArrayBuffer[Array[Byte]] = ArrayBuffer.empty

  override def update(buffer: ArrayBuffer[Array[Byte]], input: InternalRow): ArrayBuffer[Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) buffer += v.asInstanceOf[Array[Byte]]
    buffer
  }

  override def merge(b1: ArrayBuffer[Array[Byte]], b2: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] = {
    b1 ++= b2; b1
  }

  override def eval(buffer: ArrayBuffer[Array[Byte]]): Any =
    if (buffer.isEmpty) 0.0
    else fold(buffer.toSeq.map(ThetaSketchAgg.toSketch))

  override def serialize(buffer: ArrayBuffer[Array[Byte]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.map(b => 4 + b.length).sum)
    bb.putInt(buffer.length)
    buffer.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Array[Byte]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = ArrayBuffer.empty[Array[Byte]]
    (0 until n).foreach { _ =>
      val len = bb.getInt(); val b = new Array[Byte](len); bb.get(b); out += b
    }
    out
  }
}

/** `graft_theta_union_card(bin)` → estimated |∪ sketches|. */
case class ThetaUnionCard(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0) extends ThetaCardAgg {
  override def prettyName: String = "graft_theta_union_card"
  override protected def fold(sketches: Seq[Sketch]): Double = {
    val u = SetOperation.builder()
      .setNominalEntries(ThetaSketchAgg.NominalEntries).buildUnion()
    sketches.foreach(u.union)
    u.getResult.getEstimate
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionCard =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionCard =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaUnionCard =
    copy(child = newChildren.head)
}

/** `graft_theta_intersect_card(bin)` → estimated |∩ sketches|. Callers
  * guard group completeness exactly as with [[BitmapAndCard]]. */
case class ThetaIntersectCard(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0) extends ThetaCardAgg {
  override def prettyName: String = "graft_theta_intersect_card"
  override protected def fold(sketches: Seq[Sketch]): Double = {
    val it = SetOperation.builder()
      .setNominalEntries(ThetaSketchAgg.NominalEntries).buildIntersection()
    sketches.foreach(it.intersect)
    it.getResult.getEstimate
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaIntersectCard =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaIntersectCard =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaIntersectCard =
    copy(child = newChildren.head)
}
