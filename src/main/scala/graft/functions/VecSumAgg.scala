package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native aggregate expression: element-wise sum of ARRAY<DOUBLE>
  * columns — the missing primitive under every whole-vector reduction
  * (embedding centroids, covariance accumulation, gradient-style
  * partial sums). Composing it from `explode` + per-dim groupBy
  * (the [[graft.operators.Similarity.embCentroids]] formulation)
  * multiplies the shuffled row count by the dimension; as a
  * `TypedImperativeAggregate` the whole per-group state is ONE
  * double array of the vector's length, updated in a tight loop and
  * mergeable across partitions (map-side combine), so a billion-vector
  * reduction ships `dim` doubles per partition and nothing else.
  *
  * The buffer sizes itself lazily from the first non-null input;
  * mismatched vector lengths within a group fail loudly rather than
  * silently truncating.
  */
case class VecSumAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  @transient private lazy val elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val ad = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      // toDoubleArray would silently read a null slot as 0.0, and a
      // zero-length vector is indistinguishable from the uninitialized
      // buffer sentinel — reject both loudly. The null scan only runs
      // when the array TYPE admits nulls (one pass per row otherwise).
      val ne = ad.numElements()
      require(ne > 0, s"$prettyName: empty vector")
      if (elementsNullable) {
        var j = 0
        while (j < ne) {
          require(!ad.isNullAt(j), s"$prettyName: null element at index $j")
          j += 1
        }
      }
      val arr = ad.toDoubleArray()
      if (buffer.isEmpty) arr
      else {
        require(buffer.length == arr.length,
          s"$prettyName: vector length ${arr.length} != ${buffer.length}")
        var i = 0
        while (i < arr.length) { buffer(i) += arr(i); i += 1 }
        buffer
      }
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"$prettyName: partial length ${b2.length} != ${b1.length}")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.length * 8)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(storageFormat)
    Array.fill(bb.getInt())(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)
}
