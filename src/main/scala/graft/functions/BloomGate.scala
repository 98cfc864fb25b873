package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter aggregate over 64-bit hashes — the admission
  * pre-gate primitive: build one compact filter from the standing
  * corpus's content fingerprints, broadcast it (a ~hundred-KB binary
  * for 10⁵ items at 1 % fpp), and probe every incoming row in-row, so
  * the exact verification join only ever sees the probe HITS
  * (|batch|·fpp + true duplicates) instead of the whole batch.
  *
  * Built on Spark's own public `org.apache.spark.util.sketch
  * .BloomFilter` (the sketch that powers runtime row-group filtering),
  * so merge semantics and serialized layout are battle-tested: the
  * per-partition buffer IS a filter, partials OR together bit-wise
  * (map-side combine), and the final value is the `writeTo` byte
  * image. Guarantee: NO false negatives ever; false positives bounded
  * by fpp at the sized capacity. */
case class BloomFilterAgg(
  child: Expression,
  expectedItems: Long,
  fpp: Double,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash (use xxhash64), got ${other.catalogString}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(storageFormat))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** `graft_bloom_contains(bloom, hash)`: probe a serialized Bloom
  * filter with a 64-bit hash. The filter side must be FOLDABLE (a
  * literal or the result of a scalar pull) — it deserializes exactly
  * once per task and rides into generated code as a reference object,
  * so the per-row cost is the filter's k bit-probes, fully inside
  * whole-stage codegen (the same pattern as Spark's internal
  * BloomFilterMightContain, which is not SQL-registered). */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a FOLDABLE filter argument (a literal) — " +
          "build the filter first, then attach it as a literal/broadcast")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, BIGINT), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: null filter")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(b: Any, h: Any): Any =
    filter.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, h) =>
      s"${ev.value} = $bf.mightContainLong($h);")
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
