package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Compiled Bloom-filter membership over an int64 hash column.
  *
  * The filter is built once (driver-side, via `df.stat.bloomFilter`'s
  * distributed treeAggregate) and rides into the executors as a plan
  * reference object — the same shape Spark's own runtime bloom-filter
  * join pruning uses, exposed as a user-facing operator for approximate
  * membership at corpus scale: the 100 TB side streams map-side against
  * an in-memory sketch instead of shuffling into a join.
  *
  * Guarantees: NO false negatives (every inserted value tests true);
  * false positives at the configured fpp. Downstream must treat a `true`
  * as "candidate", not proof — or bound the error, as
  * q58_bloom_decontamination's tolerance contract does.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
    copy(child = c)
}

/** Distributed Bloom-sketch builder: aggregates an int64 hash column
  * into serialized `BloomFilter` bytes. The partitioned complement to
  * `df.stat.bloomFilter`: where that folds ONE corpus-proportional
  * sketch onto the driver, grouping this aggregate by a hash shard
  * (`pmod(h, P)`) yields a (shard, sketch) TABLE whose pieces live and
  * stay distributed — no driver allocation that grows with the corpus
  * (the SCALE.md q58 escape hatch, exercised by q83).
  *
  * Memory note: each aggregation buffer pre-allocates the full
  * `expectedItems`-sized bit array, so partial (map-side) aggregation
  * multiplies memory by the number of distinct groups PER TASK.
  * Repartition by the group key first — then every task only ever holds
  * its own shards' buffers and cluster-wide memory sums to one sketch.
  */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, s"bloom_build: expectedItems must be positive, got $expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"bloom_build: fpp must be in (0, 1), got $fpp")

  // SQL-reachable (GraftExtensions): reject non-long hash columns at
  // analysis time instead of a ClassCastException inside a running task
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_build requires a BIGINT hash column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_build"

  override def withNewMutableAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)
}

object BloomFunctions {
  def mightContainLong(h: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(h), bloom))

  /** Aggregate an int64 hash column into serialized Bloom-sketch bytes. */
  def bloomBuild(h: Column, expectedItems: Long, fpp: Double): Column =
    ColumnBridge.column(
      BloomBuildAgg(ColumnBridge.expression(h), expectedItems, fpp)
        .toAggregateExpression())
}
