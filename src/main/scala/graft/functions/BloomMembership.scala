package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
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

object BloomFunctions {
  def mightContainLong(h: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(h), bloom))
}
