package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Driver-built bloom filter probed from a codegen'd expression — the
  * semi-join-reduction primitive: build the filter over the SMALL side's
  * join keys (probe set, ledger, dimension), ship it as ONE reference
  * object (the [[IvfIndex]]/[[PlaneSet]] discipline — plan and generated
  * code are O(1) in filter size), and drop big-side rows map-side BEFORE
  * the shuffle. False positives survive to the exact join and are
  * eliminated there; bloom filters have no false negatives, so results
  * are identical to the unfiltered join — only the exchanged volume
  * changes. Keys are 60-bit [[graft.ops.Dedup.hashStr]] longs, so build
  * and probe agree on one unambiguous encoding. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects BIGINT, got ${t.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $bf.mightContainLong($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomFunctions {
  def bloom_might_contain(c: Column, bloom: BloomFilter): Column =
    shim.column(BloomMightContainLong(shim.expression(c), bloom))
}
