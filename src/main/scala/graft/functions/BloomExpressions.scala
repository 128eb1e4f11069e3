package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a driver-built Bloom filter —
  * the scan-side pre-filter of the contamination screen (and of any
  * large-corpus × small-set semi-join). The filter rides into the
  * generated code as a plan reference object, so executors probe a
  * shared in-memory sketch: no join, no shuffle, no per-row
  * allocation. False positives are expected and harmless — callers
  * MUST confirm survivors with an exact join (the bloom only bounds
  * how many rows reach it).
  *
  * At 100 TB: a held-out benchmark set of ~10M n-grams fits a ~17 MB
  * bloom at 1% fpp (`BloomFilter.create` sizing), broadcast once per
  * executor inside the serialized plan, and the corpus-side scan drops
  * ~99% of rows before the exact confirm join sees them.
  *
  * Why not a plain broadcast-hash semi-join for the prefilter too?
  * It is the confirm step — but it materializes the full gram set per
  * executor (hundreds of MB at 10M strings) while the bloom is 20×
  * smaller and probe-only; running the bloom first keeps the big
  * join's probe side tiny.
  */
case class BloomMightContainLong(filter: BloomFilter, child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {

  /** Build a Bloom filter over a BIGINT column (one aggregation job —
    * the result is sketch-sized, never row-sized, so collecting it to
    * the driver is the broadcast pattern, not a data-plane collect).
    */
  def buildLong(df: org.apache.spark.sql.DataFrame, column: String,
                expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(column, math.max(expectedItems, 1L), fpp)

  /** `filter.mightContainLong(col)` as a codegen'd Column predicate. */
  def mightContain(filter: BloomFilter, col: Column): Column =
    Bridge.column(BloomMightContainLong(filter, Bridge.expression(col)))
}
