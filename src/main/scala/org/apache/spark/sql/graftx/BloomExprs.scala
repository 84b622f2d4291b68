package org.apache.spark.sql.graftx

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain_str(serialized_filter, str)` — the probe side of a
  * Bloom-filter runtime prefilter, as a native codegen expression.
  *
  * Why (SURVEY.md §5 preference order, case b): the 100 TB decontamination
  * path wants to drop ~all clean corpus rows BEFORE any join machinery —
  * a Bloom filter over the fixed-size benchmark shingle set is a few MB of
  * broadcast bits instead of a multi-GB hash relation, and the probe is a
  * pure per-row predicate that rides the scan inside whole-stage codegen
  * (same pattern as Spark's own InjectRuntimeFilter, which this engine
  * can't reuse directly because the filter here is a persisted artifact,
  * not a per-query subquery). No false negatives, so `bloom-prefilter →
  * exact confirm join` is EXACTLY equal to the unfiltered join — the
  * query stays oracle-checkable while the plan gains the early exit.
  *
  * Left child must be a foldable BINARY (the `BloomFilter.writeTo` bytes,
  * usually a literal loaded from the index artifact); it is deserialized
  * ONCE driver-side and shipped as a codegen reference object, never
  * re-parsed per row. Probe hashing matches the build side byte-for-byte:
  * the builder puts UTF-8 bytes ([[graft.functions.BloomBuild]]) and the
  * probe tests `UTF8String.getBytes` — the same encoding, no String
  * round-trip in the hot loop.
  */
case class BloomMightContainStr(bloom: Expression, value: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = bloom
  override def right: Expression = value
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_str"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!bloom.foldable) TypeCheckResult.TypeCheckFailure(
      "the serialized bloom filter must be a foldable BINARY expression")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Deserialized once per driver/executor instance, not per row. */
  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom filter bytes must not be null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) null
    else filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = $bf.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainStr =
    copy(bloom = newLeft, value = newRight)
}

object BloomExprs {
  /** Column face of [[BloomMightContainStr]] over artifact bytes. */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(BloomMightContainStr(
      Literal.create(bloomBytes, BinaryType), ExpressionUtils.expression(value)))
}
