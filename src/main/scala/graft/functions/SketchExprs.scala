package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch for a key's estimated count.
  *
  * The production shape: the sketch is a FIXED-SIZE aggregate built in
  * one distributed pass (`count_min_sketch(...)`), broadcast as a
  * 1-row relation, and probed row-by-row on the executor side — so a
  * bound/certification check (q80's `within_bounds`) is computed as a
  * DataFrame expression, never a driver loop. CodegenFallback is fine
  * here: the probe side is a bounded candidate set (top-K rows), not
  * the event stream.
  *
  * Every input row carries a fresh copy of the same broadcast sketch
  * bytes (UnsafeRow.getBinary copies), so the deserialized sketch is
  * cached per expression instance keyed by byte equality — one parse
  * per task instead of one per row.
  */
@ExpressionDescription(usage = "graft_cms_estimate(sketch, key) - CMS estimated count for key")
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType | StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate needs (binary, long|int|string), got $l / $r")
    }

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedCms: CountMinSketch = _

  override def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (cachedCms == null || !java.util.Arrays.equals(bytes, cachedBytes)) {
      cachedBytes = bytes
      cachedCms = CountMinSketch.readFrom(bytes)
    }
    key match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        cachedCms.estimateCount(s.toString)
      case other => cachedCms.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
}

/** Probe a serialized Bloom filter for LONG-key membership.
  *
  * Spark ships `BloomFilterMightContain`, but its input contract
  * requires the filter to be a foldable literal or scalar subquery —
  * it rejects the broadcast-1-row-relation shape the sketch queries
  * use (the [[CmsEstimate]] pattern: aggregate once, broadcast the
  * row, probe distributed). This expression accepts the filter as an
  * ordinary column and caches the deserialized filter per instance
  * keyed by byte equality — one parse per task, not per row. */
@ExpressionDescription(usage = "graft_bloom_contains(bloom, key) - Bloom membership for a long key")
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains needs (binary, bigint), got $l / $r")
    }

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedBloom: org.apache.spark.util.sketch.BloomFilter = _

  override def nullSafeEval(bf: Any, key: Any): Any = {
    val bytes = bf.asInstanceOf[Array[Byte]]
    // reference-equality fast path FIRST: with the filter as a plan
    // literal (q87's shape) every row carries the same array instance,
    // so the ~MB byte comparison never runs on the hot path — paying
    // it per row is exactly the hazard the q87 scaladoc documents
    if (!(bytes eq cachedBytes) &&
        (cachedBloom == null || !java.util.Arrays.equals(bytes, cachedBytes))) {
      cachedBloom = org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
    }
    cachedBytes = bytes
    cachedBloom.mightContainLong(key.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContains =
    copy(left = l, right = r)
}

object SketchExprs {
  /** Estimated count of `key` in the serialized CMS `sketch`. */
  def cmsEstimate(sketch: Column, key: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(key)))

  /** Bloom-filter aggregate over a LONG key column (Spark's internal
    * runtime-filter aggregate surfaced as a Column): fixed capacity
    * `expectedItems` at false-positive rate `fpp`, emitted as the
    * serialized filter — fixed-size mergeable state, the summary shape
    * a 1000-executor pass ships (the count_min_sketch sibling). */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double): Column = {
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .create(expectedItems, fpp).bitSize()
    ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(key),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())
  }

  /** Bloom membership probe (see [[BloomContains]]). */
  def bloomContains(bloom: Column, key: Column): Column =
    ColumnBridge.column(BloomContains(
      ColumnBridge.expression(bloom), ColumnBridge.expression(key)))
}
