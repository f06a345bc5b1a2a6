package graft.sketch

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mergeable sketch aggregates over the DataSketches library — the
 * 100 TB answer to per-group distinct counts and quantiles. Unlike
 * `count(DISTINCT x)` (which shuffles every distinct value) or an exact
 * median (which shuffles every row), a sketch partial is a fixed-size
 * byte buffer: map-side partials combine in one pass, and a STORED
 * sketch column can be re-rolled-up to any coarser grouping later
 * without touching the raw data (union is associative + commutative) —
 * that is what makes per-snapshot profile tables work at corpus scale.
 *
 * Exactness contract (what the driver oracle checks): a theta sketch
 * retains every distinct hash until it exceeds its nominal k = 2^lgK
 * entries, so below k the estimate IS the exact distinct count and the
 * whole aggregation is partitioning- and order-independent. Above k it
 * degrades to a ~1.6%/sqrt(k) relative-error estimate (spec-pinned,
 * not oracle-pinned).
 *
 * All three aggregates are `TypedImperativeAggregate`s, the same native
 * shape Spark's own `BloomFilterAggregate`/percentile sketches use: the
 * live sketch object rides the hash-agg buffer and only serializes at
 * shuffle boundaries.
 */
object Sketches {

  final val DefaultLgK = 12 // k = 4096 retained entries, ~1.6% RSE beyond

  private[sketch] def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  /** DataSketches' update(byte[]) is a silent NO-OP on an empty array,
    * which would drop empty strings / empty binaries from the distinct
    * count (DuckDB's count(DISTINCT) keeps them). Appending a constant
    * marker byte is injective (a+m == b+m iff a == b), so distinctness
    * is preserved and '' becomes countable. */
  private def withMarker(b: Array[Byte]): Array[Byte] = {
    val out = java.util.Arrays.copyOf(b, b.length + 1)
    out(b.length) = 0x01
    out
  }

  private[sketch] def updateWith(u: Union, dt: DataType, v: Any): Unit = dt match {
    case StringType => u.update(withMarker(v.asInstanceOf[UTF8String].getBytes))
    case LongType => u.update(v.asInstanceOf[Long])
    case IntegerType => u.update(v.asInstanceOf[Int].toLong)
    case DoubleType => u.update(v.asInstanceOf[Double])
    case BinaryType => u.update(withMarker(v.asInstanceOf[Array[Byte]]))
    case other => throw new IllegalStateException(s"unsupported type $other")
  }

  /** Estimate of a serialized compact sketch, rounded (exact below k). */
  def estimateOf(bytes: Array[Byte]): Long =
    Math.round(CompactSketch.wrap(Memory.wrap(bytes)).getEstimate)

  // ---- Column surface ---------------------------------------------------

  /** Approximate-distinct count (exact below 2^lgK distinct values). */
  def thetaDistinct(c: Column, lgK: Int = DefaultLgK): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(c), lgK, emitSketch = false)
      .toAggregateExpression())

  /** Serialized theta sketch of the group — store it, re-merge later. */
  def thetaSketch(c: Column, lgK: Int = DefaultLgK): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(c), lgK, emitSketch = true)
      .toAggregateExpression())

  /** Distinct-count rollup of a column of STORED sketches. */
  def thetaUnionDistinct(c: Column, lgK: Int = DefaultLgK): Column =
    Bridge.column(ThetaUnionAgg(Bridge.expression(c), lgK, emitSketch = false)
      .toAggregateExpression())

  /** Merged sketch of a column of stored sketches (further rollup). */
  def thetaUnionSketch(c: Column, lgK: Int = DefaultLgK): Column =
    Bridge.column(ThetaUnionAgg(Bridge.expression(c), lgK, emitSketch = true)
      .toAggregateExpression())

  /** Scalar estimate of a stored sketch column. */
  def thetaEstimate(c: Column): Column =
    Bridge.column(ThetaEstimateExpr(Bridge.expression(c)))

  /** KLL quantiles (inclusive rank) of a double column at `probs`. */
  def kllQuantiles(c: Column, probs: Seq[Double], k: Int = 200): Column =
    Bridge.column(KllQuantilesAgg(Bridge.expression(c), k, probs)
      .toAggregateExpression())

  /** Heavy hitters of a string column: items with estimated count >=
    * minCount as array<struct<item, n>>, (n desc, item asc)-sorted. */
  def freqItems(c: Column, minCount: Long, maxMapSize: Int = 2048): Column =
    Bridge.column(FreqItemsAgg(Bridge.expression(c), maxMapSize, minCount)
      .toAggregateExpression())
}

/**
 * Misra-Gries heavy hitters over a string column — the per-group
 * frequent-tokens / frequent-urls profile at corpus scale. State is a
 * bounded map of `maxMapSize` counters regardless of input size (vs an
 * exact GROUP BY item whose key space is the vocabulary). Exactness
 * contract: while no counter eviction has happened (distinct items per
 * group <= ~0.75 * maxMapSize) `getMaximumError() == 0` and every
 * estimate IS the exact count — the driver oracle runs in that regime;
 * beyond it, NO_FALSE_NEGATIVES returns every true heavy hitter with
 * estimates within the documented error bound (spec-pinned).
 */
case class FreqItemsAgg(
    child: Expression, maxMapSize: Int, minCount: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize > 0 && (maxMapSize & (maxMapSize - 1)) == 0,
    "maxMapSize must be a power of two")

  // ArrayOfStringsSerDe is not java-serializable — never hold it as a
  // field of this (serialized) expression
  @transient private lazy val serde = new ArrayOfStringsSerDe()

  override def prettyName: String = "graft_freq_items"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(s: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) s.update(v.asInstanceOf[UTF8String].toString)
    s
  }

  override def merge(s: ItemsSketch[String],
                     o: ItemsSketch[String]): ItemsSketch[String] = s.merge(o)

  override def eval(s: ItemsSketch[String]): Any = {
    val rows = s.getFrequentItems(minCount, ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (item, n) => (-n, item) }
      .map { case (item, n) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(item), n))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(s: ItemsSketch[String]): Array[Byte] =
    s.toByteArray(serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsAgg =
    copy(child = c)
}

/** Shared Union-buffer plumbing for the two theta aggregates — they
  * differ only in what `update` feeds the union and the input type. */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  def lgK: Int
  def emitSketch: Boolean

  override def nullable: Boolean = false
  override def dataType: DataType = if (emitSketch) BinaryType else LongType

  override def createAggregationBuffer(): Union = Sketches.newUnion(lgK)

  override def merge(u: Union, other: Union): Union = {
    u.union(other.getResult)
    u
  }

  override def eval(u: Union): Any =
    if (emitSketch) u.getResult.toByteArray
    else Math.round(u.getResult.getEstimate)

  override def serialize(u: Union): Array[Byte] = u.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = Sketches.newUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }
}

/** Theta-sketch distinct aggregate over raw values. */
case class ThetaSketchAgg(
    child: Expression, lgK: Int, emitSketch: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def prettyName: String = "graft_theta_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | DoubleType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName does not support ${other.catalogString}")
  }

  override def update(u: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) Sketches.updateWith(u, child.dataType, v)
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Rollup aggregate over a column of serialized theta sketches. */
case class ThetaUnionAgg(
    child: Expression, lgK: Int, emitSketch: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def prettyName: String = "graft_theta_union"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects serialized sketches, got ${other.catalogString}")
  }

  override def update(u: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) u.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** Scalar estimate of a stored sketch (codegen'd static call). */
case class ThetaEstimateExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Sketches.estimateOf(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.sketch.Sketches.estimateOf($b)")
  override protected def withNewChildInternal(c: Expression): ThetaEstimateExpr =
    copy(child = c)
}

/**
 * KLL quantiles aggregate (inclusive search criteria): fixed ~O(k log n)
 * state per group vs an exact median's full shuffle. Rank error is
 * bounded (~1.65/k at the median for the default k = 200); spec-pinned
 * against exact order statistics rather than oracle-pinned.
 */
case class KllQuantilesAgg(
    child: Expression, k: Int, probs: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))

  override def prettyName: String = "graft_kll_quantiles"
  override def nullable: Boolean = true // null on an empty group
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects double, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(s: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) s.update(v.asInstanceOf[Double])
    s
  }

  override def merge(s: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    s.merge(o)
    s
  }

  override def eval(s: KllDoublesSketch): Any =
    if (s.isEmpty) null
    else new GenericArrayData(
      s.getQuantiles(probs.toArray, QuantileSearchCriteria.INCLUSIVE))

  override def serialize(s: KllDoublesSketch): Array[Byte] = s.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllQuantilesAgg =
    copy(child = c)
}
