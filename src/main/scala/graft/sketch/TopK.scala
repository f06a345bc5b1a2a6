package graft.sketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/**
 * Bounded top-k-per-group aggregate: the k (item, score) pairs with the
 * highest scores, ties broken by ascending item — "top 3 docs per
 * language", "top 10 urls per domain".
 *
 * The standard SQL form (`row_number() OVER (PARTITION BY g ORDER BY
 * score DESC) <= k`) shuffles and SORTS every row of every group; at
 * corpus scale that is a full-data sort to keep k rows per group. This
 * aggregate keeps a k-bounded heap per group instead: map-side partials
 * absorb their partition's rows locally (O(n log k), no pre-shuffle
 * sort), only k-pair buffers cross the wire, and merge is associative +
 * commutative — the same mergeable-state shape as the sketch aggregates,
 * but EXACT at every k (deterministic via the total (score desc, item
 * asc) order, so partitioning never changes the result).
 */
object TopK {

  /** array<struct<item,score>> of the k highest-scored items of the
    * group, (score desc, item asc)-ordered. */
  def topK(item: Column, score: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(item), Bridge.expression(score), k)
      .toAggregateExpression())
}

/** Mutable bounded buffer: pairs kept in no particular order, worst
  * (lowest score, then highest item) evicted once size exceeds k. */
final class TopKBuffer(val k: Int) {
  var items = new Array[Long](math.min(k, 16))
  var scores = new Array[Long](math.min(k, 16))
  var n = 0

  /** true if (s1, i1) outranks (s2, i2) in the top-k order. */
  @inline private def better(i1: Long, s1: Long, i2: Long, s2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def worstIdx: Int = {
    var w = 0
    var j = 1
    while (j < n) {
      if (better(items(w), scores(w), items(j), scores(j))) w = j
      j += 1
    }
    w
  }

  def add(item: Long, score: Long): Unit = {
    if (n < k) {
      if (n == items.length) {
        items = java.util.Arrays.copyOf(items, math.min(k, items.length * 2))
        scores = java.util.Arrays.copyOf(scores, math.min(k, scores.length * 2))
      }
      items(n) = item; scores(n) = score; n += 1
    } else {
      // full: replace the worst element iff the newcomer outranks it.
      // k is small (an agg that returns k rows per group); the linear
      // scan keeps the buffer allocation-free and serialization trivial.
      val w = worstIdx
      if (better(item, score, items(w), scores(w))) {
        items(w) = item; scores(w) = score
      }
    }
  }

  def sortedPairs: Array[(Long, Long)] = {
    val out = Array.tabulate(n)(i => (items(i), scores(i)))
    out.sortBy { case (i, s) => (-s, i) }
  }
}

case class TopKAgg(
    left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), "k must be in [1, 2^20]")

  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", LongType, nullable = false),
      StructField("score", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects integral (item, score), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case LongType => v.asInstanceOf[Long]
    case _ => v.asInstanceOf[Int].toLong
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val i = left.eval(input)
    val s = right.eval(input)
    if (i != null && s != null) b.add(asLong(left, i), asLong(right, s))
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < o.n) { b.add(o.items(j), o.scores(j)); j += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sortedPairs.map { case (i, s) =>
      new GenericInternalRow(Array[Any](i, s))
    }.asInstanceOf[Array[Any]])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * b.n)
    bb.putInt(b.k).putInt(b.n)
    var j = 0
    while (j < b.n) { bb.putLong(b.items(j)); bb.putLong(b.scores(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var j = 0
    while (j < n) { val i = bb.getLong(); val s = bb.getLong(); b.add(i, s); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKAgg =
    copy(left = l, right = r)
}
