package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregation buffer: keeps the k best (score, id)
  * pairs, score-descending with ascending id tie-break. */
final class TopKBuffer(val k: Int) {
  // simple insertion into a sorted array — k is small (≤ 100s), and
  // the dominant cost is the scan feeding it, not the insert
  var n = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  /** true if (s,id) orders strictly before slot i. */
  private def before(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !before(s, id, n - 1)) return
    var pos = if (n < k) n else n - 1
    while (pos > 0 && before(s, id, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (n < k) n += 1
  }

  def merge(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** Partial top-k aggregate: `top_k_by_score(score, id, k)` returns
  * `array<struct<score:double, id:bigint>>` sorted score-desc /
  * id-asc.
  *
  * This is the scale-critical replacement for
  * `row_number().over(Window.partitionBy(q).orderBy(score))`: the
  * window form shuffles EVERY (query, candidate) pair to rank them;
  * this aggregate combines map-side, so each partition contributes at
  * most k rows per group to the exchange — |partitions|·k instead of
  * |corpus| rows per query. At 1000 executors × 100 TB that is the
  * difference between a bounded merge and an unshufflable firehose.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", DoubleType).add("id", LongType))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = { b.merge(o); b }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = InternalRow(b.scores(i), b.ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + b.n * 16)
    bb.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.scores(i)).putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1))
}

object TopKByScore {
  import org.apache.spark.sql.graft.ColumnBridge
  def apply(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
