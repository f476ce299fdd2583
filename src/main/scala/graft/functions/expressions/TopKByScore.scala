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
  // k = 0 would make insert() index slot -1 in executors — fail at
  // construction (driver-side for the aggregate) with a clear message
  require(k > 0, s"top-k aggregate needs k > 0, got $k")
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

  require(k > 0, s"TopKByScore needs k > 0, got $k")

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

/** [[TopKBuffer]]'s payload-carrying twin: the k best
  * (score, id, payload-row) triples, same ordering contract. */
final class TopKRowsBuffer(val k: Int) {
  require(k > 0, s"top-k aggregate needs k > 0, got $k")
  var n = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  val rows = new Array[InternalRow](k)

  private def before(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  def insert(s: Double, id: Long, r: InternalRow): Unit = {
    if (n == k && !before(s, id, n - 1)) return
    var pos = if (n < k) n else n - 1
    while (pos > 0 && before(s, id, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1)
      rows(pos) = rows(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = id; rows(pos) = r
    if (n < k) n += 1
  }

  def merge(o: TopKRowsBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i), o.rows(i)); i += 1 }
  }
}

/** `top_k_rows(score, id, payload, k)` — the metadata-carrying form of
  * [[TopKByScore]]: returns `array<struct<score, id, payload>>`
  * score-desc / id-asc.
  *
  * This is what makes a BATCH search one corpus scan: the id-only
  * aggregate would force a second scan to re-attach each hit's
  * metadata (doc name, content, …), which doubles the read at 100 TB;
  * carrying the payload through the bounded buffer keeps the partial
  * top-k shuffle shape (≤ k rows per group per partition) while the
  * scan stays single-pass. Payload rows are copied on insert (Spark
  * reuses row buffers) and ship as UnsafeRow bytes in the merge. */
case class TopKRows(
    score: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  require(k > 0, s"TopKRows needs k > 0, got $k")

  private lazy val payloadType = payload.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(payloadType)

  override def children: Seq[Expression] = Seq(score, id, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", DoubleType).add("id", LongType).add("payload", payloadType))

  override def createAggregationBuffer(): TopKRowsBuffer = new TopKRowsBuffer(k)

  override def update(b: TopKRowsBuffer, input: InternalRow): TopKRowsBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    val p = payload.eval(input)
    if (s != null && i != null && p != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        p.asInstanceOf[InternalRow].copy())
    b
  }

  override def merge(b: TopKRowsBuffer, o: TopKRowsBuffer): TopKRowsBuffer = {
    b.merge(o); b
  }

  override def eval(b: TopKRowsBuffer): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      out(i) = InternalRow(b.scores(i), b.ids(i), b.rows(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKRowsBuffer): Array[Byte] = {
    val rowBytes = new Array[Array[Byte]](b.n)
    var total = 8 + b.n * 20
    var i = 0
    while (i < b.n) {
      // clone: UnsafeRow.getBytes may return the projection's REUSED
      // backing buffer (no copy when sizeInBytes == buffer length), and
      // this loop projects row i+1 before row i's bytes are written out
      // — aliasing would silently ship row i with row i+1's payload
      rowBytes(i) = toUnsafe(b.rows(i)).getBytes.clone()
      total += rowBytes(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(b.k).putInt(b.n)
    i = 0
    while (i < b.n) {
      bb.putDouble(b.scores(i)).putLong(b.ids(i))
      bb.putInt(rowBytes(i).length).put(rowBytes(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKRowsBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      val len = bb.getInt()
      val rb = new Array[Byte](len)
      bb.get(rb)
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(payloadType.length)
      row.pointTo(rb, len)
      buf.insert(s, id, row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKRows =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKRows =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKRows =
    copy(score = c(0), id = c(1), payload = c(2))
}

object TopKRows {
  import org.apache.spark.sql.graft.ColumnBridge
  def apply(score: Column, id: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      TopKRows(ColumnBridge.expression(score), ColumnBridge.expression(id),
        ColumnBridge.expression(payload), k).toAggregateExpression())
}
