package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a REAL aggregate — the scale-correct form of
  * "k best rows per group".
  *
  * The window formulation (`row_number() over (partition by g order by
  * score desc) <= k`) shuffles EVERY input row to its group's partition
  * and sorts the whole group before discarding all but k. This aggregate
  * gets map-side partial combine: each input partition keeps at most k
  * entries per group in a bounded heap, the shuffle carries
  * k x |groups| x |partitions-with-that-group| rows (instead of |rows|),
  * and merge folds heaps. At 100 TB with millions of candidates per probe
  * this is the difference between shuffling the corpus and shuffling the
  * answer. Used by `ann_topk_agg`; bit-equivalence vs the window form is
  * spec-pinned (`TopKAggSpec`).
  *
  * Ordering: score DESC, id ASC on ties — matching the catalog's
  * determinism convention (scores are pre-rounded, e.g. cosine to 6 dp,
  * so the tiebreak is engine-stable). Output:
  * `array<struct<score:double, id:bigint>>`, best first, at most k
  * elements. Null scores/ids are skipped (an aggregate over an empty
  * group yields an empty array).
  */
case class TopKByScoreAggregate(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects (double, bigint), got " +
          s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScoreAggregate.resultType

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      buffer.offer(other.scores(i), other.ids(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val (scores, ids) = buffer.sortedBestFirst
    val rows = new Array[Any](scores.length)
    var i = 0
    while (i < scores.length) {
      rows(i) = new GenericInternalRow(Array[Any](scores(i), ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      buf.offer(bb.getDouble, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScoreAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScoreAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScoreAggregate {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
}

/** Bounded binary min-heap of (score, id) with the WORST entry at the
  * root, so a full buffer evicts in O(log k) when a better entry arrives.
  * "a is worse than b" iff a.score orders below b.score, or scores equal
  * and a.id > b.id (ties prefer the smaller id). Primitive parallel
  * arrays — no boxing on the hot update path.
  *
  * Score comparison is `java.lang.Double.compare`, matching Spark's SQL
  * ordering: NaN sorts ABOVE every real (so a NaN score ranks first under
  * DESC, as the row_number-window twin does) and the order stays a total
  * order — a naive `<` would make NaN incomparable, silently dropping
  * NaN candidates and breaking sortWith's transitivity contract. -0.0 is
  * normalized to 0.0 on entry (Spark normalizes floating zeros in sort
  * keys; Double.compare would order them apart). */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      swap(i, w)
      i = w
    }
  }

  def offer(s0: Double, i: Long): Unit = {
    val s = if (s0 == 0.0) 0.0 else s0 // fold -0.0 into 0.0
    if (size < k) {
      scores(size) = s; ids(size) = i; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown()
    }
  }

  /** (scores, ids) ordered best-first; does not mutate the buffer. */
  def sortedBestFirst: (Array[Double], Array[Long]) = {
    val idx = Array.range(0, size).sortWith((a, b) =>
      worse(scores(b), ids(b), scores(a), ids(a)))
    (idx.map(scores), idx.map(ids))
  }
}
