package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable aggregation state: parallel (score, id) arrays, bounded to
  * 2k entries between compactions — O(k) memory per group regardless
  * of input size. */
final class TopKState(var scores: Array[Double], var ids: Array[Long],
                      var n: Int)

/** `topk_by(score, id, k)` — BOUNDED top-k as a first-class aggregate
  * (the 100 TB batch-serving primitive): per-group top k rows by
  * (score DESC, id ASC), with partial aggregation doing the work
  * map-side. The naive plans both fail at scale — a rank window
  * shuffles EVERY scored row to its group's partition before ranking,
  * and `collect_list`+slice holds unbounded state; this aggregate's
  * partial buffers never exceed 2k entries, so the exchange carries at
  * most k rows per (partition, group) and memory is O(k) per group.
  * Ties break on the LOWER id, the same total order as
  * `ROW_NUMBER() OVER (ORDER BY score DESC, id)` — so an oracle can
  * recompute the result exactly (round scores first; ranking on raw
  * doubles is cross-engine-stable only when the score itself is).
  *
  * Returns ARRAY<STRUCT<score DOUBLE, id BIGINT>> sorted (score DESC,
  * id ASC); fewer than k entries when the group is smaller. */
case class TopKBy(score: Expression, id: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {
  require(k >= 1 && k <= (1 << 20),
    s"topk_by: k must be in [1, ${1 << 20}], got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "topk_by(score DOUBLE, id BIGINT, k): got " +
        s"(${score.dataType.sql}, ${id.dataType.sql}) — cast explicitly")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): TopKState =
    new TopKState(new Array[Double](16), new Array[Long](16), 0)

  /** The one total order everywhere: higher score first, lower id on
    * ties. NaN scores sort LAST (they compare false both ways). */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2) || (s2.isNaN && !s1.isNaN)

  /** Keep the k best, sorted — runs at most every k appends, so the
    * amortized cost is one O(m log m) sort per k inputs (m ≤ 2k). */
  private def compact(st: TopKState, bound: Int,
                      force: Boolean = false): Unit = {
    if (!force && st.n <= bound) return
    val idx = Array.range(0, st.n).sortWith((a, b) =>
      better(st.scores(a), st.ids(a), st.scores(b), st.ids(b)))
    val keep = math.min(bound, st.n)
    val ns = new Array[Double](math.max(16, keep * 2))
    val ni = new Array[Long](ns.length)
    var j = 0
    while (j < keep) { ns(j) = st.scores(idx(j)); ni(j) = st.ids(idx(j)); j += 1 }
    st.scores = ns; st.ids = ni; st.n = keep
  }

  private def append(st: TopKState, s: Double, i: Long): Unit = {
    if (st.n == st.scores.length) {
      val cap = st.scores.length * 2
      st.scores = java.util.Arrays.copyOf(st.scores, cap)
      st.ids = java.util.Arrays.copyOf(st.ids, cap)
    }
    st.scores(st.n) = s; st.ids(st.n) = i; st.n += 1
    if (st.n >= 2 * k) compact(st, k)
  }

  override def update(st: TopKState, input: InternalRow): TopKState = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      append(st, sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    st
  }

  override def merge(st: TopKState, other: TopKState): TopKState = {
    var j = 0
    while (j < other.n) { append(st, other.scores(j), other.ids(j)); j += 1 }
    st
  }

  override def eval(st: TopKState): Any = {
    compact(st, k, force = true) // appends since the last compaction
                                 // are unsorted — always sort here
    val out = new Array[Any](st.n)
    var j = 0
    while (j < st.n) {
      out(j) = InternalRow(st.scores(j), st.ids(j)); j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(st: TopKState): Array[Byte] = {
    compact(st, k) // never ship more than k entries
    val bb = ByteBuffer.allocate(4 + st.n * 16)
    bb.putInt(st.n)
    var j = 0
    while (j < st.n) { bb.putDouble(st.scores(j)); bb.putLong(st.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new TopKState(new Array[Double](math.max(16, n)),
      new Array[Long](math.max(16, n)), n)
    var j = 0
    while (j < n) { st.scores(j) = bb.getDouble; st.ids(j) = bb.getLong; j += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(score = newChildren(0), id = newChildren(1))
}
