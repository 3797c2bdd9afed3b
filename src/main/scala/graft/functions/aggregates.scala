package graft.functions

import java.nio.ByteBuffer
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

object CappedCollectLongs {
  /** Aggregation state: the true bucket size plus at most `cap` collected
    * ids. Once `ids` hits the cap, further ids only bump the count — the
    * bucket is already known dead (eval returns null past the cap), so the
    * buffer stays O(cap) no matter how hot the bucket is.
    */
  final class Buf(var count: Long, val ids: ArrayBuffer[Long])

  /** Test-only peak-buffer probe: when non-null, every buffer append and
    * merge records the buffer's id-array length, so a spec can pin that no
    * aggregation buffer ever grew past O(cap) on a mega-bucket corpus. A
    * single volatile read per append when disabled.
    */
  @volatile var bufferProbe: AtomicLong = null

  private def recordProbe(n: Int): Unit = {
    val p = bufferProbe
    if (p != null) p.getAndAccumulate(n.toLong, math.max(_, _))
  }
}

/** collect_list of a LONG column, bounded at `cap` elements of state per
  * bucket: the true element count is tracked exactly, but ids stop
  * accumulating at the cap, and eval returns NULL for any bucket with
  * fewer than 2 or more than `cap` elements. This is the scale-safe core
  * of LSH bucket blocking (Dedup.cappedBucketPairs): a boilerplate bucket
  * with 10^8 members costs O(cap) buffer memory instead of materializing
  * every id in one task's aggregation buffer before a post-hoc size filter
  * could drop it.
  *
  * Correctness of the cap: ids are only truncated once count exceeds cap,
  * and any bucket whose (merged) count exceeds cap evals to NULL — so
  * every non-null output array is complete and equals collect_list's.
  */
case class CappedCollectLongs(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectLongs.Buf] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  import CappedCollectLongs.Buf

  require(cap >= 1, s"cap must be positive, got $cap")

  // same hardening as TopKSimPairs: an int id column casts at analysis
  // instead of ClassCastException-ing in update() mid-task (declared as
  // Seq[DataType] — AbstractDataType is private[sql]; Seq is covariant)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_capped_collect"

  override def createAggregationBuffer(): Buf =
    new Buf(0L, new ArrayBuffer[Long](math.min(cap, 16)))

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.count += 1L
      if (buf.ids.length < cap) {
        buf.ids += v.asInstanceOf[Long]
        CappedCollectLongs.recordProbe(buf.ids.length)
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    buf.count += other.count
    var i = 0
    val n = other.ids.length
    while (i < n && buf.ids.length < cap) {
      buf.ids += other.ids(i)
      i += 1
    }
    CappedCollectLongs.recordProbe(buf.ids.length)
    buf
  }

  override def eval(buf: Buf): Any =
    if (buf.count < 2L || buf.count > cap.toLong) null
    else new GenericArrayData(buf.ids.toArray)

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + 8 * buf.ids.length)
    bb.putLong(buf.count)
    bb.putInt(buf.ids.length)
    buf.ids.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val n = bb.getInt
    val ids = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { ids += bb.getLong; i += 1 }
    new Buf(count, ids)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectLongs =
    copy(child = newChild)
}

object TopKSimPairs {
  /** Bounded top-k state: parallel arrays sorted by (sim desc, id asc),
    * at most k entries — O(k) per group NO MATTER how many rows score.
    */
  final class Buf(var n: Int, val sims: Array[Double], val ids: Array[Long])
}

/** Per-group top-k of (sim, id) pairs under (sim DESC, id ASC) order — the
  * bounded-state replacement for `row_number().over(Window.partitionBy(q)
  * .orderBy(sim desc)) <= k` in the ANN linear-scan tail.
  *
  * WHY: the window/WindowGroupLimit form must SORT every map partition's
  * full (corpus-slice × queries) pair stream before its rank filter —
  * 8×10^10 pairs at sf100 spilled >65 GB of sort runs per wave and killed
  * s09 with disk exhaustion (ENOSPC, r18 measured). As a partial
  * aggregate, state is k entries per query per task (~16 bytes each): the
  * pair stream is consumed ROW BY ROW with an O(1) reject against the
  * current k-th sim, nothing is ever sorted or spilled, and the exchange
  * carries only nTasks×nQueries×k pre-reduced rows. This is the
  * aggregate-shaped top-k every distributed ANN scan ships.
  *
  * Ordering matches the window it replaces exactly: sim desc, id asc
  * tiebreak under Spark's TOTAL double order (java.lang.Double.compare:
  * NaN greatest so it ranks FIRST under desc, -0.0 < 0.0 — primitive
  * `>` would instead drop NaN when the buffer is full and break the
  * sorted invariant when not); null sim/id rows are skipped (the window
  * form ranks nulls last, so outputs agree whenever a query has ≥k
  * non-null candidates — ANN scans always do; the <k boundary and the
  * NaN-first order are pinned in SimilaritySpec). Inputs implicit-cast
  * to (double, long): a float sim / int id column is cast at analysis
  * instead of ClassCastException-ing mid-task.
  */
case class TopKSimPairs(
    sim: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSimPairs.Buf] with BinaryLike[Expression]
  with ImplicitCastInputTypes {

  import TopKSimPairs.Buf

  require(k >= 1, s"k must be positive, got $k")

  override def left: Expression = sim
  override def right: Expression = id
  // declared as Seq[DataType]: AbstractDataType is private[sql] to Scala
  // sources outside org.apache.spark, and Seq is covariant so this
  // satisfies ExpectsInputTypes.inputTypes: Seq[AbstractDataType]
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("sim", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k_pairs"

  override def createAggregationBuffer(): Buf =
    new Buf(0, new Array[Double](k), new Array[Long](k))

  /** (s, i) sorts before position p's entry under (sim desc, id asc)?
    * Total order via java.lang.Double.compare — Spark's own DoubleType
    * ordering — so NaN (greatest → first under desc) and -0.0 < 0.0
    * agree with the rank window this aggregate replaces; primitive
    * comparisons would make NaN beat nothing AND lose to nothing,
    * corrupting the sorted-prefix invariant.
    */
  private def beats(buf: Buf, p: Int, s: Double, i: Long): Boolean = {
    val c = java.lang.Double.compare(s, buf.sims(p))
    c > 0 || (c == 0 && i < buf.ids(p))
  }

  private def insert(buf: Buf, s: Double, i: Long): Unit = {
    if (buf.n == k && !beats(buf, k - 1, s, i)) return
    // binary search for insertion point in the sorted prefix
    var lo = 0
    var hi = buf.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (beats(buf, mid, s, i)) hi = mid else lo = mid + 1
    }
    if (lo >= k) return
    val last = math.min(buf.n, k - 1)
    var j = last
    while (j > lo) {
      buf.sims(j) = buf.sims(j - 1); buf.ids(j) = buf.ids(j - 1); j -= 1
    }
    buf.sims(lo) = s
    buf.ids(lo) = i
    if (buf.n < k) buf.n += 1
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = sim.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    var j = 0
    while (j < other.n) { insert(buf, other.sims(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: Buf): Any = {
    val rows = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) {
      rows(j) = InternalRow(buf.sims(j), buf.ids(j)); j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var j = 0
    while (j < buf.n) { bb.putDouble(buf.sims(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf(n, new Array[Double](k), new Array[Long](k))
    var j = 0
    while (j < n) { buf.sims(j) = bb.getDouble; buf.ids(j) = bb.getLong; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSimPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSimPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKSimPairs =
    copy(sim = newLeft, id = newRight)
}
