package graft.functions

import java.nio.ByteBuffer
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
  extends TypedImperativeAggregate[CappedCollectLongs.Buf] with UnaryLike[Expression] {

  import CappedCollectLongs.Buf

  require(cap >= 1, s"cap must be positive, got $cap")

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
