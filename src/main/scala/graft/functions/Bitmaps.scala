package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Row-position bitmaps for deletion vectors (Iceberg v3 / Delta DV shape:
  * one compact bitmap of deleted row positions per data file, replacing
  * row-per-delete position-delete files).
  *
  * Encoding is adaptive per bitmap, chosen by size at encode time:
  *   header 0 — DENSE bitset, little-endian bit order
  *              (bit p set ⟺ bytes(1 + p/8) & (1 << (p%8)) != 0);
  *   header 1 — SPARSE sorted positions, 8-byte little-endian longs,
  *              membership by binary search.
  * Dense wins past ~1/64 of rows deleted; sparse keeps a handful of
  * deletes on a 10M-row file at O(deletes) bytes instead of O(rows/8).
  * (Roaring would subsume both — no such dependency ships in this
  * environment, and two branches keep `contains` codegen-trivial.)
  *
  * Positions are row indexes WITHIN one data file, so they fit far below
  * the dense encoder's 2³⁴ addressable bound for any sane file size; the
  * encoder falls back to sparse beyond it rather than failing.
  */
object Bitmaps {
  final val Dense: Byte = 0
  final val Sparse: Byte = 1

  private def readLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  private def writeLong(b: Array[Byte], off: Int, v: Long): Unit = {
    var x = v
    var i = 0
    while (i < 8) { b(off + i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
  }

  /** Encode SORTED DISTINCT non-negative positions, picking the smaller
    * of the two layouts.
    */
  def encode(sorted: Array[Long]): Array[Byte] = {
    if (sorted.isEmpty) return Array(Sparse)
    val maxPos = sorted(sorted.length - 1)
    val denseBytes = maxPos / 8 + 2 // header + bitset
    val sparseBytes = 1L + 8L * sorted.length
    if (denseBytes <= sparseBytes && denseBytes <= Int.MaxValue.toLong) {
      val out = new Array[Byte](denseBytes.toInt)
      out(0) = Dense
      var i = 0
      while (i < sorted.length) {
        val p = sorted(i)
        out(1 + (p >>> 3).toInt) = (out(1 + (p >>> 3).toInt) | (1 << (p & 7L).toInt)).toByte
        i += 1
      }
      out
    } else {
      val out = new Array[Byte](sparseBytes.toInt)
      out(0) = Sparse
      var i = 0
      while (i < sorted.length) { writeLong(out, 1 + 8 * i, sorted(i)); i += 1 }
      out
    }
  }

  def contains(bm: Array[Byte], pos: Long): Boolean =
    if (pos < 0) false
    else if (bm(0) == Dense) {
      val byteIdx = 1L + (pos >>> 3)
      byteIdx < bm.length && (bm(byteIdx.toInt) & (1 << (pos & 7L).toInt)) != 0
    } else {
      var lo = 0
      var hi = (bm.length - 1) / 8 - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = readLong(bm, 1 + 8 * mid)
        if (v == pos) return true
        else if (v < pos) lo = mid + 1
        else hi = mid - 1
      }
      false
    }

  def cardinality(bm: Array[Byte]): Long =
    if (bm(0) == Dense) {
      var c = 0L
      var i = 1
      while (i < bm.length) { c += java.lang.Integer.bitCount(bm(i) & 0xff); i += 1 }
      c
    } else ((bm.length - 1) / 8).toLong

  /** Decode to a sorted positions array (the explode side of bitmap
    * folding: `positions → re-aggregate` reuses one aggregator for both
    * build-from-rows and OR-merge).
    */
  def positionsArray(bm: Array[Byte]): Array[Long] =
    if (bm(0) == Dense) {
      val out = mutable.ArrayBuilder.make[Long]
      var i = 1
      while (i < bm.length) {
        val b = bm(i) & 0xff
        if (b != 0) {
          var bit = 0
          while (bit < 8) {
            if ((b & (1 << bit)) != 0) out += ((i - 1).toLong << 3) | bit.toLong
            bit += 1
          }
        }
        i += 1
      }
      out.result()
    } else {
      val n = (bm.length - 1) / 8
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = readLong(bm, 1 + 8 * i); i += 1 }
      out
    }

  def positions(bm: Array[Byte]): ArrayData = new GenericArrayData(positionsArray(bm))

  /** OR-fold two encoded bitmaps (DV compaction, r11). Dense∪dense is a
    * straight byte-wise OR with NO decode — the layout stays optimal
    * (the union only adds bits to the already-denser side). Any sparse
    * operand falls back to merge-sorted-positions + re-encode, which
    * re-picks the compact layout for the union.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.length <= 1) return b
    if (b.length <= 1) return a
    if (a(0) == Dense && b(0) == Dense) {
      val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
      val out = java.util.Arrays.copyOf(big, big.length)
      var i = 1
      while (i < small.length) { out(i) = (out(i) | small(i)).toByte; i += 1 }
      out
    } else {
      val pa = positionsArray(a)
      val pb = positionsArray(b)
      val out = new Array[Long](pa.length + pb.length)
      var i = 0; var j = 0; var n = 0
      while (i < pa.length && j < pb.length) {
        val v = if (pa(i) < pb(j)) { val x = pa(i); i += 1; x }
                else if (pb(j) < pa(i)) { val x = pb(j); j += 1; x }
                else { val x = pa(i); i += 1; j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      while (i < pa.length) { out(n) = pa(i); i += 1; n += 1 }
      while (j < pb.length) { out(n) = pb(j); j += 1; n += 1 }
      encode(java.util.Arrays.copyOf(out, n))
    }
  }
}

/** Is row position `right` set in deletion-vector bitmap `left`? The MOR
  * read path's per-row test: the scan side stays a single streamed pass
  * (broadcast-joined to one bitmap row per file), where row-per-delete
  * position files need an anti-join keyed on every deleted row.
  */
case class BitmapContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bitmap_contains"

  override def nullSafeEval(bm: Any, pos: Any): Any =
    Bitmaps.contains(bm.asInstanceOf[Array[Byte]], pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bm, pos) => {
      val su = classOf[Bitmaps.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $su.contains($bm, $pos);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BitmapContains =
    copy(left = newLeft, right = newRight)
}

/** Sorted row positions (array<long>) of a deletion-vector bitmap. */
case class BitmapPositions(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bitmap_positions"

  override def nullSafeEval(bm: Any): Any =
    Bitmaps.positions(bm.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bm => {
      val su = classOf[Bitmaps.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $su.positions($bm);"
    })

  override protected def withNewChildInternal(newChild: Expression): BitmapPositions =
    copy(child = newChild)
}

/** Number of set positions of a deletion-vector bitmap. */
case class BitmapCardinality(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bitmap_cardinality"

  override def nullSafeEval(bm: Any): Any =
    Bitmaps.cardinality(bm.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bm => {
      val su = classOf[Bitmaps.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $su.cardinality($bm);"
    })

  override protected def withNewChildInternal(newChild: Expression): BitmapCardinality =
    copy(child = newChild)
}

/** Builds a deletion-vector bitmap from row positions (one group = one
  * data file). The buffer is the distinct position set — O(deleted rows
  * in the group), the same bound as the delete commit itself; encode
  * picks the compact layout at finish. Write-path only (the read path is
  * the codegen'd [[BitmapContains]]).
  */
class BitmapAgg extends Aggregator[java.lang.Long, mutable.HashSet[Long], Array[Byte]] {
  override def zero: mutable.HashSet[Long] = mutable.HashSet.empty

  override def reduce(b: mutable.HashSet[Long], x: java.lang.Long): mutable.HashSet[Long] = {
    if (x != null) b += x.longValue()
    b
  }

  override def merge(a: mutable.HashSet[Long], b: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    if (a.size >= b.size) { a ++= b; a } else { b ++= a; b }
  }

  override def finish(b: mutable.HashSet[Long]): Array[Byte] = {
    val arr = b.toArray
    java.util.Arrays.sort(arr)
    Bitmaps.encode(arr)
  }

  override def bufferEncoder: Encoder[mutable.HashSet[Long]] =
    implicitly[Encoder[mutable.HashSet[Long]]](Encoders.kryo[mutable.HashSet[Long]])

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** OR-folds already-encoded deletion-vector bitmaps (one group = one data
  * file) — the DV-compaction aggregate: stacked DV files consolidate
  * WITHOUT exploding a billion positions through a shuffle; the buffer is
  * one encoded bitmap (O(bitmap bytes), not O(set positions)), and
  * dense∪dense folds are byte-wise ORs.
  */
class BitmapMergeAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = Array(Bitmaps.Sparse)
  override def reduce(buf: Array[Byte], bm: Array[Byte]): Array[Byte] =
    if (bm == null) buf else Bitmaps.merge(buf, bm)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Bitmaps.merge(a, b)
  override def finish(b: Array[Byte]): Array[Byte] = b
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
