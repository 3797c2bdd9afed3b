package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deletion-vector bitmap encoding: layout choice, round-trips, and the
  * codegen'd membership/cardinality/positions expressions.
  */
class BitmapsSpec extends SparkSpec {
  import spark.implicits._

  private def roundtrip(pos: Array[Long]): Unit = {
    val bm = Bitmaps.encode(pos)
    assert(Bitmaps.positionsArray(bm).toSeq == pos.toSeq, "positions round-trip")
    assert(Bitmaps.cardinality(bm) == pos.length.toLong, "cardinality")
    pos.foreach(p => assert(Bitmaps.contains(bm, p), s"contains($p)"))
    val missing = (0L to (if (pos.isEmpty) 10L else pos.last + 3)).filterNot(pos.contains)
    missing.take(50).foreach(p => assert(!Bitmaps.contains(bm, p), s"!contains($p)"))
    assert(!Bitmaps.contains(bm, -1L) && !Bitmaps.contains(bm, Long.MaxValue))
  }

  test("empty, singleton, and small sparse sets round-trip (sparse layout)") {
    roundtrip(Array.empty[Long])
    roundtrip(Array(0L))
    roundtrip(Array(7L))
    roundtrip(Array(0L, 1L, 63L, 64L, 1000000L))
    assert(Bitmaps.encode(Array(0L, 1000000L))(0) == Bitmaps.Sparse,
      "two far-apart positions must choose the sparse layout")
  }

  test("dense sets round-trip and the encoder picks the smaller layout") {
    val dense = (0L until 1000L).filter(_ % 3 != 0).toArray
    roundtrip(dense)
    assert(Bitmaps.encode(dense)(0) == Bitmaps.Dense,
      "2/3 of 0..999 set must choose the dense layout")
    // boundary: exactly max/8+2 vs 1+8n bytes — either choice must round-trip
    roundtrip(Array(0L, 8L, 16L, 24L))
    roundtrip((0L until 64L).toArray)
  }

  test("encoder is deterministic and layouts agree on membership") {
    val pos = Array(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L)
    val sparseForced = {
      // force sparse by appending a huge position then dropping it logically:
      // instead, just compare the two public layouts on the same set via
      // encode (dense here) and a handmade sparse encoding
      val out = new Array[Byte](1 + 8 * pos.length)
      out(0) = Bitmaps.Sparse
      pos.zipWithIndex.foreach { case (p, i) =>
        var x = p
        (0 until 8).foreach { j => out(1 + 8 * i + j) = (x & 0xff).toByte; x >>>= 8 }
      }
      out
    }
    val bm = Bitmaps.encode(pos)
    (0L to 40L).foreach(p =>
      assert(Bitmaps.contains(bm, p) == Bitmaps.contains(sparseForced, p),
        s"layouts disagree at $p"))
  }

  test("merge OR-folds across layouts; dense∪dense never decodes wrong") {
    def check(a: Array[Long], b: Array[Long]): Unit = {
      val expect = (a ++ b).distinct.sorted.toSeq
      val merged = Bitmaps.merge(Bitmaps.encode(a), Bitmaps.encode(b))
      assert(Bitmaps.positionsArray(merged).toSeq == expect,
        s"merge(${a.toSeq}, ${b.toSeq})")
      assert(Bitmaps.cardinality(merged) == expect.size.toLong)
    }
    // dense∪dense (byte-wise OR path), overlapping
    check((0L until 600L).filter(_ % 2 == 0).toArray,
      (0L until 900L).filter(_ % 3 == 0).toArray)
    // sparse∪sparse (merge-sorted path), overlapping + disjoint
    check(Array(1L, 1000000L), Array(1L, 5L, 2000000L))
    check(Array(7L), Array(900000L))
    // mixed layouts both orders
    check((0L until 500L).toArray, Array(3L, 1000000L))
    check(Array(3L, 1000000L), (0L until 500L).toArray)
    // empty operands are identity
    check(Array.empty[Long], Array(1L, 2L))
    check(Array(1L, 2L), Array.empty[Long])
    check(Array.empty[Long], Array.empty[Long])
  }

  test("10^6-position bitmap: size bound, round-trip, merge cost (r11 scale pin)") {
    // ~1e6 deleted rows of an 8e6-row file: the DV artifact must stay a
    // few hundred KB (dense layout, maxPos/8 bytes), not 8 MB of longs —
    // the size claim behind "a billion deleted rows is a few hundred MB"
    val rnd = new scala.util.Random(11)
    val pos = Array.fill(1000000)(math.abs(rnd.nextLong()) % 8000000L)
      .distinct.sorted
    val bm = Bitmaps.encode(pos)
    assert(bm(0) == Bitmaps.Dense, "1/8 density must choose dense")
    assert(bm.length <= 8000000 / 8 + 2, s"DV size ${bm.length}")
    assert(Bitmaps.cardinality(bm) == pos.length.toLong)
    // stacked-DV merge at this size is a straight byte OR — microseconds,
    // and the union round-trips exactly
    val pos2 = Array.fill(1000000)(math.abs(rnd.nextLong()) % 8000000L)
      .distinct.sorted
    val t0 = System.nanoTime()
    val merged = Bitmaps.merge(bm, Bitmaps.encode(pos2))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 1000.0, f"dense merge took $ms%.1f ms")
    assert(Bitmaps.cardinality(merged) == (pos ++ pos2).distinct.length.toLong)
  }

  test("DV read plan: bitmap join broadcasts, corpus never sort-merges") {
    // the 100 TB claim for deletion vectors is that the read-side join is
    // O(touched files) bitmap rows on the BUILD side — broadcastable at
    // any delete cardinality. Pin the plan shape: a DV-deleted table must
    // read via BroadcastHashJoin + the codegen'd membership filter, never
    // a sort-merge that shuffles the corpus by file path.
    val t = graft.tables.GraftTable.createAs(spark,
      java.nio.file.Files.createTempDirectory("graft_dvplan").toString + "/t",
      spark.read.parquet(s"$sf/orders.parquet").repartition(4))
    t.deleteMergeOnReadDV("o_orderstatus = 'F'")
    val plan = t.toDF().queryExecution.executedPlan.toString
    assert(plan.contains("graft_bitmap_contains"),
      s"DV application must be the codegen'd membership filter:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bitmap rows must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must never shuffle for DV application:\n$plan")
  }

  test("expressions: contains/cardinality/positions evaluate under codegen") {
    val bm = Bitmaps.encode(Array(2L, 5L, 9L))
    val df = (0L to 10L).toDF("pos").withColumn("bm", lit(bm))
    val hit = df.filter(F.bitmapContains($"bm", $"pos"))
      .select("pos").as[Long].collect().sorted.toSeq
    assert(hit == Seq(2L, 5L, 9L))
    val card = df.limit(1).select(F.bitmapCardinality($"bm")).as[Long].head()
    assert(card == 3L)
    val posArr = df.limit(1).select(F.bitmapPositions($"bm")).as[Seq[Long]].head()
    assert(posArr == Seq(2L, 5L, 9L))
  }

}
