package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** KMV sketch algebra ([[KMinValuesSketch]]): the persistence variant's
  * merge must be associative (stats files fold in any append order), NULL
  * inputs must be skipped (COUNT(DISTINCT) semantics), and the finished
  * buffer must be exact below k.
  */
class SketchesSpec extends AnyFunSuite {

  private def sketchOf(k: Int, xs: Seq[java.lang.Long]): mutable.HashSet[Long] = {
    val agg = new KMinValuesSketch(k)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
  }

  test("merge-then-finish is associative and order-independent") {
    val k = 32
    val agg = new KMinValuesSketch(k)
    val rnd = new scala.util.Random(7)
    val parts: Seq[Seq[java.lang.Long]] =
      Seq.fill(3)(Seq.fill(200)(java.lang.Long.valueOf(rnd.nextLong())))
    val Seq(a, b, c) = parts.map(p => sketchOf(k, p))
    def fin(s: mutable.HashSet[Long]) = agg.finish(s).toSeq
    val left = fin(agg.merge(agg.merge(sketchOf(k, parts(0)), sketchOf(k, parts(1))), sketchOf(k, parts(2))))
    val right = fin(agg.merge(sketchOf(k, parts(0)), agg.merge(sketchOf(k, parts(1)), sketchOf(k, parts(2)))))
    val swapped = fin(agg.merge(agg.merge(c, a), b))
    assert(left == right && left == swapped)
    // and identical to the single-pass sketch of the concatenation
    assert(left == fin(sketchOf(k, parts.flatten)))
  }

  test("NULL inputs are skipped, not hashed") {
    val k = 64
    val agg = new KMinValuesSketch(k)
    val vals: Seq[java.lang.Long] = Seq[java.lang.Long](1L, 2L, 3L, null, null)
    val buf = vals.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    assert(agg.finish(buf).length == 3)
  }

  test("exact below k: the buffer IS the distinct hash set") {
    val k = 128
    val distinct = (1L to 100L).map(java.lang.Long.valueOf)
    val withDups = distinct ++ distinct ++ distinct
    val buf = sketchOf(k, withDups)
    val arr = new KMinValuesSketch(k).finish(buf)
    assert(arr.length == 100)
    assert(KMinValues.estimate(k, arr) == 100L)
  }

  test("estimate past k stays within the 1/sqrt(k-2) error band") {
    val k = 1024
    val n = 50000
    val rnd = new scala.util.Random(13)
    // hash-like uniform inputs (the production path feeds xxhash64 output)
    val buf = sketchOf(k, Seq.fill(n)(java.lang.Long.valueOf(rnd.nextLong())))
    val est = KMinValues.estimate(k, new KMinValuesSketch(k).finish(buf))
    val err = math.abs(est.toDouble - n) / n
    assert(err < 5.0 / math.sqrt(k - 2), s"estimate $est vs $n (err $err)")
  }
}
