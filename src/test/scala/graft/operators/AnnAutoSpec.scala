package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** The s02→IVF candidate-volume auto-flip (SURVEY §8 growth path): the
  * occupancy estimator tracks the measured candidate-linear behavior of
  * multiprobe LSH, and the router picks LSH under the budget, IVF past
  * it — pinned by decision, not just by output rows.
  */
class AnnAutoSpec extends SparkSpec {

  test("occupancy estimate is sane and grows ~linearly with the corpus") {
    val e1 = Tables.embeddings(spark, sf) // sf0.001
    val n1 = e1.count()
    val est1 = Similarity.lshCandidateEstimate(e1, tables = 16, probeBits = 2)
    assert(est1 > 0.0)
    // uniform-corpus analytics: masks=37, key space 256/table → estimate
    // ≈ 2.3 N once buckets saturate; small corpora sit under saturation,
    // so the estimate stays within [N/4, 40N]
    assert(est1 >= n1 / 4.0 && est1 <= 40.0 * n1, s"est=$est1 n=$n1")
    val e10 = Tables.embeddings(spark, "/root/testdata/sf0.01") // ~10x
    val n10 = e10.count()
    val est10 = Similarity.lshCandidateEstimate(e10, tables = 16, probeBits = 2)
    val ratio = est10 / est1
    val nRatio = n10.toDouble / n1
    assert(ratio >= nRatio / 4 && ratio <= nRatio * 4,
      s"estimate must track corpus growth: est ratio $ratio vs n ratio $nRatio")
  }

  test("router: LSH under the budget, IVF past it; both routes serve top-k") {
    // sf0.001 (~600 vectors): comfortably under the default budget
    val (route1, df1) = Similarity.annTopKAuto(spark, sf)
    assert(route1 == "lsh")
    assert(df1.count() > 0)
    // a tiny budget forces the IVF route on the same corpus
    val (route2, df2) = Similarity.annTopKAuto(spark, sf, budgetPerQuery = 10L)
    assert(route2 == "ivf")
    assert(df2.count() > 0)
    // both routes speak the same shape (query_id, neighbor_id, rnk)
    assert(df1.columns.toSeq == df2.columns.toSeq)
  }
}
