package graft.operators

import graft.operators.Checkpoints._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph helpers for dedup clustering. */
object Graph {

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC '14): each round relinks every vertex toward the minimum of its
    * neighborhood, which provably converges to a forest of stars rooted
    * at each component's minimum id in O(log² n) rounds on ANY graph
    * shape — vs O(diameter) for plain min-label propagation, whose
    * adversarial shape (a transitive near-dup CHAIN: doc A ~ B ~ C ~ …,
    * the template-drift corpus pattern) needs one round per hop. At
    * 100 TB both algorithms are "a few shuffles per round"; the round
    * COUNT is the scale difference, and log²(10¹²) ≈ 40 while a chain's
    * diameter is unbounded.
    *
    * Both phases are a groupBy-min + a join — neighborhoods are never
    * materialized as per-row lists, so the high-degree hub that
    * large-star exists to split can never become a single skewed
    * collect_list row.
    *
    * Each round's edge set is EAGERLY localCheckpoint'ed: persist would
    * keep the full logical lineage, so round r's plan would nest all r−1
    * predecessors and plan work would grow superlinearly with rounds.
    * The checkpoint cuts lineage to the materialized RDD: every round
    * plans O(1) work. Partial convergence REFUSES: half-contracted
    * edges are WRONG labels, never a degraded answer.
    *
    * BELOW `localEdgeCap` canonical edges the labels come from a driver
    * union-find instead ([[localComponents]]): the near-dup graphs the
    * dedup operators feed here are verified-pair edge lists — tiny even
    * on a huge corpus — and each distributed round costs 4+ fixed-overhead
    * shuffle jobs, so at that size the rounds are pure latency. The
    * default cap (256k edges, collected as primitive long pairs) bounds
    * transient driver memory at tens of MB including the union-find maps;
    * identical labels either way (agreement is spec-pinned), and the
    * O(log² n) distributed path is untouched above the cap. Pass 0 to
    * force the distributed rounds (scale specs pin their round budget
    * that way).
    *
    * @param vertices one column `id`
    * @param edges    columns `src`, `dst` (undirected semantics)
    * @return (id, cluster_id) where cluster_id = min reachable id
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20,
      localEdgeCap: Long = 1L << 18): DataFrame = {
    // canonical directed form: max → min, self-loops dropped
    def canon(e: DataFrame): DataFrame =
      e.filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .distinct()

    // large-star: every strictly-larger neighbor v of u relinks to
    // m(u) = min(N(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val und = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      val m = und.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src").as("u"), least(col("src"), col("mn")).as("m"))
      canon(
        und.filter(col("dst") > col("src"))
          .join(m, col("src") === col("u"))
          .select(col("dst").as("src"), col("m").as("dst")))
    }

    // small-star (on the max→min orientation): u and all its smaller
    // neighbors relink to m(u) = min of that set — m < src holds for
    // every group, so m(u) is just the group min
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("src").agg(min("dst").as("m"))
      val relinked = e.join(m.withColumnRenamed("src", "u"), col("src") === col("u"))
        .select(col("dst").as("src"), col("m").as("dst"))
      canon(relinked.unionAll(m.select(col("src"), col("m").as("dst"))))
    }

    var e = canon(edges.select(col("src"), col("dst"))).diskCheckpoint()
    val nEdges = e.count()
    if (nEdges > 0 && nEdges <= localEdgeCap)
      return localComponents(vertices, e)
    var iter = 0
    var converged = nEdges == 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).diskCheckpoint()
      // fixpoint test on the canonical edge set: the round potential
      // strictly decreases until the graph is a union of min-rooted
      // stars (SoCC '14, Thm 1-2), on which both phases are identities —
      // so next == e IS the star forest
      converged = next.count() == e.count() && next.exceptAll(e).isEmpty
      e = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds; raise maxIter")
    // star forest: every non-root vertex has exactly one edge, to its
    // component's minimum id; roots and isolated vertices label themselves
    vertices.select(col("id"))
      .join(e.select(col("src").as("id"), col("dst").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster_id"))
      .diskCheckpoint()
  }

  /** Union-find (path compression, min-id roots) over a collected
    * canonical edge set — the same min-reachable-id labels the star
    * rounds converge to, produced in one driver pass plus one broadcast
    * join. Only called under [[connectedComponents]]'s edge cap, so the
    * collect is bounded by construction; edges collect as PRIMITIVE long
    * pairs (typed Dataset, no Row objects). Non-root labels broadcast —
    * exactly the star forest the distributed path joins with — and the
    * result is eagerly checkpointed like the distributed path's, so
    * downstream consumers plan O(1) work and callers may unpersist their
    * inputs immediately (the d03/d09 pattern).
    */
  private def localComponents(vertices: DataFrame, canonEdges: DataFrame): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    val seen = scala.collection.mutable.HashSet.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) {
        val next = parent.getOrElse(c, c); parent(c) = r; c = next
      }
      r
    }
    canonEdges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].collect().foreach { case (a, b) =>
        seen += a; seen += b
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    val labels = seen.iterator.map(id => (id, find(id)))
      .filter { case (id, r) => id != r }.toSeq
      .toDF("id", "root")
    vertices.select(col("id"))
      .join(broadcast(labels), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster_id"))
      .diskCheckpoint()
  }
}
