package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph helpers for dedup clustering. */
object Graph {

  /** Connected components by iterative min-label propagation (hash-to-min):
    * each vertex repeatedly adopts the smallest label among itself and its
    * neighbors until fixpoint. Converges in O(diameter) rounds; dedup
    * graphs are near-cliques, so 2-3 rounds in practice. Each round is one
    * shuffle on vertex id — no driver-side data beyond the convergence
    * flag.
    *
    * Each round's labels are EAGERLY localCheckpoint'ed, not persist'ed:
    * persist keeps the full logical lineage, so round r's plan nests all
    * r-1 predecessors — plan stringification (which `persist` itself
    * triggers for the cache name) and re-optimization grow superlinearly
    * and stall past ~10 rounds on a long-chain graph. The checkpoint cuts
    * lineage to the materialized RDD: every round plans O(1) work no
    * matter the diameter.
    *
    * @param vertices one column `id`
    * @param edges    columns `src`, `dst` (undirected semantics)
    * @return (id, cluster_id) where cluster_id = min reachable id
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = vertices.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = und.join(labels, und("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint(true)
      // convergence probe over the checkpointed round: a limit-1 scan,
      // no recomputation
      converged = stepped.filter(col("old_label") =!= col("label")).isEmpty
      labels = stepped.select(col("id"), col("label"))
      iter += 1
    }
    // partial labels are WRONG labels: refuse loudly instead of returning
    // a half-propagated clustering (hash-to-min needs O(diameter) rounds;
    // dedup graphs are near-cliques, so hitting this means the caller fed
    // a pathological chain and must raise maxIter)
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter); raise maxIter")
    // pin the (small) result and release the edge cache — CC is often
    // called inside larger pipelines and must not leak executor memory
    // (per-round checkpoint RDDs are reclaimed by the context cleaner
    // once unreferenced)
    val result = labels.select(col("id"), col("label").as("cluster_id"))
      .localCheckpoint(true)
    und.unpersist()
    result
  }
}
