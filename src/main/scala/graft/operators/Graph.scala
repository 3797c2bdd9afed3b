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
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = und.join(labels, und("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.label") =!= col("o.label")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    und.unpersist()
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
