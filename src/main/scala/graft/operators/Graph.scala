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

    var cached = vertices.select(col("id"), col("id").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cached
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = und.join(labels, und("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // one job per iteration: materialize new labels and count changes in
      // the same pass via an accumulator
      val changedAcc = vertices.sparkSession.sparkContext.longAccumulator(s"cc_changed_$iter")
      next.foreach { r =>
        if (r.getLong(r.fieldIndex("old_label")) != r.getLong(r.fieldIndex("label")))
          changedAcc.add(1L)
      }
      cached.unpersist()
      cached = next
      labels = next.select(col("id"), col("label"))
      converged = changedAcc.value == 0L
      iter += 1
    }
    // pin the (small) result and release every intermediate cache — CC is
    // often called inside larger pipelines and must not leak executor memory
    val result = labels.select(col("id"), col("label").as("cluster_id"))
      .localCheckpoint(true)
    cached.unpersist()
    und.unpersist()
    result
  }
}
