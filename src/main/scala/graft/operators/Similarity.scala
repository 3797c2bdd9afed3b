package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.sources.Tables

/** Similarity search over the embedding column (SURVEY §2.4).
  *
  * s01 is the exact baseline (broadcast queries × all vectors — linear in
  * corpus size, embarrassingly parallel, no shuffle until the tiny top-k);
  * s02/s03 are the sublinear scale paths (LSH buckets / IVF cells) that
  * only score a fraction of the corpus per query.
  */
object Similarity {

  private val K = 5

  /** Query set: every 50th vector. */
  private def queries(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  private def topK(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** s01: exact top-5 cosine neighbors per query (brute force baseline). */
  def s01AnnBruteforce(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val scored = e.crossJoin(broadcast(queries(spark, sfDir)))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
    topK(scored)
  }

  /** Rank ties broken by neighbor_id; sims computed in double on both
    * engines, so rank flips would need two sims within ~1e-15 — not a
    * thing for random float vectors.
    */
  val s01Oracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
      |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id)
      |SELECT query_id, neighbor_id, rnk FROM (
      |  SELECT query_id, neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
      |  FROM scored)
      |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** s02: hyperplane-LSH ANN — L=4 independent hash tables of 8 bits each,
    * with 1-bit multiprobe (9 probe keys per table). A candidate is any
    * vector sharing a probed bucket in any table; only candidates are
    * scored (~15% of a uniform corpus vs 100% for brute force; real
    * embedding corpora cluster, so the fraction drops further at scale).
    */
  def s02AnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val bits = 8
    val tables = 4
    def seed(t: Int): Long = 0x5eedL + t * 7919L

    val e = Tables.embeddings(spark, sfDir)
    val keyed = e.select(col("vec_id"), col("embedding"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), F.rpBits(col("embedding"), bits, seed(t)).as("key"))): _*)).as("tk"))
      .select(col("vec_id"), col("embedding"), col("tk.t").as("t"), col("tk.key").as("key"))

    val probes = queries(spark, sfDir)
      .select(col("query_id"), col("qv"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), F.rpBits(col("qv"), bits, seed(t)).as("qkey"))): _*)).as("tk"))
      .select(col("query_id"), col("qv"), col("tk.t").as("t"),
        explode(expr(s"transform(sequence(0, $bits), i -> CASE WHEN i = 0 THEN tk.qkey " +
          "ELSE tk.qkey ^ CAST(pow(2, i - 1) AS BIGINT) END)")).as("key"))

    val scored = keyed.join(broadcast(probes), Seq("t", "key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("qv"), col("embedding"))
      .distinct()
      .select(col("query_id"), col("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
    topK(scored)
  }

  /** s03: IVF ANN — deterministic coarse quantizer (every 25th vector is a
    * centroid), vectors assigned to their nearest centroid cell, queries
    * probe the 3 nearest cells. Broadcast centroids both times; the big
    * side never shuffles until the top-k.
    */
  def s03AnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val centroids = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))

    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell").asc)
    val assigned = e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cell"),
        F.cosine(col("embedding"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))

    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cell").asc)
    val probes = queries(spark, sfDir).crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cell"),
        F.cosine(col("qv"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("qv"), col("cell"))

    val scored = assigned.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
    topK(scored)
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "s01_ann_bruteforce" -> ((s01AnnBruteforce _, s01Oracle)),
    "s02_ann_lsh"        -> ((s02AnnLsh _, "")),
    "s03_ann_ivf"        -> ((s03AnnIvf _, "")),
  )
}
