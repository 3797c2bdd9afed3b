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

  /** s02: hyperplane-LSH ANN — L=16 independent hash tables of 8 bits
    * each, with 2-bit multiprobe (1 + 8 + C(8,2) = 37 probe keys per
    * table). A candidate is any vector sharing a probed bucket in any
    * table; only candidates are scored. On UNIFORM random vectors (the
    * adversarial case: true top-5 sims sit near the bulk) this puts
    * per-query recall ≈0.95; real embedding corpora cluster, so the same
    * L scores a far smaller fraction at scale. The bucket join carries
    * bare ids — embeddings and query vectors join back AFTER candidate
    * dedup, so the shuffle never moves a 64-float payload per
    * (table × probe) hit. Probe masks are plan-time literals (XOR of the
    * query key), so the probe side stays a tiny broadcast.
    */
  def s02AnnLsh(spark: SparkSession, sfDir: String): DataFrame =
    s02AnnLsh(spark, sfDir, tables = 16, probeBits = 2)

  private[graft] def s02AnnLsh(spark: SparkSession, sfDir: String,
      tables: Int, probeBits: Int = 1): DataFrame = {
    val bits = 8
    def seed(t: Int): Long = 0x5eedL + t * 7919L
    // All XOR masks with popcount <= probeBits over the low `bits` bits.
    val masks: Seq[Long] = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeBits)

    val e = Tables.embeddings(spark, sfDir)
    val keyed = e.select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), F.rpBits(col("embedding"), bits, seed(t)).as("key"))): _*)).as("tk"))
      .select(col("vec_id"), col("tk.t").as("t"), col("tk.key").as("key"))

    val probes = queries(spark, sfDir)
      .select(col("query_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), F.rpBits(col("qv"), bits, seed(t)).as("qkey"))): _*)).as("tk"))
      .select(col("query_id"), col("tk.t").as("t"),
        explode(array(masks.map(m => col("tk.qkey").bitwiseXOR(lit(m))): _*)).as("key"))

    val cands = keyed.join(broadcast(probes), Seq("t", "key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val scored = cands
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .join(broadcast(queries(spark, sfDir)), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
    topK(scored)
  }

  /** Spherical k-means training for the IVF coarse quantizer: seed with a
    * deterministic sample, then Lloyd iterations run as Spark jobs —
    * assignment is a map-only pass against broadcast centroids, the
    * centroid update is a posexplode + groupBy(cell, dim) mean over
    * L2-NORMALIZED vectors (cosine geometry: magnitude must not bias the
    * mean). Only the k×dim centroid table ever reaches the driver; the
    * corpus itself never shuffles. At 100 TB training would read a bounded
    * sample of the corpus — the iteration structure is unchanged.
    */
  private[graft] def trainCentroids(e: DataFrame, sampleEvery: Int,
      iters: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val unit = expr(
      "transform(embedding, x -> CAST(x / sqrt(aggregate(embedding, 0D, (a, v) -> a + CAST(v AS DOUBLE) * v)) AS FLOAT))")
    val normed = e.select(col("vec_id"), unit.as("embedding"))
    var centroids = normed.filter(col("vec_id") % sampleEvery === 0)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    for (_ <- 1 to iters) {
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell").asc)
      val assigned = normed.crossJoin(broadcast(centroids))
        .select(col("vec_id"), col("embedding"), col("cell"),
          F.cosine(col("embedding"), col("cv")).as("csim"))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
      val means = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
      val rebuilt = means.groupBy(_.getLong(0)).toSeq.map { case (cell, rows) =>
        (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat))
      }
      centroids = rebuilt.toDF("cell", "cv")
    }
    centroids
  }

  /** s03: IVF ANN — k-means-trained coarse quantizer (seeded from every
    * 25th vector, 3 Lloyd iterations), vectors assigned to their nearest
    * centroid cell, queries probe the 4 nearest cells (~10% of a balanced
    * corpus at k = N/25). Broadcast centroids both times; the big side
    * never shuffles until the top-k. Training balances the cells, so the
    * probed fraction is nProbe/k by construction instead of whatever the
    * skew of an untrained quantizer happens to give.
    */
  def s03AnnIvf(spark: SparkSession, sfDir: String): DataFrame =
    s03AnnIvf(spark, sfDir, sampleEvery = 25, nProbe = 4, iters = 3)

  private[graft] def s03AnnIvf(spark: SparkSession, sfDir: String,
      sampleEvery: Int, nProbe: Int, iters: Int): DataFrame = {
    val e = Tables.embeddings(spark, sfDir).persist()
    val centroids = trainCentroids(e, sampleEvery, iters)

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
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))

    val scored = assigned.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
    val out = topK(scored).localCheckpoint(true)
    e.unpersist()
    out
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "s01_ann_bruteforce" -> ((s01AnnBruteforce _, s01Oracle)),
    "s02_ann_lsh"        -> ((s02AnnLsh _, "")),
    "s03_ann_ivf"        -> ((s03AnnIvf _, "")),
  )
}
