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

  /** Per-query top-K tail shared by every ANN gate. Shape matters more
    * than it looks: the rank-window form (row_number over partitionBy
    * query) must SORT each map partition's full corpus-slice × query
    * pair stream before ranking — at sf100 that is 8×10^10 pairs and
    * >65 GB of sort spill per wave, which killed s09 with disk
    * exhaustion (ENOSPC, r18). [[graft.functions.TopKSimPairs]] consumes
    * the same stream as a BOUNDED partial aggregate instead: k entries
    * of state per query per task, an O(1) reject against the running
    * k-th sim for almost every pair, no sort anywhere, and the exchange
    * carries only tasks×queries×k pre-reduced rows. Equality with the
    * window form (including sim ties) is pinned in SimilaritySpec.
    */
  private def topK(scored: DataFrame): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.F.topKPairs(col("sim"), col("neighbor_id"), K).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        (col("pos") + 1L).cast("long").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))

  /** Top-`rerank` candidate ids per query by (ascore desc, id asc) — the
    * compressed-scan half of the scan-then-rerank ANN gates (s04/s07/
    * s09), through the same bounded aggregate as [[topK]] and for the
    * same reason: the rank-window form sorted the FULL ADC/SQ pair
    * stream per map partition (s04/s09 score corpus × queries before
    * any pruning — the 8×10^10-pair sort is what ENOSPC'd sf100, not
    * the final top-K).
    */
  private def topRerank(adcScored: DataFrame, rerank: Int): DataFrame =
    adcScored.groupBy(col("query_id"))
      .agg(graft.functions.F.topKPairs(col("ascore"), col("neighbor_id"), rerank).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("neighbor_id"))

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
      tables: Int, probeBits: Int = 1): DataFrame =
    s02AnnLshOn(Tables.embeddings(spark, sfDir), queries(spark, sfDir), tables, probeBits)

  /** DataFrame-level LSH core (shared by the production entry, the
    * planted-copy gate, and the recall specs): `e` = (vec_id, embedding),
    * `q` = (query_id, qv).
    */
  private[graft] def s02AnnLshOn(e: DataFrame, q: DataFrame,
      tables: Int, probeBits: Int): DataFrame =
    topK(lshScored(e, q, tables, probeBits))

  /** LSH hashing constants shared by the scoring path AND the router's
    * occupancy estimator ([[lshCandidateEstimate]]) — one definition, so
    * a change to the key space can never desynchronize the estimate from
    * the path it predicts.
    */
  private val LshBits = 8
  private def lshSeed(t: Int): Long = 0x5eedL + t * 7919L
  /** All XOR masks with popcount <= probeBits over the low LshBits bits. */
  private def lshMasks(probeBits: Int): Seq[Long] =
    (0L until (1L << LshBits)).filter(m => java.lang.Long.bitCount(m) <= probeBits)

  /** Candidate generation + exact scoring shared by top-k ANN (s02) and
    * radius search (s06): LSH bucket join → dedup → cosine.
    */
  private[graft] def lshScored(e: DataFrame, q: DataFrame,
      tables: Int, probeBits: Int): DataFrame = {
    val bits = LshBits
    def seed(t: Int): Long = lshSeed(t)
    val masks: Seq[Long] = lshMasks(probeBits)

    val keyed = e.select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), F.rpBits(col("embedding"), bits, seed(t)).as("key"))): _*)).as("tk"))
      .select(col("vec_id"), col("tk.t").as("t"), col("tk.key").as("key"))

    val probes = q
      .select(col("query_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), F.rpBits(col("qv"), bits, seed(t)).as("qkey"))): _*)).as("tk"))
      .select(col("query_id"), col("tk.t").as("t"),
        explode(array(masks.map(m => col("tk.qkey").bitwiseXOR(lit(m))): _*)).as("key"))

    val cands = keyed.join(broadcast(probes), Seq("t", "key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    cands
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
  }

  /** Occupancy-estimated LSH candidate volume PER QUERY, from a bounded
    * corpus sample: per-table expected bucket size = N / (occupied keys
    * per table), times the probes a query touches (tables × masks). The
    * 8-bit key space saturates at 256 buckets/table, so past ~10⁵
    * vectors the estimate grows LINEARLY in N — exactly the
    * candidate-linear behavior the 10× scaling probe measured (SURVEY
    * §8, s02 at 2.57×). Cost: one corpus count (parquet metadata) + key
    * hashing over a 2 000-vector sample.
    */
  private[graft] def lshCandidateEstimate(e: DataFrame,
      tables: Int, probeBits: Int): Double = {
    val masks = lshMasks(probeBits).size
    val n = e.count()
    if (n == 0) return 0.0
    val sampleKeys = e.limit(2000).select(
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), F.rpBits(col("embedding"), LshBits, lshSeed(t)).as("key"))): _*)).as("tk"))
      .select(col("tk.t"), col("tk.key")).distinct().count()
    // Σ_t masks × N / ndv_t with ndv_t ≈ sampled-occupied/tables; the
    // sample under-counts rarely-hit buckets, which only makes the
    // estimate (and therefore the flip) conservative toward IVF
    masks.toDouble * n * tables * tables / math.max(sampleKeys, 1L)
  }

  /** The documented s02 growth path (SURVEY §8 r11, VERDICT r11 #7):
    * top-k ANN that self-routes by estimated candidate volume. Under
    * `budgetPerQuery` the multiprobe-LSH path wins (higher recall at
    * small candidate cost); past it LSH is candidate-linear in the
    * corpus — route to IVF, whose probed-cell volume is sublinear
    * (cells ≈ √N). Returns the chosen route for plan-shape pinning.
    */
  private[graft] def annTopKAuto(spark: SparkSession, sfDir: String,
      budgetPerQuery: Long = 100000L): (String, DataFrame) = {
    val e = Tables.embeddings(spark, sfDir)
    val est = lshCandidateEstimate(e, tables = 16, probeBits = 2)
    if (est <= budgetPerQuery.toDouble) "lsh" -> s02AnnLsh(spark, sfDir)
    else "ivf" -> s03AnnIvf(spark, sfDir)
  }

  /** Trained-once IVF index artifact, cached per corpus dir.
    *
    * k = ceil(sqrt(N)) clamped to [16, 1024] — FIXED relative to any one
    * corpus and sublinear in N, never corpus-proportional. Training reads
    * a deterministic strided sample bounded at min(50·k, 50000) vectors,
    * so the driver holds O(sample·dim + k·dim) floats REGARDLESS of corpus
    * size, and the Lloyd iterations run driver-local over that sample (the
    * classic train-on-sample IVF recipe). This is an index BUILD cost paid
    * once per corpus — the per-query path in [[s03AnnIvf]] only reads the
    * cached centroid matrix. At 100 TB the artifact would be persisted
    * next to the table; the cache here plays that role for a single JVM.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Float]]]()

  /** Deterministic bounded sample of NORMALIZED corpus embeddings — the
    * one training input every index artifact (IVF / PQ / OPQ) derives
    * from: strided by vec_id, capped, collected driver-side. O(cap·dim)
    * driver memory regardless of corpus size.
    */
  private def sampleNormalizedEmbeddings(spark: SparkSession, sfDir: String,
      cap: Int): Array[Array[Float]] = {
    val e = Tables.embeddings(spark, sfDir)
    val n = math.max(1L, e.count())
    val stride = math.max(1L, n / cap)
    e.filter(col("vec_id") % stride === 0)
      .select(col("embedding")).limit(cap).collect()
      .map(r => normalize(r.getSeq[Float](0).toArray))
  }

  private[graft] def ivfCentroids(spark: SparkSession, sfDir: String): Array[Array[Float]] =
    centroidCache.computeIfAbsent(sfDir, _ => {
      val n = math.max(1L, Tables.embeddings(spark, sfDir).count())
      val k = math.min(1024L, math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
      val sample = sampleNormalizedEmbeddings(spark, sfDir,
        math.min(50L * k, 50000L).toInt)
      trainKMeans(sample, math.min(k, sample.length), iters = 12)
    })

  private[graft] def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val inv = if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
    out
  }

  /** Driver-local spherical k-means (Lloyd) over the bounded sample:
    * seeds are evenly strided sample points (deterministic), assignment is
    * max dot over unit vectors (== cosine), means are renormalized, and an
    * emptied cell keeps its previous centroid.
    */
  private[graft] def trainKMeans(sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val dim = sample.head.length
    // Fixed prime offset decouples the seed set from %-patterned query
    // workloads (r3's recall number came from seeds landing on the queries).
    val off = 13 % sample.length
    val cents = Array.tabulate(k)(c =>
      sample(((c.toLong * sample.length / k).toInt + off) % sample.length).clone())
    for (_ <- 1 to iters) {
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Int](k)
      for (p <- sample) {
        var best = 0; var bs = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var s = 0.0; var i = 0
          while (i < dim) { s += p(i).toDouble * cents(c)(i); i += 1 }
          if (s > bs) { bs = s; best = c }
          c += 1
        }
        val su = sums(best)
        var i = 0
        while (i < dim) { su(i) += p(i); i += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          val m = new Array[Float](dim)
          var i = 0
          while (i < dim) { m(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
          cents(c) = normalize(m)
        }
        c += 1
      }
    }
    cents
  }

  /** s03: IVF ANN over the pre-trained coarse quantizer, with SPANN-style
    * boundary replication: each corpus vector is indexed under its `repl`
    * nearest cells (a bounded storage multiplier that recovers the recall
    * an exact Voronoi partition loses at cell boundaries), and each query
    * probes its `nProbe` nearest cells. Cell assignment is a single
    * codegen'd [[F.nearestCells]] map over the corpus — the centroid
    * matrix rides the plan as a constant, so no join, window, or shuffle
    * touches the corpus; probes are a broadcast; the only shuffles are the
    * candidate dedup (a pair can arrive via more than one shared cell) and
    * the per-query top-k window, both sized to the candidate set.
    *
    * Recall honesty note (round 4): r3's reported 0.96 recall was an
    * artifact — its centroid seeds (every 25th vec_id) coincided with the
    * query set (every 50th vec_id), centering cells on the queries
    * themselves. With decoupled seeds, the honest recall of single-
    * assignment IVF on THIS corpus (uniform random 64-dim — the
    * no-locality worst case for any ANN index, pairwise cosine never
    * exceeds 0.48) is ~0.6 at nProbe=4. On clusterable data — the IVF
    * design case, and what real embedding corpora look like — the same
    * defaults measure recall 1.0 scanning <20% of the corpus
    * (OperatorsSpec "s03 ivf on clustered corpus"). Both cases are
    * spec-asserted; the knobs (nProbe, repl) trade scan fraction for
    * worst-case recall.
    */
  def s03AnnIvf(spark: SparkSession, sfDir: String): DataFrame =
    s03AnnIvf(spark, sfDir, nProbe = 4, repl = 2)

  private[graft] def s03AnnIvf(spark: SparkSession, sfDir: String,
      nProbe: Int, repl: Int = 2): DataFrame = {
    val cents = ivfCentroids(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir)
    val q = queries(spark, sfDir)
    s03AnnIvfOn(e, q, cents, nProbe, repl)
  }

  /** DataFrame-level IVF core (shared by the gate query and the
    * clustered-corpus spec): `e` = (vec_id, embedding), `q` = (query_id,
    * qv), `cents` = the trained index artifact.
    */
  private[graft] def s03AnnIvfOn(e: DataFrame, q: DataFrame,
      cents: Array[Array[Float]], nProbe: Int, repl: Int): DataFrame = {
    val assigned = e.select(col("vec_id"), col("embedding"),
      explode(F.nearestCells(col("embedding"), cents, repl)).as("cell"))
    val probes = q.select(col("query_id"), col("qv"),
      explode(F.nearestCells(col("qv"), cents, nProbe)).as("cell"))
    val scored = assigned.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("sim")).as("sim"))
    topK(scored)
  }

  /** Trained-once PQ codebooks, cached per corpus dir: m subspaces ×
    * ks centroids each, plain-L2 Lloyd per subspace over the same bounded
    * deterministic sample as [[ivfCentroids]] (vectors L2-normalized
    * first, so ADC dot ranking approximates cosine ranking). Driver holds
    * O(sample·dim + m·ks·subDim) regardless of corpus size.
    */
  private val codebookCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Float]]]]()

  private[graft] def pqCodebooks(spark: SparkSession, sfDir: String,
      m: Int = 8, ks: Int = 32): Array[Array[Array[Float]]] =
    codebookCache.computeIfAbsent(s"$sfDir#$m#$ks", _ =>
      pqTrain(sampleNormalizedEmbeddings(spark, sfDir,
        math.min(50L * ks, 50000L).toInt), m, ks))

  /** Per-subspace L2 codebooks from a normalized sample. */
  private[graft] def pqTrain(sample: Array[Array[Float]], m: Int, ks: Int): Array[Array[Array[Float]]] = {
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    Array.tabulate(m) { j =>
      val subs = sample.map(v => v.slice(j * subDim, (j + 1) * subDim))
      trainKMeansL2(subs, math.min(ks, subs.length), iters = 12)
    }
  }

  /** Driver-local plain-L2 Lloyd (PQ codebooks quantize subvector error,
    * not direction — spherical k-means would be wrong here).
    */
  private def trainKMeansL2(sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val dim = sample.head.length
    val off = 13 % sample.length
    val cents = Array.tabulate(k)(c =>
      sample(((c.toLong * sample.length / k).toInt + off) % sample.length).clone())
    for (_ <- 1 to iters) {
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Int](k)
      for (p <- sample) {
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = p(i).toDouble - cents(c)(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        val su = sums(best)
        var i = 0
        while (i < dim) { su(i) += p(i); i += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { cents(c)(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
        }
        c += 1
      }
    }
    cents
  }

  /** OPQ rotation training (Ge et al., "Optimized Product Quantization",
    * CVPR '13 — the non-parametric variant): alternate (a) PQ codebook
    * training in the rotated space with (b) an orthogonal-Procrustes
    * update of the rotation toward the current reconstructions, R = V·Uᵀ
    * from the SVD of the data/reconstruction cross-covariance. The
    * rotation redistributes correlated variance across the m independent
    * subspaces — PQ's worst case is energy concentrated in a few
    * dimensions that one subspace must quantize alone — at the SAME code
    * budget (m bytes per vector, identical scan). Orthogonality preserves
    * dot products, so cosine ranking in rotated space IS the original
    * ranking: the encode/LUT pre-rotate and nothing downstream changes,
    * including the exact re-rank over true embeddings. Driver-local over
    * the same bounded sample as [[pqTrain]]; SVD is dim×dim (64² here)
    * via breeze (on the Spark classpath).
    */
  private[graft] def opqTrain(sample: Array[Array[Float]], m: Int, ks: Int,
      sweeps: Int = 6): (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    import breeze.linalg.{svd, DenseMatrix}
    val dim = sample.head.length
    var r = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0f else 0.0f)
    for (_ <- 1 to sweeps) {
      val rotated = sample.map(x => applyRot(r, x))
      val cbs = pqTrain(rotated, m, ks)
      // maximize tr(R·C), C[b][a] = Σ_i x_i[b]·x̂_i[a]: C = U S Vᵀ → R = V Uᵀ
      val c = DenseMatrix.zeros[Double](dim, dim)
      for (i <- sample.indices) {
        val x = sample(i)
        val xh = pqDecode(cbs, rotated(i))
        var a = 0
        while (a < dim) {
          var b = 0
          while (b < dim) { c(b, a) += x(b).toDouble * xh(a); b += 1 }
          a += 1
        }
      }
      val s = svd(c)
      val rOpt = s.Vt.t * s.U.t
      r = Array.tabulate(dim, dim)((i, j) => rOpt(i, j).toFloat)
    }
    (r, pqTrain(sample.map(x => applyRot(r, x)), m, ks))
  }

  private[graft] def applyRot(r: Array[Array[Float]], x: Array[Float]): Array[Float] = {
    val dim = r.length
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val row = r(i)
      var s = 0.0
      var j = 0
      while (j < dim) { s += row(j).toDouble * x(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  /** Reconstruction of a rotated vector from its per-subspace nearest
    * codebook entries (trainer/spec side only — the scan reads codes).
    */
  private[graft] def pqDecode(cbs: Array[Array[Array[Float]]],
      y: Array[Float]): Array[Float] = {
    val m = cbs.length
    val subDim = cbs(0)(0).length
    val out = new Array[Float](m * subDim)
    var j = 0
    while (j < m) {
      val sub = cbs(j)
      val off = j * subDim
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < sub.length) {
        var d = 0.0
        var i = 0
        while (i < subDim) { val t = y(off + i).toDouble - sub(c)(i); d += t * t; i += 1 }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      var i = 0
      while (i < subDim) { out(off + i) = sub(best)(i); i += 1 }
      j += 1
    }
    out
  }

  /** Mean squared PQ reconstruction error of `sample` under (rot, cbs) —
    * the objective OPQ descends; the spec pins OPQ ≤ identity-rotation PQ.
    */
  private[graft] def pqQuantError(sample: Array[Array[Float]],
      r: Array[Array[Float]], cbs: Array[Array[Array[Float]]]): Double = {
    var total = 0.0
    for (x <- sample) {
      val y = applyRot(r, x)
      val xh = pqDecode(cbs, y)
      var d = 0.0
      var i = 0
      while (i < y.length) { val t = y(i).toDouble - xh(i); d += t * t; i += 1 }
      total += d
    }
    total / sample.length
  }

  /** Trained-once OPQ artifact (rotation + rotated-space codebooks),
    * cached per corpus dir like the PQ/IVF artifacts.
    */
  private val opqCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Array[Float]], Array[Array[Array[Float]]])]()

  private[graft] def opqArtifacts(spark: SparkSession, sfDir: String,
      m: Int = 8, ks: Int = 32): (Array[Array[Float]], Array[Array[Array[Float]]]) =
    opqCache.computeIfAbsent(s"$sfDir#$m#$ks", _ =>
      opqTrain(sampleNormalizedEmbeddings(spark, sfDir,
        math.min(50L * ks, 50000L).toInt), m, ks))

  /** s04: product-quantization ANN (PQ + ADC + exact re-rank). Corpus
    * vectors are normalized and encoded once into m-byte codes (a
    * codegen'd map — at 100 TB the code table is dim·4/m× smaller than
    * the embeddings and is the only thing the scan reads); each query
    * precomputes an m×ks lookup table once, so scoring a pair is O(m)
    * table adds instead of O(dim) multiplies. The ADC scan keeps the
    * top `rerank` candidates per query (WindowGroupLimit prunes before
    * the shuffle), which alone re-read true embeddings for the exact
    * cosine re-rank. Quantization is approximate → rows-only gate;
    * recall is spec-asserted (clustered corpus ≥0.95, uniform ≥0.85 at
    * the rerank=100 default — measured 0.96 at sf0.001; uniform random
    * vectors are the quantization worst case, see the s03 note above).
    */
  def s04AnnPq(spark: SparkSession, sfDir: String): DataFrame =
    s04AnnPq(spark, sfDir, rerank = 100)

  private[graft] def s04AnnPq(spark: SparkSession, sfDir: String, rerank: Int): DataFrame = {
    val cbs = pqCodebooks(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir)
    val q = queries(spark, sfDir)
    s04AnnPqOn(e, q, cbs, rerank)
  }

  private[graft] def s04AnnPqOn(e: DataFrame, q: DataFrame,
      cbs: Array[Array[Array[Float]]], rerank: Int,
      rot: Option[Array[Array[Float]]] = None): DataFrame = {
    val ks = cbs(0).length
    val unit = expr(
      "transform(embedding, x -> CAST(x / sqrt(aggregate(embedding, 0D, (a, v) -> a + CAST(v AS DOUBLE) * v)) AS FLOAT))")
    val enc = rot.map(r => F.rotate(unit, r)).getOrElse(unit)
    val coded = e.select(col("vec_id"), F.pqEncode(enc, cbs).as("code"))
    val qunit = expr(
      "transform(qv, x -> CAST(x / sqrt(aggregate(qv, 0D, (a, v) -> a + CAST(v AS DOUBLE) * v)) AS FLOAT))")
    val qenc = rot.map(r => F.rotate(qunit, r)).getOrElse(qunit)
    val luts = q.select(col("query_id"), F.pqLut(qenc, cbs).as("lut"))
    val cands = topRerank(coded.crossJoin(broadcast(luts))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        F.pqAdc(col("code"), col("lut"), ks).as("ascore")), rerank)
    val scored = cands
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
    topK(scored)
  }

  // ------------------------------------------------------------------
  // Oracle-exact gate variants (r6; VERDICT r5 item 1 — the d04/d05
  // playbook applied to ANN). Gate corpus = the real embeddings table
  // plus, per query, `Copies` EXACT copies of the query vector planted at
  // ids 1000000 + query_id*10 + j. Why this makes an APPROXIMATE index
  // exactly oracle-checkable:
  //  - identical float arrays hash identically → copies share every LSH
  //    table key (s02), every nearest IVF cell (s03), and the exact PQ
  //    code (s04) with their query, so candidate recall of the planted
  //    top-k is 1.0 BY CONSTRUCTION, not by measurement;
  //  - cosine(q, copy) ≈ 1.0 while the corpus' max natural pairwise
  //    cosine is 0.48 (uniform random vectors), so the true top-5 IS the
  //    copy set with a huge margin — no cross-engine last-bit rank risk;
  //  - within one engine the 5 copies' sims are computed from identical
  //    inputs, hence bitwise-equal → both engines break the tie by
  //    neighbor_id ASC and agree on ranks.
  // The production kernels are untouched (the gate calls the same *On
  // cores with production defaults and the production-trained index
  // artifacts); honest approximate recall on non-planted data stays
  // spec-asserted in OperatorsSpec.
  private val Copies = K

  /** Gate corpus: embeddings ∪ planted exact copies of each query. */
  private def plantedCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val copies = queries(spark, sfDir)
      .select(col("query_id"), col("qv"),
        explode(array((1 to Copies).map(lit): _*)).as("j"))
      .select((lit(1000000L) + col("query_id") * 10 + col("j")).cast("long").as("vec_id"),
        col("qv").as("embedding"))
    Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      .unionByName(copies)
  }

  def s02AnnLshGate(spark: SparkSession, sfDir: String): DataFrame =
    s02AnnLshOn(plantedCorpus(spark, sfDir), queries(spark, sfDir),
      tables = 16, probeBits = 2)

  def s03AnnIvfGate(spark: SparkSession, sfDir: String): DataFrame =
    s03AnnIvfOn(plantedCorpus(spark, sfDir), queries(spark, sfDir),
      ivfCentroids(spark, sfDir), nProbe = 4, repl = 2)

  def s04AnnPqGate(spark: SparkSession, sfDir: String): DataFrame =
    s04AnnPqOn(plantedCorpus(spark, sfDir), queries(spark, sfDir),
      pqCodebooks(spark, sfDir), rerank = 100)

  // ------------------------------------------------------------------
  // s05: filtered ANN — the vector-store staple "top-k WHERE metadata
  // predicate". The predicate here is label equality with the query's own
  // label (embeddings carry an int label). The filter rides the BUCKET
  // KEY: corpus rows join probes on (cell, label), so Catalyst evaluates
  // the predicate inside the broadcast-hash-join condition and non-
  // matching rows never reach scoring — a pre-filtered index probe, not a
  // post-filter of an unfiltered top-k (post-filtering an approximate
  // top-k under-fills k when the predicate is selective; scoping the
  // index probe does not). At 100 TB with a very selective predicate the
  // planner-preferred alternative is a pushed-down parquet scan + exact
  // top-k over the survivors; this kernel is the broad-predicate path.
  // ------------------------------------------------------------------

  private def labeledQueries(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))

  private[graft] def s05AnnFilteredOn(e: DataFrame, q: DataFrame,
      cents: Array[Array[Float]], nProbe: Int, repl: Int): DataFrame = {
    val assigned = e.select(col("vec_id"), col("embedding"), col("label"),
      explode(F.nearestCells(col("embedding"), cents, repl)).as("cell"))
    val probes = q.select(col("query_id"), col("qv"), col("qlabel"),
      explode(F.nearestCells(col("qv"), cents, nProbe)).as("cell"))
    val scored = assigned.join(broadcast(probes),
        assigned("cell") === probes("cell") && assigned("label") === probes("qlabel"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("sim")).as("sim"))
    topK(scored)
  }

  def s05AnnFiltered(spark: SparkSession, sfDir: String): DataFrame =
    s05AnnFilteredOn(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"), col("label")),
      labeledQueries(spark, sfDir),
      ivfCentroids(spark, sfDir), nProbe = 4, repl = 2)

  /** Gate variant: planted same-label copies (ids 2000000+) make the
    * label-scoped recall provably 1.0 — identical arrays share cells AND
    * the label passes the filter — so the result equals DuckDB's exact
    * label-filtered top-5.
    */
  def s05AnnFilteredGate(spark: SparkSession, sfDir: String): DataFrame = {
    val q = labeledQueries(spark, sfDir)
    val copies = q
      .select(col("query_id"), col("qv"), col("qlabel"),
        explode(array((1 to Copies).map(lit): _*)).as("j"))
      .select((lit(2000000L) + col("query_id") * 10 + col("j")).cast("long").as("vec_id"),
        col("qv").as("embedding"), col("qlabel").as("label"))
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(copies)
    s05AnnFilteredOn(corpus, q, ivfCentroids(spark, sfDir), nProbe = 4, repl = 2)
  }

  val s05Oracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label
      |  FROM embeddings WHERE vec_id % 50 = 0),
      |corpus AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev, label FROM embeddings
      |  UNION ALL
      |  SELECT CAST(2000000 + q.query_id * 10 + t.j AS BIGINT) AS vec_id, q.qv AS ev, q.label
      |  FROM q CROSS JOIN range(1, 6) t(j)),
      |scored AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id,
      |    list_cosine_similarity(q.qv, c.ev) AS sim
      |  FROM q JOIN corpus c ON c.label = q.label AND c.vec_id <> q.query_id)
      |SELECT query_id, neighbor_id, rnk FROM (
      |  SELECT query_id, neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
      |  FROM scored)
      |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  /** Exact top-5 over the same planted corpus — what a provably-recall-1.0
    * index must return. Mirrors [[plantedCorpus]] row for row.
    */
  val plantedOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0),
      |corpus AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
      |  UNION ALL
      |  SELECT CAST(1000000 + q.query_id * 10 + t.j AS BIGINT) AS vec_id, q.qv AS ev
      |  FROM q CROSS JOIN range(1, 6) t(j)),
      |scored AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id,
      |    list_cosine_similarity(q.qv, c.ev) AS sim
      |  FROM q CROSS JOIN corpus c WHERE c.vec_id <> q.query_id)
      |SELECT query_id, neighbor_id, rnk FROM (
      |  SELECT query_id, neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
      |  FROM scored)
      |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  // ------------------------------------------------------------------
  // s06: RANGE (radius) search — every neighbor with cosine ≥ τ, the
  // threshold-query primitive behind near-dup sweeps and recall-oriented
  // retrieval ("give me ALL matches", not top-k). Same LSH candidate
  // generation as s02 (bucket join, bare-id shuffle, exact cosine on
  // candidates only), with a similarity filter instead of a rank window —
  // so the cost model is identical and no global sort is needed at all.
  // Gate-exact by the planted-copy construction: copies score ~1.0,
  // the corpus' max natural pairwise cosine is 0.48, and τ = 0.8 sits in
  // that gap with a huge margin, so the radius set IS the planted set and
  // DuckDB recomputes it exactly; candidate recall of the copies is 1.0
  // by construction (identical arrays share every table key).
  // ------------------------------------------------------------------

  private[graft] def s06RangeSearchOn(e: DataFrame, q: DataFrame, tau: Double,
      tables: Int, probeBits: Int): DataFrame =
    lshScored(e, q, tables, probeBits)
      .filter(col("sim") >= tau)
      .select(col("query_id"), col("neighbor_id"))
      .orderBy(col("query_id"), col("neighbor_id"))

  def s06RangeSearch(spark: SparkSession, sfDir: String): DataFrame =
    s06RangeSearchOn(Tables.embeddings(spark, sfDir), queries(spark, sfDir),
      tau = 0.8, tables = 16, probeBits = 2)

  def s06RangeSearchGate(spark: SparkSession, sfDir: String): DataFrame =
    s06RangeSearchOn(plantedCorpus(spark, sfDir), queries(spark, sfDir),
      tau = 0.8, tables = 16, probeBits = 2)

  val s06Oracle: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0),
      |corpus AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
      |  UNION ALL
      |  SELECT CAST(1000000 + q.query_id * 10 + t.j AS BIGINT) AS vec_id, q.qv AS ev
      |  FROM q CROSS JOIN range(1, 6) t(j))
      |SELECT q.query_id, c.vec_id AS neighbor_id
      |FROM q CROSS JOIN corpus c
      |WHERE c.vec_id <> q.query_id
      |  AND list_cosine_similarity(q.qv, c.ev) >= 0.8
      |ORDER BY query_id, neighbor_id""".stripMargin

  // ------------------------------------------------------------------
  // s07: IVF-PQ — the composite index (FAISS's IndexIVFPQ shape; Jégou
  // et al., "Product Quantization for Nearest Neighbor Search", TPAMI
  // 2011, §V): the coarse quantizer scopes WHICH codes are scanned and
  // PQ compresses WHAT the scan reads. At 100 TB this is the deployable
  // configuration: a cell-clustered code table is dim·4/m× smaller than
  // the embeddings (64-dim float → 8-byte codes = 32×) and only
  // ~nProbe/nCells of it is touched per query — the two savings
  // MULTIPLY, where s03 alone still reads full vectors inside probed
  // cells and s04 alone still ADC-scans every code in the corpus. Same
  // trained artifacts as s03+s04 (one coarse quantizer, one codebook
  // set — nothing new to train), same codegen'd ADC kernel, and the
  // exact cosine re-rank re-reads true embeddings ONLY for the
  // surviving `rerank` candidates per query. Cell assignment and
  // encoding are one map over the corpus (centroids + codebooks ride
  // the plan as constants); probes broadcast with a per-query LUT, so
  // the only shuffles are candidate dedup and the top-k windows — the
  // s03 cost model with a 32× lighter scan payload.
  // ------------------------------------------------------------------

  private[graft] def s07AnnIvfPqOn(e: DataFrame, q: DataFrame,
      cents: Array[Array[Float]], cbs: Array[Array[Array[Float]]],
      nProbe: Int, repl: Int, rerank: Int,
      rot: Option[Array[Array[Float]]] = None): DataFrame = {
    val ks = cbs(0).length
    val unit = expr(
      "transform(embedding, x -> CAST(x / sqrt(aggregate(embedding, 0D, (a, v) -> a + CAST(v AS DOUBLE) * v)) AS FLOAT))")
    // encode once per corpus row; the generate for cell replication
    // projects the already-computed code alongside each emitted cell.
    // OPQ composes FAISS-style (OPQMatrix + IndexIVFPQ): the rotation
    // applies before PQ encode/LUT only; cell assignment keeps the
    // original space (rotation is orthogonal, so rotating both centroids
    // and vectors would be the identical partition — skipping it saves
    // re-training the coarse quantizer).
    val enc = rot.map(r => F.rotate(unit, r)).getOrElse(unit)
    val coded = e.select(col("vec_id"), F.pqEncode(enc, cbs).as("code"),
      explode(F.nearestCells(col("embedding"), cents, repl)).as("cell"))
    val qunit = expr(
      "transform(qv, x -> CAST(x / sqrt(aggregate(qv, 0D, (a, v) -> a + CAST(v AS DOUBLE) * v)) AS FLOAT))")
    val qenc = rot.map(r => F.rotate(qunit, r)).getOrElse(qunit)
    val probes = q.select(col("query_id"), F.pqLut(qenc, cbs).as("lut"),
      explode(F.nearestCells(col("qv"), cents, nProbe)).as("cell"))
    val cands = topRerank(coded.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        F.pqAdc(col("code"), col("lut"), ks).as("ascore"))
      // a pair can arrive via more than one shared cell; its ADC score is
      // cell-independent, so max == any — one dedup shuffle
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("ascore")).as("ascore")), rerank)
    val scored = cands
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
    topK(scored)
  }

  def s07AnnIvfPq(spark: SparkSession, sfDir: String): DataFrame =
    s07AnnIvfPqOn(Tables.embeddings(spark, sfDir), queries(spark, sfDir),
      ivfCentroids(spark, sfDir), pqCodebooks(spark, sfDir),
      nProbe = 4, repl = 2, rerank = 100)

  /** OPQ variants of s04/s07 (§9 quality-ledger upgrades): the same
    * pipelines with encode/LUT in the learned rotated space — identical
    * code budget and scan shape, lower quantization error on anisotropic
    * corpora (the realistic embedding case; on isotropic uniform data the
    * rotation is a no-op by symmetry). Spec'd in OperatorsSpec: error
    * strictly improves and recall doesn't regress on correlated data.
    */
  def s04AnnOpq(spark: SparkSession, sfDir: String): DataFrame = {
    val (r, cbs) = opqArtifacts(spark, sfDir)
    s04AnnPqOn(Tables.embeddings(spark, sfDir), queries(spark, sfDir),
      cbs, rerank = 100, rot = Some(r))
  }

  def s07AnnIvfOpq(spark: SparkSession, sfDir: String): DataFrame = {
    val (r, cbs) = opqArtifacts(spark, sfDir)
    s07AnnIvfPqOn(Tables.embeddings(spark, sfDir), queries(spark, sfDir),
      ivfCentroids(spark, sfDir), cbs, nProbe = 4, repl = 2, rerank = 100,
      rot = Some(r))
  }

  /** Gate variant — oracle-exact by the planted-copy construction: a copy
    * is the identical float array, so it shares every nearest cell with
    * its query (candidate recall 1.0 by construction) and carries the
    * query's own PQ code, whose ADC score (≈ cos(q, decode(code)) ≈ 1 −
    * quantization error) clears the corpus' 0.48 natural-cosine ceiling
    * by a wide margin — the copies survive any rerank ≥ 5 cut, and the
    * exact re-rank then reproduces DuckDB's exact top-5.
    */
  def s07AnnIvfPqGate(spark: SparkSession, sfDir: String): DataFrame =
    s07AnnIvfPqOn(plantedCorpus(spark, sfDir), queries(spark, sfDir),
      ivfCentroids(spark, sfDir), pqCodebooks(spark, sfDir),
      nProbe = 4, repl = 2, rerank = 100)

  /** s08 gate: the OPQ pipeline under the same planted-copy construction —
    * a copy is the identical float array, so it maps to the identical
    * ROTATED vector and PQ code as its query; its ADC score is the
    * query's own reconstruction dot (≈ 1 − quantization error), clearing
    * the corpus' 0.48 natural-cosine ceiling, so the copies survive any
    * rerank ≥ 5 cut and the exact re-rank reproduces DuckDB's top-5.
    */
  def s08AnnOpqGate(spark: SparkSession, sfDir: String): DataFrame = {
    val (r, cbs) = opqArtifacts(spark, sfDir)
    s04AnnPqOn(plantedCorpus(spark, sfDir), queries(spark, sfDir),
      cbs, rerank = 100, rot = Some(r))
  }

  // ------------------------------------------------------------------
  // s09: scalar-quantization ANN (FAISS IndexScalarQuantizer QT_8bit +
  // asymmetric distance + exact re-rank) — the remaining member of the
  // compression ladder between raw floats (s01) and PQ (s04): SQ8 keeps
  // EVERY dimension at byte precision (4× compression, reconstruction
  // error ≈ span/510 per dim) where PQ keeps m codebook ids (32×, but
  // subspace-level error). Train is per-dimension min/max over the same
  // bounded sample the other indexes use — O(dim) driver state, two
  // floats per dimension, trivially mergeable under ingestion (min/min,
  // max/max), so the index artifact never becomes a scale bottleneck.
  // The scan reads only (vec_id, dim-byte code): map-only until the
  // per-query top-rerank cut (WindowGroupLimit prunes below the
  // shuffle), then the exact cosine re-rank re-reads true embeddings
  // for the survivors only — the identical plan shape to s04.
  // ------------------------------------------------------------------

  private val sqCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Float], Array[Float])]()

  /** Per-dimension (min, span) over a normalized sample. */
  private[graft] def sqTrain(sample: Array[Array[Float]]): (Array[Float], Array[Float]) = {
    require(sample.nonEmpty,
      "SQ training sample is empty — no embeddings to train on")
    val dim = sample.head.length
    val mins = Array.fill(dim)(Float.MaxValue)
    val maxs = Array.fill(dim)(Float.MinValue)
    sample.foreach { v =>
      var i = 0
      while (i < dim) {
        if (v(i) < mins(i)) mins(i) = v(i)
        if (v(i) > maxs(i)) maxs(i) = v(i)
        i += 1
      }
    }
    (mins, Array.tabulate(dim)(i => maxs(i) - mins(i)))
  }

  private[graft] def sqParams(spark: SparkSession, sfDir: String): (Array[Float], Array[Float]) =
    sqCache.computeIfAbsent(sfDir, _ =>
      sqTrain(sampleNormalizedEmbeddings(spark, sfDir, 50000)))

  private[graft] def s09AnnSqOn(e: DataFrame, q: DataFrame,
      mins: Array[Float], spans: Array[Float], rerank: Int): DataFrame = {
    val unit = expr(
      "transform(embedding, x -> CAST(x / sqrt(aggregate(embedding, 0D, (a, v) -> a + CAST(v AS DOUBLE) * v)) AS FLOAT))")
    val coded = e.select(col("vec_id"), F.sqEncode(unit, mins, spans).as("code"))
    val qunit = expr(
      "transform(qv, x -> CAST(x / sqrt(aggregate(qv, 0D, (a, v) -> a + CAST(v AS DOUBLE) * v)) AS FLOAT))")
    val qn = q.select(col("query_id"), qunit.as("qn"))
    val cands = topRerank(coded.crossJoin(broadcast(qn))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        F.sqScore(col("qn"), col("code"), mins, spans).as("ascore")), rerank)
    val scored = cands
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        F.cosine(col("qv"), col("embedding")).as("sim"))
    topK(scored)
  }

  def s09AnnSq(spark: SparkSession, sfDir: String): DataFrame = {
    val (mins, spans) = sqParams(spark, sfDir)
    s09AnnSqOn(Tables.embeddings(spark, sfDir), queries(spark, sfDir),
      mins, spans, rerank = 100)
  }

  /** s09 gate — oracle-exact by the planted-copy construction: a copy is
    * the identical float array, so it carries the query's own SQ8 code;
    * its asymmetric score is the query's reconstruction dot ≈ 1 − O(dim ·
    * span/510) ≈ 0.99, clearing the corpus' 0.48 natural-cosine ceiling,
    * so copies survive any rerank ≥ 5 cut and the exact re-rank
    * reproduces DuckDB's top-5.
    */
  def s09AnnSqGate(spark: SparkSession, sfDir: String): DataFrame = {
    val (mins, spans) = sqParams(spark, sfDir)
    s09AnnSqOn(plantedCorpus(spark, sfDir), queries(spark, sfDir),
      mins, spans, rerank = 100)
  }

  val entries: Map[String, graft.Gate.Entry] = Map(
    "s06_range_search"   -> graft.Gate(s06RangeSearchGate _, s06Oracle),
    "s01_ann_bruteforce" -> graft.Gate(s01AnnBruteforce _, s01Oracle),
    "s02_ann_lsh"        -> graft.Gate(s02AnnLshGate _, plantedOracle),
    "s03_ann_ivf"        -> graft.Gate(s03AnnIvfGate _, plantedOracle),
    "s04_ann_pq"         -> graft.Gate(s04AnnPqGate _, plantedOracle),
    "s05_ann_filtered"   -> graft.Gate(s05AnnFilteredGate _, s05Oracle),
    "s07_ann_ivf_pq"     -> graft.Gate(s07AnnIvfPqGate _, plantedOracle),
    "s08_ann_opq"        -> graft.Gate(s08AnnOpqGate _, plantedOracle),
    "s09_ann_sq"         -> graft.Gate(s09AnnSqGate _, plantedOracle),
  )
}
