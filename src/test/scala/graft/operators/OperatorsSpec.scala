package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("connected components finds the right clusters") {
    val vertices = (1L to 8L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 7L)).toDF("src", "dst")
    val cc = Graph.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(5L) == 5L && cc(6L) == 5L)
    assert(cc(4L) == 4L && cc(7L) == 7L && cc(8L) == 8L)
  }

  test("driver fast path and distributed rounds agree on the same graph") {
    // deterministic pseudo-random graph with chains, merges and isolates
    val vertices = (0L until 200L).toDF("id")
    val edges = (0L until 300L)
      .map(i => ((i * 48271L) % 200L, (i * 69621L + 7L) % 200L))
      .toDF("src", "dst")
    val local = Graph.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    val dist = Graph.connectedComponents(vertices, edges, localEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    // labels are the component MINIMUM: every label labels itself
    assert(local.values.forall(r => local(r) == r))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("capped collect casts int ids at analysis instead of failing mid-task") {
    // same hardening as TopKSimPairs (r18 ADVICE #3): the aggregate
    // declares (long) input, so an IntegerType id column implicit-casts
    // at analysis rather than ClassCastException-ing in update()
    val ints = spark.range(10).select(
      (col("id") % 3).cast("int").as("b"), col("id").cast("int").as("v"))
    val sizes = ints.groupBy(col("b"))
      .agg(graft.functions.F.cappedCollect(col("v"), 100).as("ids"))
      .select(size(col("ids")).as("n")).as[Int].collect()
    assert(sizes.sum == 10 && sizes.forall(_ >= 2))
  }

  test("d07 dup-gram coverage equals driver-side brute force and is bimodal") {
    val out = Dedup.d07DupGramCoverage(spark, sf)
      .select($"doc_id", $"n_grams", $"n_dup", $"flagged")
      .as[(Long, Int, Long, Boolean)].collect()
    // brute-force recompute over string grams (50 docs at sf0.001)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val gramsOf: Map[Long, Set[String]] = docs.map { case (id, t) =>
      val ws = t.trim.split("\\s+")
      val g = if (ws.length < 8) Set(ws.mkString(" "))
              else (0 to ws.length - 8).map(i => ws.slice(i, i + 8).mkString(" ")).toSet
      id -> g
    }.toMap
    val df = gramsOf.values.flatten.groupBy(identity).map { case (g, c) => g -> c.size }
    for ((id, nGrams, nDup, flagged) <- out) {
      val want = gramsOf(id).count(g => df(g) >= 2)
      assert(nGrams == gramsOf(id).size, s"doc $id n_grams")
      assert(nDup == want.toLong, s"doc $id n_dup: got $nDup want $want")
      assert(flagged == (want.toDouble / gramsOf(id).size >= 0.5))
    }
    // the signal is bimodal on this corpus: planted dups near 1, rest at 0
    val frac = out.map(r => r._3.toDouble / r._2)
    assert(out.exists(_._4), "expected planted dup docs to be flagged")
    assert(frac.forall(f => f == 0.0 || f >= 0.5), "no mid-range mass expected")
  }

  test("d03 minhash-lsh clusters planted near-duplicates") {
    val m = Dedup.d03MinhashLsh(spark, sf).as[(Long, Long)].collect().toMap
    val orig = m.keys.filter(_ < 2000000L).toSeq
    val found = orig.count(i => m.get(i + 2000000L).contains(m(i)))
    assert(found.toDouble / orig.size >= 0.9, s"planted recall $found/${orig.size}")
  }

  test("d03 exact variant equals driver-side union-find over string shingles") {
    val out = Dedup.d03MinhashLshExact(spark, sf)
      .as[(Long, Long)].collect().toMap
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 250)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val corpus = base ++ base.map { case (id, t) => (id + 2000000L, t) }
    val shingles = corpus.map { case (id, t) =>
      val ws = t.trim.split("\\s+")
      (id, (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet)
    }
    // union-find over exact word-3-shingle jaccard >= 0.5 edges
    val parent = scala.collection.mutable.Map(corpus.map(c => c._1 -> c._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for { (ia, sa) <- shingles; (ib, sb) <- shingles if ia < ib } {
      val inter = (sa & sb).size.toDouble
      if (inter / (sa.size + sb.size - inter) >= 0.5) union(ia, ib)
    }
    val brute = corpus.map(c => c._1 -> find(c._1)).toMap
    assert(out == brute,
      s"diff: ${(out.toSet diff brute.toSet).take(5)} / ${(brute.toSet diff out.toSet).take(5)}")
    // base-table planted dups must have merged quadruples
    assert(brute.count { case (id, cl) => id != cl && (id - cl) != 2000000L } > 0)
  }

  test("d09 components equal driver-side union-find; closure is transitive") {
    val out = Dedup.d09DupComponents(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 250)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val corpus = base ++ base.map { case (id, t) => (id + 2000000L, t) }
    val shingles = corpus.map { case (id, t) => (id, t.sliding(5).toSet) }
    val parent = scala.collection.mutable.Map(corpus.map(c => c._1 -> c._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for { (ia, sa) <- shingles; (ib, sb) <- shingles if ia < ib } {
      val inter = (sa & sb).size.toDouble
      if (inter / (sa.size + sb.size - inter) >= 0.6) {
        val (ra, rb) = (find(ia), find(ib))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val comps = corpus.map(c => c._1 -> find(c._1)).toMap
    val sizes = comps.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val brute = comps.map { case (id, c) => id -> (c, sizes(c), id == c) }
    assert(out == brute,
      s"diff: ${(out.toSet diff brute.toSet).take(5)} / ${(brute.toSet diff out.toSet).take(5)}")
    // planted copies + base near-dup pairs chain into >=4-node components:
    // the closure must carry one representative through the whole chain
    assert(out.values.exists(_._2 >= 4), "expected a transitively-merged chain")
  }

  test("d10 incremental dedup absorbs survivors; later batches dedup against them") {
    import graft.tables.GraftTable
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val batch1 = docs.filter($"doc_id" < 100).select($"doc_id", $"text")
    // batch2: fresh docs + one exact copy of a batch1 doc
    val fresh2 = docs.filter($"doc_id" >= 100 && $"doc_id" < 150)
      .select($"doc_id", $"text")
    val batch2 = fresh2.unionAll(
      batch1.filter($"doc_id" === 7L)
        .select(($"doc_id" + 3000000L).as("doc_id"), $"text"))
    val fpLoc = java.nio.file.Files.createTempDirectory("graft_d10s").toString + "/fp"
    val fp = GraftTable.createAs(spark, fpLoc, Dedup.bandKeysForTest(batch1))
    val r2 = Dedup.incrementalDedupRound(spark, fp, batch2)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(r2(3000007L) == (true, 7L), "planted copy must flag against history")

    // batch3 copies a batch2 SURVIVOR (a fresh doc) and the batch2 DUP
    val batch3 = docs.filter($"doc_id" === 101L)
        .select(($"doc_id" + 4000000L).as("doc_id"), $"text")
      .unionAll(batch1.filter($"doc_id" === 7L)
        .select(($"doc_id" + 5000000L).as("doc_id"), $"text"))
    val r3 = Dedup.incrementalDedupRound(spark,
        GraftTable.load(spark, fpLoc), batch3)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    // the survivor WAS absorbed: its copy flags against the batch2 id
    assert(r3(4000101L) == (true, 101L), s"survivor not absorbed: $r3")
    // the batch2 dup was NOT absorbed: its copy still flags against batch1
    assert(r3(5000007L) == (true, 7L), s"dup should flag via batch1: $r3")
  }

  test("d10 verification is corpus-free: flags dups after history text is GONE") {
    import graft.tables.GraftTable
    import java.nio.file.{Files, Path, Paths}
    // history batch written to its own parquet dir, indexed, then DELETED:
    // if verification still resolves a planted copy, it provably read only
    // the index (the strongest possible no-corpus-IO assertion)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tmp = Files.createTempDirectory("graft_d10c")
    val histDir = s"$tmp/hist"
    docs.filter($"doc_id" < 100).select($"doc_id", $"text")
      .write.parquet(histDir)
    val hist = spark.read.parquet(histDir)
    val fp = GraftTable.createAs(spark, s"$tmp/fp", Dedup.bandKeysForTest(hist))
    // drop the history corpus from disk entirely
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(histDir)).iterator().asScala.toSeq.reverse
      .foreach(p => Files.deleteIfExists(p))
    val batch = docs.filter($"doc_id" === 42L)
      .select(($"doc_id" + 7000000L).as("doc_id"), $"text")
    val out = Dedup.incrementalDedupRound(spark, fp, batch)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(out(7000042L) == (true, 42L), s"copy must flag via index sketches: $out")
    Files.walk(tmp).iterator().asScala.toSeq.reverse
      .foreach(p => Files.deleteIfExists(p))
  }

  test("d10 sketch Jaccard: exact below k, bounded KMV estimate past k") {
    import org.apache.spark.sql.functions.{col, lit}
    // two long synthetic docs with a known overlap ratio, shingled the
    // same way d10 does; tiny k forces the estimator path
    val base = (0 until 6000).map(i => f"tok$i%05d").mkString(" ")
    val half = ((0 until 3000) ++ (10000 until 13000))
      .map(i => f"tok$i%05d").mkString(" ")
    val df = Seq((1L, base), (2L, half)).toDF("doc_id", "text")
    val full = Dedup.sketchJaccardForTest(spark, df, k = 1 << 20) // unsaturated: exact
    val est = Dedup.sketchJaccardForTest(spark, df, k = 256) // saturated: estimate
    assert(math.abs(est - full) <= 0.12, s"estimate $est vs exact $full")
    assert(full > 0.2 && full < 0.8, s"test overlap not in the useful band: $full")
  }

  test("d04 simhash finds most planted near-duplicates") {
    val pairs = Dedup.d04Simhash(spark, sf).select($"a", $"b").as[(Long, Long)].collect()
    val planted = pairs.count { case (a, b) => b - a == 2000000L }
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(planted.toDouble / nDocs >= 0.7, s"planted recall $planted/$nDocs")
  }

  test("d04 exact variant equals all-pairs hamming<=7 (blocking recall 1.0)") {
    import org.apache.spark.sql.functions.{col, expr, split, trim}
    val out = Dedup.d04SimhashExact(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    // same sigs via the same expressions, then exhaustive driver-side pairs
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 250)
    val corpus = base.unionAll(base.select(
      (col("doc_id") + org.apache.spark.sql.functions.lit(2000000L)).as("doc_id"),
      expr("concat_ws(' ', filter(split(trim(text), '\\\\s+'), (w, i) -> i % 10 != 0))").as("text")))
    val sigs = corpus.select(col("doc_id"),
        graft.functions.F.simhash64(
          graft.functions.F.polyWordHashes(split(trim(col("text")), "\\s+"))).as("sig"))
      .as[(Long, Long)].collect()
    val brute = (for {
      i <- sigs.indices; j <- sigs.indices
      if sigs(i)._1 < sigs(j)._1
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2).toLong
      if h <= 7
    } yield (sigs(i)._1, sigs(j)._1, h)).toSet
    assert(out == brute, s"exact ${out.size} vs brute ${brute.size}")
  }

  test("d05 ngram jaccard keeps planted pairs above threshold") {
    val pairs = Dedup.d05NgramJaccard(spark, sf)
    val planted = pairs.filter($"b" - $"a" === 2000000L).count()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(planted.toDouble / nDocs >= 0.9, s"planted recall $planted/$nDocs")
    // jaccard column is a real similarity: all in (0, 1]
    val js = pairs.select($"jaccard").as[Double].collect()
    assert(js.forall(j => j > 0.0 && j <= 1.0))
  }

  test("d08 semdedup drops every planted copy, keeps every original, never leaves a cluster") {
    val out = Dedup.d08SemDedup(spark, sf).as[(Long, Boolean)].collect().toMap
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.size == 2 * n)
    // planted ×1.5 copies (higher ids) dropped; originals kept
    assert(out.filter(!_._2).keySet == out.keySet.filter(_ >= 2000000L),
      "exactly the planted copies must be dropped")
    // the bucket cap composes: any cap above the max cluster size is a
    // no-op (and a cap below it drops boilerplate clusters whole, the
    // same contract as every other blocking scheme)
    val capped = Dedup.d08SemDedup(spark, sf, maxBucket = 400)
      .as[(Long, Boolean)].collect().toMap
    assert(capped == out, "cap above max cluster size must change nothing")
  }

  test("d06 embedding near-dup finds every scaled copy") {
    val pairs = Dedup.d06EmbedNeardup(spark, sf).as[(Long, Long)].collect()
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val planted = pairs.count { case (a, b) => b - a == 2000000L }
    assert(planted == nVecs, s"found $planted of $nVecs scaled copies")
  }

  test("near-dup blocking caps hot buckets (no quadratic bucket at scale)") {
    // one boilerplate bucket of 10 (over the cap → dropped whole) and one
    // genuine bucket of 3 (under the cap → all pairs emitted)
    val keyed = ((1 to 10).map(i => (i.toLong, 0, 7L)) ++
        Seq((100L, 1, 9L), (101L, 1, 9L), (102L, 1, 9L)))
      .toDF("doc_id", "band", "key")
    val pairs = Dedup.cappedBucketPairs(keyed, maxBucket = 5)
      .as[(Long, Long)].collect()
    assert(pairs.toSet == Set((100L, 101L), (100L, 102L), (101L, 102L)),
      s"oversize bucket must be dropped whole, got ${pairs.toSeq}")
  }

  test("exact-variant collector state is hard-bounded and the cap never binds (r20)") {
    // The exact-oracle variants (d03/d04/d05 Exact, d09) may not drop any
    // bucket, so ExactCorpusCap is a STATE bound, not a semantic one: it
    // only works because their corpora are pinned under it by
    // construction. Pin both halves — the corpus fits under the cap, and
    // the collector's peak buffer across a full d09 run stays ≤ cap.
    val corpusRows = 2 * spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 250).count()
    assert(corpusRows > 0 && corpusRows <= Dedup.ExactCorpusCap,
      s"exact-variant corpus ($corpusRows rows) must fit under " +
        s"ExactCorpusCap=${Dedup.ExactCorpusCap} or buckets could drop")
    val probe = new java.util.concurrent.atomic.AtomicLong(0L)
    graft.functions.CappedCollectLongs.bufferProbe = probe
    try {
      val n = Dedup.d09DupComponents(spark, sf).count()
      assert(n == corpusRows, s"d09 must label every corpus doc, got $n")
      assert(probe.get() > 0L, "probe must have observed the aggregation")
      assert(probe.get() <= Dedup.ExactCorpusCap,
        s"collector buffer peaked at ${probe.get()} ids — no aggregate " +
          "may hold unbounded per-key state")
    } finally graft.functions.CappedCollectLongs.bufferProbe = null
  }

  test("verified-pair blocking: payload rides the exchange, caps and dedup hold") {
    // bucket 7 oversize (dropped whole, never verified), bucket 9 holds two
    // close members and one far one (the verifier rejects it), and a second
    // band repeats the close pair (deduped to one output row)
    val keyed = ((1 to 10).map(i => (i.toLong, 1, 7L, 0.0)) ++
        Seq((100L, 1, 9L, 1.0), (101L, 1, 9L, 1.4), (102L, 1, 9L, 99.0),
          (100L, 2, 11L, 1.0), (101L, 2, 11L, 1.4)))
      .toDF("doc_id", "band", "key", "p")
    val pairs = Dedup.cappedVerifiedPairs(keyed, maxBucket = 5,
        (pa, pb) => abs(pa - pb) < lit(1.0))
      .as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((100L, 101L)),
      s"expected the one verified pair exactly once, got ${pairs.toSeq}")
  }

  test("d05 exact variant equals all-pairs string-shingle jaccard >= 0.6") {
    val out = Dedup.d05NgramJaccardExact(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 250)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val corpus = base ++ base.map { case (id, t) => (id + 2000000L, t) }
    val shingles = corpus.map { case (id, t) =>
      (id, (0 to t.length - 5).map(i => t.substring(i, i + 5)).toSet)
    }
    val brute = (for {
      (ia, sa) <- shingles; (ib, sb) <- shingles
      if ia < ib
      inter = (sa & sb).size.toDouble
      j = inter / (sa.size + sb.size - inter)
      if j >= 0.6
    } yield (ia, ib, j)).toSet
    assert(out == brute, s"exact ${out.size} vs brute ${brute.size}")
    // the base table's own planted near-dups are deterministically banded
    assert(brute.exists { case (a, b, _) => b - a != 2000000L },
      "expected cross pairs from the d01-planted base dups")
  }

  test("d04/d06 planted recall survives a binding bucket cap") {
    // cap small enough to bind on the test corpus: planted pairs live in
    // tiny buckets, so dropping hot buckets must not cost recall
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val d04 = Dedup.d04Simhash(spark, sf, maxBucket = 50)
      .select($"a", $"b").as[(Long, Long)].collect()
    assert(d04.count { case (a, b) => b - a == 2000000L }.toDouble / nDocs >= 0.7)
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val d06 = Dedup.d06EmbedNeardup(spark, sf, maxBucket = 50)
      .as[(Long, Long)].collect()
    assert(d06.count { case (a, b) => b - a == 2000000L } == nVecs)
  }

  test("d13 substring removal equals driver-side brute force; sentinel grams vanish") {
    val out = Dedup.d13SubstringDedup(spark, sf)
      .select($"doc_id", $"n_words", $"n_kept", $"text_dedup")
      .as[(Long, Long, Long, String)].collect()
    // independent recompute: positional string grams, cross-doc document
    // frequency, coverage flatten, reassembly
    val sentinel = " the quick brown fox jumps over lazy dogs"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> (if (id % 3 == 0) t + sentinel else t) }
    val wordsOf = docs.map { case (id, t) => id -> t.trim.split("\\s+") }.toMap
    val gramsOf: Map[Long, Seq[(Int, String)]] = wordsOf.map { case (id, ws) =>
      id -> (if (ws.length < 8) Seq(0 -> ws.mkString(" "))
             else (0 to ws.length - 8).map(i => i -> ws.slice(i, i + 8).mkString(" ")))
    }
    val df = gramsOf.toSeq.flatMap { case (id, gs) => gs.map(_._2).distinct.map(g => (g, id)) }
      .groupBy(_._1).map { case (g, occ) => g -> occ.map(_._2).distinct.size }
    for ((id, nWords, nKept, text) <- out) {
      val ws = wordsOf(id)
      val starts = gramsOf(id).collect { case (i, g) if df(g) >= 2 => i }
      val covered = starts.flatMap(s => s to s + 7).toSet
      val keep = ws.indices.filterNot(covered)
      assert(nWords == ws.length.toLong, s"doc $id n_words")
      assert(nKept == keep.size.toLong, s"doc $id n_kept")
      assert(text == keep.map(ws).mkString(" "), s"doc $id text")
    }
    // the sentinel's trailing gram is duplicated corpus-wide: every
    // doc_id % 3 == 0 document loses at least its last 8 words
    out.filter(_._1 % 3 == 0).foreach { case (id, nWords, nKept, _) =>
      assert(nKept <= nWords - 8, s"doc $id sentinel not removed") }
    // partial coverage exists (docs trimmed but not emptied), pinning
    // that removal is span-level, not whole-document
    assert(out.exists { case (_, nw, nk, _) => nk > 0 && nk < nw },
      "expected at least one partially-trimmed document")
  }

  test("d11 fuzzy decontamination: benchmark broadcasts, flags exactly the planted overlaps") {
    val df = Dedup.d11DecontaminateFuzzy(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the benchmark side rides broadcasts; the corpus never sort-merges
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    val rows = df.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    // every benchmark doc is in the corpus, so doc_id < 20 always flags
    // (self-match at Jaccard 1.0; the REPORTED id may be a lower-id
    // near-dup inside the benchmark itself)
    rows.filter(_._1 < 20).foreach { case (id, c, b) =>
      assert(c && b <= id, s"doc $id should flag with a match <= itself")
    }
    // verify EVERY row against a driver-side exact word-shingle Jaccard
    // brute force over the benchmark
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] =
      t.trim.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 0.0
      else a.intersect(b).size.toDouble / a.union(b).size
    rows.foreach { case (id, c, b) =>
      val want = (0L until 20L).filter(k =>
        jac(shingles(texts(id)), shingles(texts(k))) >= 0.5)
      assert(c == want.nonEmpty, s"doc $id contamination flag")
      assert(b == want.headOption.getOrElse(-1L), s"doc $id bench_id")
    }
  }

  test("d12 semantic decontamination: benchmark broadcasts, exact cosine brute-force agreement") {
    val df = Dedup.d12DecontaminateSemantic(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    val rows = df.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    // verify EVERY row against a driver-side exact cosine brute force
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    rows.foreach { case (id, c, b) =>
      val want = (0L until 20L).filter(k => cos(vecs(id), vecs(k)) >= 0.9)
      assert(c == want.nonEmpty, s"vec $id contamination flag")
      assert(b == want.headOption.getOrElse(-1L), s"vec $id bench_id")
    }
    // the benchmark is in the corpus: every vec_id < 20 self-flags
    assert(rows.filter(_._1 < 20).forall(_._2))
  }

  test("d01 exact dedup halves the doubled corpus") {
    val out = Dedup.d01DedupExact(spark, sf)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == nDocs)
    assert(out.agg(sum($"n_copies")).as[Long].head() == 2 * nDocs)
  }

  test("exact dedup shuffles hash keys, never the text (d01/d02/x15 plan pin)") {
    // At 100 TB the exchange key must be the 128-bit text hash, not the
    // document/line string: every hashpartitioning exchange in the three
    // exact-dedup plans partitions on h1/h2, and no exchange key mentions
    // the text or line column.
    def hashExchanges(plan: String): Seq[String] =
      plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    val plans = Seq(
      "d01" -> Dedup.d01DedupExact(spark, sf).queryExecution.executedPlan.toString,
      "d02" -> Dedup.d02DedupExactMulti(spark, sf).queryExecution.executedPlan.toString,
      "x15" -> TextAnalysis.x15LineDedup(spark, sf).queryExecution.executedPlan.toString)
    plans.foreach { case (name, plan) =>
      val ex = hashExchanges(plan)
      assert(ex.nonEmpty, s"$name: expected at least one hash exchange")
      // the dedup exchange partitions on the hash pair (d02's second,
      // per-source fold legitimately partitions on source — also not text)
      assert(ex.exists(l => l.contains("h1#") && l.contains("h2#")),
        s"$name: no exchange partitions on the hash pair:\n${ex.mkString("\n")}")
      ex.foreach { line =>
        assert(!line.contains("text#") && !line.contains("line#"),
          s"$name exchange key must not carry the string: $line")
      }
    }
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bounded top-k aggregate equals the rank window, ties included, no sort in plan") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    // deterministic pseudo-random pairs with PLANTED SIM TIES (sim takes
    // only 16 distinct values over 50k pairs, so every query has dozens
    // of ties at the k boundary — the id-asc tiebreak must decide both
    // implementations identically)
    val scored = spark.range(50000).select(
      (col("id") % 100).as("query_id"),
      col("id").as("neighbor_id"),
      ((col("id") * 2654435761L % 16L) / 16.0).as("sim"))
    val k = 5
    val viaAgg = scored.groupBy(col("query_id"))
      .agg(graft.functions.F.topKPairs(col("sim"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        (col("pos") + 1L).as("rnk"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val viaWindow = scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
    assert(viaAgg.count() == 100L * k)
    assert(viaAgg.except(viaWindow).count() == 0 &&
      viaWindow.except(viaAgg).count() == 0,
      "bounded top-k aggregate diverged from the rank window")
    // shape pin: the aggregate path must contain NO sort below the agg
    // (the whole point — the window form sorts every partition's full
    // pair stream) and must hash-aggregate, not sort-aggregate
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    val beforeExchange = plan.split("Exchange")(plan.split("Exchange").length - 1)
    assert(!beforeExchange.contains("Sort "),
      s"map-side sort under the top-k aggregate:\n$plan")
  }

  test("top-k aggregate boundaries: <k candidates, NaN-first order, implicit casts") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val k = 5
    def agg(df: DataFrame): DataFrame = df.groupBy(col("query_id"))
      .agg(graft.functions.F.topKPairs(col("sim"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        (col("pos") + 1L).as("rnk"))
    // (a) <k non-null candidates: the aggregate returns exactly the
    // non-null candidates best-first (the window form ranks nulls last —
    // this is the agreed boundary the scaladoc documents)
    val sparse = Seq((1L, 10L, Some(0.9)), (1L, 11L, Some(0.5)),
      (1L, 12L, Some(0.7)), (1L, 13L, None))
      .toDF("query_id", "neighbor_id", "sim")
    val got = agg(sparse).orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((10L, 1L), (12L, 2L), (11L, 3L)),
      s"<k boundary diverged: $got")
    // (b) NaN sims: Spark's desc ordering ranks NaN FIRST (NaN greatest);
    // the aggregate's total-order comparator must agree with the rank
    // window exactly — primitive comparisons would drop NaN when full
    // and corrupt the sorted prefix when not (r18 ADVICE #4)
    val withNan = Seq((1L, 1L, Double.NaN), (1L, 2L, 0.9), (1L, 3L, Double.NaN),
      (1L, 4L, 0.8), (1L, 5L, 0.7), (1L, 6L, 0.95), (1L, 7L, 0.1))
      .toDF("query_id", "neighbor_id", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val viaWindow = withNan.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
    val viaAgg = agg(withNan)
    assert(viaAgg.except(viaWindow).count() == 0 &&
      viaWindow.except(viaAgg).count() == 0,
      "NaN ordering diverged from the rank window")
    val first = viaAgg.filter(col("rnk") === 1L).collect().head.getLong(1)
    assert(first == 1L, s"NaN must rank first under desc (id-asc tiebreak), got $first")
    // (c) float sim / int id columns implicit-cast at analysis instead of
    // ClassCastException-ing mid-task; ranking is cast-invariant here
    val viaFloat = agg(withNan.select(col("query_id"),
      col("neighbor_id").cast("int").as("neighbor_id"),
      col("sim").cast("float").as("sim")))
    assert(viaFloat.except(viaAgg).count() == 0 &&
      viaAgg.except(viaFloat).count() == 0,
      "float/int inputs diverged after implicit cast")
  }

  test("s06 range search returns exactly the radius set, empty off-threshold") {
    // planted copies are the ONLY pairs above τ=0.8 (natural max 0.48):
    // 5 copies per query, nothing else
    val out = Similarity.s06RangeSearchGate(spark, sf)
      .as[(Long, Long)].collect()
    val nQueries = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" % 50 === 0).count()
    assert(out.length == 5 * nQueries, s"expected ${5 * nQueries} pairs, got ${out.length}")
    assert(out.forall { case (q, n) => n >= 1000000L + q * 10 + 1 && n <= 1000000L + q * 10 + 5 })
    // the raw corpus has no pair at this radius — threshold respected
    assert(Similarity.s06RangeSearch(spark, sf).count() == 0)
  }

  test("s01 brute-force matches a driver-side exact computation") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = emb.keys.filter(_ % 50 == 0).flatMap { q =>
      emb.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(emb(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (q, id, (i + 1).toLong) }
    }.toSet
    val got = Similarity.s01AnnBruteforce(spark, sf).as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("s03 ivf on clustered corpus: recall >=0.95 scanning a probed fraction") {
    // IVF's design case: data with cluster structure (what real embedding
    // corpora look like). 25 planted clusters x 20 jittered members.
    val rnd = new scala.util.Random(7)
    def gauss(): Float = rnd.nextGaussian().toFloat
    val centers = Array.fill(25)(Array.fill(64)(gauss()))
    val vecs: Seq[(Long, Array[Float])] = (for {
      c <- centers.indices
      m <- 0 until 20
    } yield ((c * 20 + m).toLong,
      centers(c).map(x => x + 0.35f * gauss()))).toSeq
    val e = vecs.toDF("vec_id", "embedding")
    val q = vecs.filter(_._1 % 10 == 0).map { case (id, v) => (id, v) }
      .toDF("query_id", "qv")
    val sample = vecs.map(v => Similarity.normalize(v._2)).toArray
    val cents = Similarity.trainKMeans(sample, 25, iters = 12)
    val ivf = Similarity.s03AnnIvfOn(e, q, cents, nProbe = 4, repl = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // driver-side exact top-5
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val emb = vecs.toMap
    val exact = emb.keys.filter(_ % 10 == 0).flatMap { qid =>
      vecs.filter(_._1 != qid).map { case (id, v) => (id, cos(emb(qid), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
        .map { case (id, _) => (qid, id) }
    }.toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.95, s"ivf clustered recall $recall")
  }

  test("s03 ivf on the uniform corpus: honest worst-case recall >=0.55") {
    // The testdata embeddings are uniform random 64-dim (max pairwise
    // cosine 0.48) — the no-locality worst case for any ANN index. r3's
    // 0.96 here was a seed/query coincidence artifact (see Similarity
    // scaladoc); the honest defaults bound, not a quality target.
    val exact = Similarity.s01AnnBruteforce(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.s03AnnIvf(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.55, s"ivf uniform recall $recall")
  }

  test("s03 plan: corpus stays map-only below the broadcast join (no corpus shuffle)") {
    val plan = Similarity.s03AnnIvf(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probes must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must never shuffle for the join:\n$plan")
    // allowed shuffles: candidate max-dedup, top-k window, final order —
    // anything more means assignment regressed to a shuffling plan
    val shuffles = "Exchange (?:hash|range)partitioning".r.findAllIn(plan).size
    assert(shuffles <= 3, s"expected <=3 shuffles, got $shuffles:\n$plan")
    assert(plan.contains("graft_nearest_cells"), "assignment must be the codegen'd map")
  }

  test("s04 pq+adc+rerank reaches >=0.85 recall on the uniform corpus") {
    val exact = Similarity.s01AnnBruteforce(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.s04AnnPq(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.85, s"pq uniform recall $recall")
  }

  test("s04 pq on clustered corpus: recall >=0.95") {
    val rnd = new scala.util.Random(11)
    def gauss(): Float = rnd.nextGaussian().toFloat
    val centers = Array.fill(25)(Array.fill(64)(gauss()))
    val vecs: Seq[(Long, Array[Float])] = (for {
      c <- centers.indices; m <- 0 until 20
    } yield ((c * 20 + m).toLong, centers(c).map(x => x + 0.35f * gauss()))).toSeq
    val e = vecs.toDF("vec_id", "embedding")
    val q = vecs.filter(_._1 % 10 == 0).toDF("query_id", "qv")
    val cbs = Similarity.pqTrain(vecs.map(v => Similarity.normalize(v._2)).toArray, 8, 32)
    val pq = Similarity.s04AnnPqOn(e, q, cbs, rerank = 100)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val emb = vecs.toMap
    val exact = emb.keys.filter(_ % 10 == 0).flatMap { qid =>
      vecs.filter(_._1 != qid).map { case (id, v) => (id, cos(emb(qid), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
        .map { case (id, _) => (qid, id) }
    }.toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.95, s"pq clustered recall $recall")
  }

  test("s09 sq8 code is dim bytes and self-reconstruction dot >= 0.995") {
    // SQ8 keeps every dimension at byte precision: the 4x-compressed
    // code of a normalized vector must reconstruct to ~itself (per-dim
    // error <= span/510), so the asymmetric self-score sits near 1.0 —
    // far above the 0.48 natural-cosine ceiling the gate margin needs
    val sample = (0 until 200).map { i =>
      val rnd = new scala.util.Random(i)
      Similarity.normalize(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }.toArray
    val (mins, spans) = Similarity.sqTrain(sample)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    sample.take(20).foreach { v =>
      val code = graft.functions.PqKernel.sqEncode(new GenericArrayData(v), mins, spans)
      assert(code.length == 64, "one byte per dimension")
      val self = graft.functions.PqKernel.sqScore(new GenericArrayData(v), code, mins, spans)
      assert(self >= 0.995, s"self-reconstruction dot $self")
    }
  }

  test("s09 sq+rerank reaches >=0.95 recall on the uniform corpus") {
    // byte-precision quantization barely perturbs ranks: with the same
    // rerank=100 cut as s04 the uniform worst case stays near-exact
    val exact = Similarity.s01AnnBruteforce(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val sq = Similarity.s09AnnSq(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & sq).size.toDouble / exact.size
    assert(recall >= 0.95, s"sq uniform recall $recall")
  }

  test("s07 ivf-pq on clustered corpus: recall >=0.95 from the composite index") {
    // IVF-PQ's design case: cluster-structured data, both artifacts
    // trained on the same sample — the probed-cell scope and the coded
    // scan must COMPOSE without recall collapsing below either parent.
    val rnd = new scala.util.Random(19)
    def gauss(): Float = rnd.nextGaussian().toFloat
    val centers = Array.fill(25)(Array.fill(64)(gauss()))
    val vecs: Seq[(Long, Array[Float])] = (for {
      c <- centers.indices; m <- 0 until 20
    } yield ((c * 20 + m).toLong, centers(c).map(x => x + 0.35f * gauss()))).toSeq
    val e = vecs.toDF("vec_id", "embedding")
    val q = vecs.filter(_._1 % 10 == 0).toDF("query_id", "qv")
    val sample = vecs.map(v => Similarity.normalize(v._2)).toArray
    val cents = Similarity.trainKMeans(sample, 25, iters = 12)
    val cbs = Similarity.pqTrain(sample, 8, 32)
    val got = Similarity.s07AnnIvfPqOn(e, q, cents, cbs, nProbe = 4, repl = 2, rerank = 100)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val emb = vecs.toMap
    val exact = emb.keys.filter(_ % 10 == 0).flatMap { qid =>
      vecs.filter(_._1 != qid).map { case (id, v) => (id, cos(emb(qid), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
        .map { case (id, _) => (qid, id) }
    }.toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.95, s"ivf-pq clustered recall $recall")
  }

  test("opq: lower quantization error and no recall loss on anisotropic data") {
    // OPQ's design case: correlated variance misaligned with the subspace
    // split. Latent rank-8 structure spread across all 64 dims by a fixed
    // dense mixing matrix — each PQ subspace sees projections of the SAME
    // latent factors, which plain per-subspace k-means quantizes
    // independently (badly); the learned rotation re-axes the energy.
    val rnd = new scala.util.Random(23)
    def gauss(): Float = rnd.nextGaussian().toFloat
    val mix = Array.fill(64, 8)(gauss())
    val vecs: Seq[(Long, Array[Float])] = (0L until 500L).map { id =>
      val z = Array.fill(8)(gauss())
      val x = Array.tabulate(64)(i =>
        (mix(i).zip(z).map { case (a, b) => a * b }.sum + 0.05f * gauss()))
      (id, x)
    }
    val sample = vecs.map(v => Similarity.normalize(v._2)).toArray
    val pqCbs = Similarity.pqTrain(sample, 8, 32)
    val (rot, opqCbs) = Similarity.opqTrain(sample, 8, 32)
    val eye = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0f else 0.0f)
    val pqErr = Similarity.pqQuantError(sample, eye, pqCbs)
    val opqErr = Similarity.pqQuantError(sample, rot, opqCbs)
    assert(opqErr < pqErr * 0.9,
      f"opq must cut quantization error materially: pq=$pqErr%.4f opq=$opqErr%.4f")

    // end-to-end: same pipeline, rotated encode/LUT — recall must not lose
    val e = vecs.toDF("vec_id", "embedding")
    val q = vecs.filter(_._1 % 25 == 0).toDF("query_id", "qv")
    def recallOf(rotOpt: Option[Array[Array[Float]]],
        cbs: Array[Array[Array[Float]]]): Double = {
      val got = Similarity.s04AnnPqOn(e, q, cbs, rerank = 30, rot = rotOpt)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      val emb = vecs.toMap
      val exact = emb.keys.filter(_ % 25 == 0).flatMap { qid =>
        vecs.filter(_._1 != qid).map { case (id, v) => (id, cos(emb(qid), v)) }
          .sortBy { case (id, s) => (-s, id) }.take(5)
          .map { case (id, _) => (qid, id) }
      }.toSet
      (exact & got).size.toDouble / exact.size
    }
    val pqRecall = recallOf(None, pqCbs)
    val opqRecall = recallOf(Some(rot), opqCbs)
    assert(opqRecall >= pqRecall,
      f"opq recall must not regress: pq=$pqRecall%.3f opq=$opqRecall%.3f")
    // the rotation is orthogonal: R·Rᵀ = I (dot-product preservation is
    // what makes rotated-space ADC rank the ORIGINAL cosine order)
    for (i <- 0 until 64) {
      for (j <- 0 until 64) {
        val d = (0 until 64).map(k => rot(i)(k).toDouble * rot(j)(k)).sum
        assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-3,
          s"R not orthogonal at ($i,$j): $d")
      }
    }
  }

  test("s07 ivf-pq plan: one map assigns+encodes the corpus; probes broadcast") {
    val plan = Similarity.s07AnnIvfPq(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probes must broadcast:\n$plan")
    assert(plan.contains("graft_nearest_cells"), "cell assignment must be the codegen'd map")
    assert(plan.contains("graft_pq_encode"), "encoding must ride the same corpus map")
    assert(plan.contains("graft_pq_adc"), "scoring must be the ADC kernel, not cosine")
    // the corpus side must never sort-merge for the probe join
    assert(!plan.contains("SortMergeJoin"), s"corpus must never shuffle for the probe join:\n$plan")
  }

  test("s07 ivf-pq on the uniform corpus: honest composite worst-case recall >=0.5") {
    // Composite of two approximations on the no-locality worst case:
    // the probed-cell scope (s03 uniform ~0.6) intersected with ADC
    // ranking error (s04 uniform >=0.85) — the bound is their product's
    // neighborhood, not a quality target (see the s03 honesty note).
    val exact = Similarity.s01AnnBruteforce(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.s07AnnIvfPq(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"ivf-pq uniform recall $recall")
  }

  test("ann gate variants return exactly the planted copies at ranks 1..5") {
    // The oracle-exact gate construction (Similarity.plantedCorpus):
    // 5 exact copies of each query vector at ids 1000000 + qid*10 + j.
    // Identical arrays collide in every LSH table / IVF cell / PQ code by
    // construction, and cosine ~1.0 dwarfs the corpus max of 0.48 — so
    // every gate must return precisely the copy ids, ranked by id.
    for ((name, gate) <- Seq(
        "s02" -> Similarity.s02AnnLshGate _,
        "s03" -> Similarity.s03AnnIvfGate _,
        "s04" -> Similarity.s04AnnPqGate _,
        "s07" -> Similarity.s07AnnIvfPqGate _)) {
      val rows = gate(spark, sf)
        .select($"query_id", $"neighbor_id", $"rnk").as[(Long, Long, Long)].collect()
      assert(rows.nonEmpty, s"$name gate empty")
      for ((qid, nid, rnk) <- rows)
        assert(nid == 1000000L + qid * 10 + rnk,
          s"$name gate: query $qid rank $rnk expected planted id, got $nid")
    }
  }

  test("s05 filtered ann: every neighbor carries the query's label; gate returns planted ids") {
    // production kernel: the label predicate is enforced inside the
    // bucket join, so no cross-label neighbor can ever appear
    val lbl = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val out = Similarity.s05AnnFiltered(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    for ((qid, nid) <- out)
      assert(lbl(nid) == lbl(qid), s"neighbor $nid label ${lbl(nid)} != query $qid label ${lbl(qid)}")
    // gate: planted same-label copies are provably the filtered top-5
    val rows = Similarity.s05AnnFilteredGate(spark, sf)
      .select($"query_id", $"neighbor_id", $"rnk").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((qid, nid, rnk) <- rows)
      assert(nid == 2000000L + qid * 10 + rnk,
        s"s05 gate: query $qid rank $rnk expected planted id, got $nid")
  }

  test("s02 lsh returns correctly-ranked true neighbors (recall>=0.8 on uniform data)") {
    val exact = Similarity.s01AnnBruteforce(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.s02AnnLsh(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"lsh recall $recall")
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("x26 keyword plan: the df table broadcasts, argmax stays per-doc (no sort-merge join)") {
    val out = TextAnalysis.x26DocKeywords(spark, sf)
    // finalize AQE so the executed plan is the real one
    val rows = out.as[(Long, String, Long, Long, Double)].collect()
    val finalPlan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("BroadcastHashJoin"),
      "score join must broadcast the vocabulary-sized df table")
    assert(!finalPlan.contains("SortMergeJoin"),
      "a sort-merge join here means the df side shuffled the corpus")
    // and the result is sane: one keyword per document, score = tf/df
    val nDocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.trim($"text") =!= "").count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { case (_, _, tf, df, score) =>
      assert(score == tf.toDouble / df && tf >= 1 && df >= 1)
    }
  }

  test("p10 preference pairs: shared prompt prefix, contrasting legs, masks align") {
    import graft.functions.BpeVocab
    val rows = TextAnalysis.p10DpoPairs(spark, sf)
      .as[(Long, String, String, String, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, ct, cm, rt, rm, np, nc, nr) =>
      val (cIds, cMask) = (ct.split(" "), cm.split(" "))
      val (rIds, rMask) = (rt.split(" "), rm.split(" "))
      // masks align 1:1 with ids; prompt prefix (mask 0) is SHARED
      assert(cIds.length == cMask.length && rIds.length == rMask.length, s"doc $id")
      assert(cIds.length == np + nc && rIds.length == np + nr, s"doc $id counts")
      assert(cMask.takeWhile(_ == "0").length == np, s"doc $id prompt mask")
      assert(cIds.take(np.toInt).sameElements(rIds.take(np.toInt)), s"doc $id prefix")
      // both legs end in EOS and train it
      assert(cIds.last.toLong == BpeVocab.EosId && cMask.last == "1", s"doc $id")
      // same response-token MULTISET, reversed word order: counts agree,
      // and any multi-word response with distinct words must DIFFER in order
      assert(nc == nr, s"doc $id leg counts")
      val (cResp, rResp) = (cIds.drop(np.toInt), rIds.drop(np.toInt))
      assert(cResp.sorted.sameElements(rResp.sorted), s"doc $id response multiset")
    }
    // the corpus must actually exercise the contrast (some pair differs)
    assert(rows.exists { case (_, ct, _, rt, _, np, _, _) =>
      ct.split(" ").drop(np.toInt).mkString(" ") !=
        rt.split(" ").drop(np.toInt).mkString(" ") })
  }

  test("p06 packed sequences: exact budget, EOS accounting, stream reconstruction") {
    import graft.functions.BpeVocab
    val rows = TextAnalysis.p06PackedSequences(spark, sf)
      .select($"shard", $"seq_id", $"n_tokens", $"seq_text")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // every sequence but the last of each shard holds EXACTLY the budget;
    // seq_ids are dense from 0
    rows.groupBy(_._1).foreach { case (shard, seqs) =>
      val sorted = seqs.sortBy(_._2)
      assert(sorted.map(_._2).toVector == sorted.indices.map(_.toLong).toVector,
        s"shard $shard seq_ids not dense")
      sorted.init.foreach { case (_, sid, n, txt) =>
        assert(n == 128L, s"shard $shard seq $sid n_tokens $n")
        assert(txt.split(" ").length == 128, s"shard $shard seq $sid text len")
      }
      assert(sorted.last._3 <= 128L)
    }
    // driver-side reconstruction: per shard, the concatenated sequence
    // streams equal the concatenated per-doc id streams in doc_id order
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val wantByShard: Map[Long, Vector[Long]] = docs.groupBy(_._1 % 8).map {
      case (shard, ds) => shard -> ds.sortBy(_._1).toVector.flatMap { case (_, t) =>
        BpeVocab.tokenIds(org.apache.spark.unsafe.types.UTF8String.fromString(t))
          .toLongArray().toVector :+ BpeVocab.EosId
      }
    }
    rows.groupBy(_._1).foreach { case (shard, seqs) =>
      val got = seqs.sortBy(_._2).toVector.flatMap(_._4.split(" ").map(_.toLong))
      assert(got == wantByShard(shard), s"shard $shard stream mismatch")
    }
    // EOS count per shard == document count per shard (one boundary each)
    rows.groupBy(_._1).foreach { case (shard, seqs) =>
      val eos = seqs.flatMap(_._4.split(" ")).count(_.toLong == BpeVocab.EosId)
      assert(eos == docs.count(_._1 % 8 == shard), s"shard $shard EOS count")
    }
  }

  test("x25 domain rank equals a driver-side integer PageRank (exact, all rows)") {
    val rows = TextAnalysis.x25DomainRank(spark, sf)
      .select($"domain", $"rank", $"out_links", $"in_links")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // independent recompute: same fixed-point ladder, plain Scala maps
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id").as[Long].collect()
    val edges = ids.map(i => (s"d${i % 64}.example", s"d${(i * 31 + 7) % 64}.example"))
      .groupBy(identity).map { case (e, o) => (e._1, e._2, o.size.toLong) }.toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val od = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val il = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._3).sum }
    val Scale = 1000000000000L
    var r = nodes.map(_ -> Scale).toMap
    for (_ <- 1 to 5) {
      val s = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, m) => m * Math.floorDiv(r(src), od(src)) }.sum }
      r = nodes.map(n => n -> (Scale * 15L / 100L +
        Math.floorDiv(85L * s.getOrElse(n, 0L), 100L))).toMap
    }
    assert(rows.length == nodes.size)
    rows.foreach { case (d, rank, o, i) =>
      assert(rank == r(d), s"domain $d rank")
      assert(o == od.getOrElse(d, 0L), s"domain $d out_links")
      assert(i == il.getOrElse(d, 0L), s"domain $d in_links")
    }
    // structural sanity: every rank carries at least the teleport base,
    // and dangling leak keeps total mass at or under the start
    assert(rows.forall(_._2 >= Scale * 15L / 100L))
    assert(rows.map(_._2).sum <= Scale * nodes.size)
    // ranks genuinely differentiate (the multigraph is non-uniform)
    assert(rows.map(_._2).distinct.length > 1)
    // the driver fast path and the distributed rounds agree exactly
    val dist = TextAnalysis.x25DomainRank(spark, sf, localEdgeCap = 0L)
      .select($"domain", $"rank", $"out_links", $"in_links")
      .as[(String, Long, Long, Long)].collect()
    assert(dist.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq,
      "local and distributed PageRank ladders diverged")
  }

  test("p07 capstone: packed totals reconcile exactly with p05's accounting") {
    val seqs = TextAnalysis.p07CurateAndPack(spark, sf)
      .select($"shard", $"seq_id", $"n_tokens", $"seq_text")
      .as[(Long, Long, Long, String)].collect()
    assert(seqs.nonEmpty)
    // cross-gate invariant: p07 packs EXACTLY the tokens p05 accounts
    // for — Σ n_tokens = Σ tokens_bpe + one EOS per unique survivor
    val p05 = TextAnalysis.p05CrawlCuration(spark, sf)
      .select($"n_unique", $"tokens_bpe").as[(Long, Long)].collect()
    val survivors = p05.map(_._1).sum
    assert(seqs.map(_._3).sum == p05.map(_._2).sum + survivors,
      "packed token total diverged from the curation accounting")
    val eos = graft.functions.BpeVocab.EosId
    assert(seqs.flatMap(_._4.split(" ")).count(_.toLong == eos) == survivors,
      "EOS count != survivor count")
    // budget: every sequence but the last of its shard is exactly full
    seqs.groupBy(_._1).foreach { case (sh, ss) =>
      ss.sortBy(_._2).init.foreach { case (_, sid, n, _) =>
        assert(n == 128L, s"shard $sh seq $sid") }
    }
  }

  test("p08 SFT packing: id stream equals p06, masks reconstruct the prompt cut") {
    import graft.functions.BpeVocab
    val p8 = TextAnalysis.p08SftPacking(spark, sf)
      .select($"shard", $"seq_id", $"n_tokens", $"n_trained", $"seq_text", $"mask_text")
      .as[(Long, Long, Long, Long, String, String)].collect()
    assert(p8.nonEmpty)
    // BPE whitespace additivity: tokenize(prompt) ++ tokenize(completion)
    // == tokenize(text), so the packed ID stream must equal p06's exactly
    val p6 = TextAnalysis.p06PackedSequences(spark, sf)
      .select($"shard", $"seq_id", $"n_tokens", $"seq_text")
      .as[(Long, Long, Long, String)].collect()
    assert(p8.map(r => (r._1, r._2, r._3, r._5)).sortBy(x => (x._1, x._2)).toSeq ==
      p6.sortBy(x => (x._1, x._2)).toSeq, "SFT id stream diverged from p06")
    // per-row: n_trained is exactly the mask's popcount, lengths agree
    p8.foreach { case (sh, sid, n, tr, ids, mask) =>
      val ms = mask.split(" ")
      assert(ms.length == n && ids.split(" ").length == n, s"$sh/$sid lengths")
      assert(ms.count(_ == "1") == tr, s"$sh/$sid n_trained")
      assert(ms.forall(m => m == "0" || m == "1"))
    }
    // mask stream equals a driver recompute of the declared cut
    def ids(t: String): Int = BpeVocab.tokenIds(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)).numElements()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val wantMasks = docs.groupBy(_._1 % 8).map { case (s, ds) =>
      s -> ds.sortBy(_._1).toVector.flatMap { case (_, t) =>
        val ws = t.trim.split("\\s+")
        val cut = (ws.length + 1) / 2
        val p = ws.take(cut).mkString(" ")
        val c = ws.drop(cut).mkString(" ")
        Vector.fill(ids(p))("0") ++ Vector.fill(ids(c) + 1)("1")
      } }
    p8.groupBy(_._1).foreach { case (shard, seqs) =>
      val got = seqs.sortBy(_._2).toVector.flatMap(_._6.split(" "))
      assert(got == wantMasks(shard), s"shard $shard mask stream mismatch")
    }
  }

  test("p05 runs the heavy extraction pass once (ReusedExchange plan pin)") {
    // p05 fans out into two consumers (per-source totals and the
    // cross-source dedup) over ONE (h1, h2, source) aggregate. The keyed
    // collision guard references every aggregate output, so per-branch
    // column pruning cannot specialize the aggregate lists — without
    // that, the two exchanges stop being sameResult and the extraction +
    // scoring subtree silently runs once per branch (observed before
    // this shape landed). Pin the reuse in the FINAL adaptive plan.
    val df = TextAnalysis.p05CrawlCuration(spark, sf)
    df.collect() // finalize AQE so the executed plan is the real one
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert(finalPlan.linesIterator.exists(l =>
      l.contains("ReusedExchange") && l.contains("hashpartitioning(h1")),
      s"p05: the (h1, h2, source) exchange is not reused:\n$finalPlan")
    // the extraction expression must appear exactly twice — once per leg
    // of the doubled-corpus union — not twice per consumer branch
    val heavy = "graft_html_text".r.findAllMatchIn(finalPlan).size
    assert(heavy == 2,
      s"p05: heavy extraction appears $heavy times in the final plan (want 2):\n$finalPlan")
  }

  test("p04 epoch shuffle: a permutation per epoch, epochs decorrelate, shards balanced") {
    val out = TextAnalysis.p04EpochShuffle(spark, sf)
      .as[(Int, Int, Long, Long)].collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(1, 2))
    for ((_, rows) <- byEpoch) {
      // every doc exactly once per epoch (it IS a permutation)
      assert(rows.map(_._4).distinct.length == nDocs.toInt)
      // positions are 1..n within each shard (dense ranks, no gaps)
      for ((_, srows) <- rows.groupBy(_._2))
        assert(srows.map(_._3).sorted.toSeq == (1L to srows.length).toSeq)
      // no shard hogs the corpus (hash balance, loose 3x bound)
      val sizes = rows.groupBy(_._2).values.map(_.length)
      assert(sizes.max <= 3 * math.max(1, sizes.min))
    }
    // different seeds must yield a DIFFERENT order: compare the doc
    // sequence of a shard that exists in both epochs
    val seq1 = byEpoch(1).filter(_._2 == 0).sortBy(_._3).map(_._4).toSeq
    val seq2 = byEpoch(2).filter(_._2 == 0).sortBy(_._3).map(_._4).toSeq
    assert(seq1 != seq2, "epochs must not replay the same order")
  }

  test("p03 budget mix: every source fills its token budget with minimal overshoot, deterministically") {
    val out = TextAnalysis.p03TokenBudgetMix(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    for ((source, nTotal, nKept, tokTotal, tokKept) <- out) {
      val budget = tokTotal / 2
      assert(nKept <= nTotal)
      // the kept set is the smallest hash-order prefix reaching the budget:
      // it never under-fills, and dropping its last doc would under-fill
      assert(tokKept >= budget, s"$source under-filled: $tokKept < $budget")
      assert(nKept < nTotal || tokKept == tokTotal, s"$source kept everything yet total>budget")
    }
    val again = TextAnalysis.p03TokenBudgetMix(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.sameElements(again), "selection must be deterministic")
  }

  test("x13 exact quantiles match a driver-side sort-and-index replay") {
    val out = TextAnalysis.x13ExactQuantiles(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    val bySource = docs.groupBy(_._2)
    for ((source, nDocs, p50, p90, p99) <- out) {
      val toks = bySource(source)
        .map { case (id, _, t) => (t.trim.split("\\s+").length.toLong, id) }
        .sortBy(identity)
      assert(nDocs == toks.length)
      def at(p: Int) = toks(((p.toLong * toks.length + 99) / 100).toInt - 1)._1
      assert(p50 == at(50) && p90 == at(90) && p99 == at(99),
        s"$source quantiles ($p50,$p90,$p99) != (${at(50)},${at(90)},${at(99)})")
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("p02 packing accounting matches a driver-side replay of concat-and-chunk") {
    val out = TextAnalysis.p02SequencePacking(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    val bySource = docs.groupBy(_._2)
    for ((source, nDocs, total, nSeqs, nCross, waste) <- out) {
      val toks = bySource(source).sortBy(_._1)
        .map(d => d._3.trim.split("\\s+").length.toLong)
      val starts = toks.scanLeft(0L)(_ + _)
      val cross = toks.indices.count(i =>
        toks(i) > 0 && starts(i) / 256 != (starts(i) + toks(i) - 1) / 256)
      assert(nDocs == toks.length && total == toks.sum, s"$source totals")
      assert(nSeqs == (toks.sum + 255) / 256, s"$source seqs")
      assert(nCross == cross.toLong, s"$source crossing: got $nCross want $cross")
      assert(waste == nSeqs * 256 - total, s"$source waste")
    }
  }

  test("x08 decontamination flags the base table's planted text dups") {
    val out = TextAnalysis.x08Decontaminate(spark, sf)
      .as[(Long, Long, Boolean)].collect()
    val flagged = out.filter(_._3).map(_._1)
    assert(flagged.nonEmpty, "expected contaminated docs (d01-planted dups cross the %5 blocklist)")
    assert(out.count(_._3) < out.length / 10, "contamination should be the exception")
    // flagged docs must share at least one 8-gram with a blocklist doc (exactness by construction)
    assert(out.filter(_._3).forall(_._2 > 0))
  }

  test("x11 redacts exactly the planted PII and leaves no residual matches") {
    val out = TextAnalysis.x11PiiRedact(spark, sf)
      .select($"doc_id", $"n_email", $"n_phone", $"n_ip", $"clean")
      .as[(Long, Int, Int, Int, String)].collect()
    for ((id, ne, np, ni, clean) <- out) {
      if (id % 7 == 0) assert((ne, np, ni) == ((2, 1, 1)), s"doc $id counts")
      else assert((ne, np, ni) == ((0, 0, 0)), s"doc $id should be clean")
      // the scrub must be complete: no pattern survives in the output
      for (p <- Seq(TextAnalysis.piiEmail, TextAnalysis.piiPhone, TextAnalysis.piiIpv4))
        assert(!p.r.findFirstIn(clean).isDefined, s"doc $id residual match for $p")
      if (id % 7 == 0) assert(clean.contains("[EMAIL]") && clean.contains("[PHONE]") && clean.contains("[IP]"))
    }
  }

  test("x09 repetition ratio is sane on the salad corpus") {
    val out = TextAnalysis.x09Repetition(spark, sf)
      .select($"rep_ratio").as[Double].collect()
    assert(out.forall(r => r >= 0.0 && r < 0.5))
  }

  test("x03 langid classifies constructed sentences") {
    val samples = Seq(
      ("en", "the cat and the dog of the house is going to sleep in a corner"),
      ("es", "el perro y la casa de que los gatos y las aves es bonito"),
      ("fr", "le chien et la maison de les oiseaux des chats est une merveille"),
      ("de", "der hund und die katze und das haus ist nicht ein problem zu haben"),
      ("zh", "我 在 这 有 他 的 是 了 的 是")).toDF("expected", "text")
    val pred = TextAnalysis.langIdOver(samples, col("text"))
      .select($"expected", $"lang_pred").as[(String, String)].collect()
    pred.foreach { case (exp, got) => assert(exp == got, s"expected $exp got $got") }
  }

  test("x04 fingerprints are deterministic across runs") {
    val a = TextAnalysis.x04Fingerprint(spark, sf).as[(Long, Long)].collect()
    val b = TextAnalysis.x04Fingerprint(spark, sf).as[(Long, Long)].collect()
    assert(a.sameElements(b))
    assert(a.map(_._2).distinct.length > a.length / 2, "fingerprints should mostly differ")
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("m01 plumbing: every doc decoded, features normalized, deterministic") {
    val out = Multimodal.m01MultimodalPipeline(spark, sf)
    val rows = out.as[(Long, String, Int, Boolean)].collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    assert(rows.forall(_._3 > 0), "payload bytes present")
    assert(rows.forall { case (_, fmt, _, ok) => fmt == "image/bmp" && ok })
    val again = Multimodal.m01MultimodalPipeline(spark, sf).as[(Long, String, Int, Boolean)].collect()
    assert(rows.sameElements(again))
  }

  test("m11 interleaved packing: decoded-geometry patch counts, stream layout, p06 agreement") {
    import graft.functions.BpeVocab
    val rows = Multimodal.m11MultimodalPacking(spark, sf)
      .select($"shard", $"seq_id", $"n_tokens", $"seq_text")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    // driver-side expected stream per shard: image prefix from the KNOWN
    // fabrication geometry (w=25, h=len/25), then BPE ids + EOS
    def idsOf(t: String): Vector[Long] = {
      val patches = 4 * ((t.length / 25 + 7) / 8)
      (Multimodal.ImgStartId +: Vector.fill(patches)(Multimodal.ImgPatchId) :+
        Multimodal.ImgEndId) ++
        BpeVocab.tokenIds(org.apache.spark.unsafe.types.UTF8String.fromString(t))
          .toLongArray().toVector :+ BpeVocab.EosId
    }
    val wantByShard = docs.groupBy(_._1 % 8).map { case (s, ds) =>
      s -> ds.sortBy(_._1).toVector.flatMap { case (_, t) => idsOf(t) } }
    rows.groupBy(_._1).foreach { case (shard, seqs) =>
      val got = seqs.sortBy(_._2).toVector.flatMap(_._4.split(" ").map(_.toLong))
      assert(got == wantByShard(shard), s"shard $shard interleaved stream mismatch")
      // every image leg is well-formed: START...patches...END precede the text
      val starts = got.count(_ == Multimodal.ImgStartId)
      val ends = got.count(_ == Multimodal.ImgEndId)
      val nDocs = docs.count(_._1 % 8 == shard)
      assert(starts == nDocs && ends == nDocs, s"shard $shard image-leg count")
    }
  }

  test("m12 audio packing: quantized-energy markers, stream layout, id-range disjointness") {
    import graft.functions.BpeVocab
    // the three modality ranges can never collide
    assert(BpeVocab.EosId < Multimodal.ImgStartId)
    assert(Multimodal.ImgEndId < Multimodal.AudStartId)
    assert(Multimodal.AudLevelBase + 3L ==
      graft.functions.BpeVocab.EosId + 9L)
    val rows = Multimodal.m12AudioPacking(spark, sf)
      .select($"shard", $"seq_id", $"seq_text")
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    // driver-side expected stream: m03 window energies (code−32 squared,
    // 25-sample frames) quantized at 1x/2x/3x-amplitude thresholds,
    // then BPE ids + EOS
    def idsOf(t: String): Vector[Long] = {
      val cps = t.codePoints().toArray
      val levels = (0 until cps.length / 25).toVector.map { w =>
        val e = (w * 25 until w * 25 + 25)
          .map(i => math.min(32767, math.max(-32768, cps(i) - 32)).toLong)
          .map(s => s * s).sum
        if (e <= 120000L) 0L else if (e <= 480000L) 1L
        else if (e <= 1080000L) 2L else 3L
      }
      (Multimodal.AudStartId +: levels.map(Multimodal.AudLevelBase + _) :+
        Multimodal.AudEndId) ++
        BpeVocab.tokenIds(org.apache.spark.unsafe.types.UTF8String.fromString(t))
          .toLongArray().toVector :+ BpeVocab.EosId
    }
    val wantByShard = docs.groupBy(_._1 % 8).map { case (s, ds) =>
      s -> ds.sortBy(_._1).toVector.flatMap { case (_, t) => idsOf(t) } }
    rows.groupBy(_._1).foreach { case (shard, seqs) =>
      val got = seqs.sortBy(_._2).toVector.flatMap(_._3.split(" ").map(_.toLong))
      assert(got == wantByShard(shard), s"shard $shard audio stream mismatch")
    }
  }

  test("audio fabrication iterates CODE POINTS and clamps to the WAV range " +
      "(astral text frames like the DuckDB oracle)") {
    // one astral code point = ONE sample (not two surrogate samples), and
    // high code points clamp to 32767 instead of overflowing 16-bit PCM
    val s = Multimodal.fabricateSamples("a𝄞退") // 'a', U+1D11E, U+9000
    assert(s.toSeq == Seq('a' - 32, 32767, 32767))
    // round-trips the WAV codec exactly at the clamped values
    val rt = graft.formats.Media.Wav.decode(
      graft.formats.Media.Wav.encode(8000, s)).samples
    assert(rt.toSeq == s.toSeq)
  }

  test("m09 ingest read lists ONE root path (dir + pathGlobFilter, never a per-file glob)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val out = Multimodal.m09BinaryIngest(spark, sf)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == nDocs)
    // The listing pin: a `doc-*.bin` glob expands to one ROOT PATH PER
    // FILE and the planner stats every root as its own listing task
    // (measured 9 s vs 0.4 s on 5000 files at sf0.1). The binaryFile
    // scan must carry exactly one root (the directory), with the name
    // filter applied during the single listStatus.
    val binScans = out.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec
        if f.relation.dataSchema.fieldNames.contains("content") => f
    }
    assert(binScans.nonEmpty, "binaryFile scan missing from the m09 plan")
    binScans.foreach { s =>
      assert(s.relation.location.rootPaths.length == 1,
        s"per-file listing roots: ${s.relation.location.rootPaths.length}")
    }
  }

  test("m09 coalesced ingest: pinned pack count, byte-identical payloads, no shuffle") {
    import org.apache.spark.sql.functions.col
    // materialize the loose-object fixture (same dir m09 uses)
    Multimodal.m09BinaryIngest(spark, sf).count()
    val srcDir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_media_ingest_${Integer.toHexString(sf.hashCode)}")
    val nFiles = srcDir.listFiles().count(_.getName.matches("doc-\\d+\\.bin"))
    assert(nFiles > 100, s"fixture too small for a packing test: $nFiles")
    val packDir = java.nio.file.Files.createTempDirectory("graft_packs").toString + "/p"
    val k = 100
    val packs = Multimodal.ingestCoalesced(spark, srcDir.getAbsolutePath, packDir, k)
    // pack-count pin: coalesce produces exactly ceil(n/k) output files
    // (listing partitions exceed ceil(n/k) here, so coalesce can always
    // narrow to it; every coalesced partition is nonempty)
    assert(packs == (nFiles + k - 1) / k,
      s"pack files: $packs, expected ${(nFiles + k - 1) / k} for $nFiles objects at k=$k")
    // byte identity: the packed lake holds exactly the loose objects
    val direct = spark.read.format("binaryFile")
      .option("pathGlobFilter", "doc-*.bin").load(srcDir.getAbsolutePath)
      .select(org.apache.spark.sql.functions
        .regexp_extract(col("path"), "doc-(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("content"))
    val packed = Multimodal.readPacks(spark, packDir)
    assert(packed.count() == nFiles.toLong)
    assert(direct.except(packed).count() == 0 && packed.except(direct).count() == 0,
      "packed payloads are not byte-identical to the loose objects")
    // shape pin: packing is a NARROW plan — payload bytes must never
    // cross an exchange (at crawl scale that shuffle is the whole cost)
    val packPlan = spark.read.format("binaryFile")
      .option("pathGlobFilter", "doc-*.bin").load(srcDir.getAbsolutePath)
      .select(col("path"), col("content")).coalesce(3)
      .queryExecution.executedPlan
    assert(!packPlan.toString.contains("Exchange"),
      "coalesced ingest plan contains a shuffle exchange")
  }

  test("coalesced ingest honors the pack count even when the listing is coarser") {
    import org.apache.spark.sql.functions.col
    // a PRE-COALESCED source: 12 tiny objects bin-pack into far fewer
    // listing partitions than the 12 packs requested at k=1 — coalesce
    // cannot INCREASE partitions, so this regime must fall back to a
    // repartition (the honest cost of splitting a coarse corpus finer)
    // instead of silently writing fewer/larger packs (VERDICT r18 #4)
    val src = graft.TempDirs.create("graft_packs_coarse").toFile
    (0 until 12).foreach { i =>
      java.nio.file.Files.write(new java.io.File(src, s"doc-$i.bin").toPath,
        Array[Byte]('B', 'M', i.toByte))
    }
    val packDir = graft.TempDirs.create("graft_packs_out").toString + "/p"
    val packs = Multimodal.ingestCoalesced(spark, src.getAbsolutePath, packDir, 1)
    assert(packs == 12L, s"expected 12 packs (one per object at k=1), got $packs")
    assert(Multimodal.readPacks(spark, packDir).count() == 12L)
  }

  test("m13 pack marker embeds the fixture's marker: a corpus rebuild invalidates packs") {
    val loose = graft.TempDirs.create("graft_marker_probe").toFile
    val fixtureMarker = new java.io.File(loose, "_GRAFT_FIXTURE")
    java.nio.file.Files.write(fixtureMarker.toPath, "sfA:100:v1".getBytes)
    val m1 = Multimodal.packsMarkerWant(loose)
    // the fixture rebuilds IN PLACE when its corpus changes (same path,
    // new marker content) — the packs marker must change with it, or m13
    // silently serves the stale packed corpus (r18 ADVICE #2)
    java.nio.file.Files.write(fixtureMarker.toPath, "sfA:250:v1".getBytes)
    val m2 = Multimodal.packsMarkerWant(loose)
    assert(m1 != m2, "packs marker ignored the fixture's content")
    assert(m1.contains(loose.getAbsolutePath) && m1.contains("sfA:100:v1"))
    assert(m2.contains("sfA:250:v1"))
  }

  test("m13 fixture prewarm + family eviction: evict releases both dirs, rebuild identical (r20)") {
    // the q23-prewarm discipline applied to the ingest fixture: build
    // outside any timed gate, release at the family boundary (the r20
    // capstone measured the sf100 fixture — ~20 GB — pinned to JVM exit)
    Multimodal.prewarmIngestFixture(spark, sf)
    val loose = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_media_ingest_${Integer.toHexString(sf.hashCode)}")
    val packs = new java.io.File(loose.getParentFile, loose.getName + "_packs")
    assert(loose.exists() && packs.exists(), "prewarm must materialize fixture + packs")
    val r1 = Multimodal.m13PackedIngest(spark, sf)
      .collect().map(_.mkString("|")).sorted
    Multimodal.evictIngestFixtures()
    assert(!loose.exists() && !packs.exists(),
      "eviction must remove the fixture AND packs, markers included")
    // marker discipline: a later consumer rebuilds from scratch and
    // serves byte-identical rows — eviction can never staleness-poison
    val r2 = Multimodal.m13PackedIngest(spark, sf)
      .collect().map(_.mkString("|")).sorted
    assert(r1.sameElements(r2), "post-eviction rebuild diverged")
  }
}

class SketchAndSkewSpec extends SparkSpec {
  import spark.implicits._

  test("misra-gries sketch contains every true heavy hitter") {
    // 1000 'hot' + 100 'warm' + 900 distinct cold words; k=20 guarantees
    // anything with freq > n/k = 100 survives
    val data = Seq.fill(1000)("hot") ++ Seq.fill(300)("warm") ++ (1 to 900).map(i => s"cold$i")
    val ds = spark.createDataset(data)
    val sketch = ds.select(new graft.functions.MisraGries(20).toColumn).head()
    assert(sketch.contains("hot") && sketch.contains("warm"))
    assert(sketch.size <= 20)
  }

  test("x06 heavy hitters returns true top words") {
    val out = TextAnalysis.x06HeavyHitters(spark, sf)
      .as[(String, Long)].collect()
    assert(out.length == 20)
    // exact top-20 from a plain groupBy must be contained in the result
    val exact = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim($"text"), "\\s+")).as("w"))
      .groupBy($"w").count().orderBy($"count".desc, $"w".asc)
      .limit(20).as[(String, Long)].collect()
    assert(out.map(_._1).toSet == exact.map(_._1).toSet)
  }

  test("kmv below saturation is the exact distinct count") {
    val kmv = udaf(new graft.functions.KMinValues(1024),
      org.apache.spark.sql.Encoders.scalaLong)
    // 700 distinct values with heavy repetition, k=1024 → exact
    val df = spark.range(7000).select((col("id") % 700).as("v"))
    val got = df.agg(kmv(xxhash64(col("v")))).head().getLong(0)
    assert(got == 700L)
  }

  test("kmv saturated estimate is within the theoretical error band") {
    val k = 256
    val kmv = udaf(new graft.functions.KMinValues(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val n = 20000L
    val got = spark.range(n).select(xxhash64(col("id")).as("h"))
      .agg(kmv(col("h"))).head().getLong(0)
    // stderr ≈ 1/√(k−2) ≈ 6.3%; 4σ band, deterministic draw
    assert(math.abs(got - n).toDouble / n < 0.25, s"estimate $got vs $n")
  }

  test("kmv estimate is invariant to partitioning (merge is set union)") {
    val kmv = udaf(new graft.functions.KMinValues(128),
      org.apache.spark.sql.Encoders.scalaLong)
    val base = spark.range(5000).select(xxhash64(col("id")).as("h"))
    val a = base.repartition(1).agg(kmv(col("h"))).head().getLong(0)
    val b = base.repartition(13).agg(kmv(col("h"))).head().getLong(0)
    assert(a == b, s"partitioning changed the estimate: $a vs $b")
  }

  test("salted join equals plain join") {
    val left = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val right = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val plain = left.join(right, "l_orderkey")
    val salted = SkewJoins.saltedJoin(left, right, "l_orderkey", 8)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }
}

class CatalogSqlSpec extends SparkSpec {
  test("registerAll exposes the full surface via spark.sql") {
    graft.sources.Catalog.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT p_brand, count(*) AS n,
        |  max(graft_fingerprint(p_name)) AS fp
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand LIMIT 5""".stripMargin).collect()
    assert(r.length == 5 && r.forall(_.getLong(1) > 0))
    val sh = spark.sql(
      """SELECT doc_id,
        |  graft_sorted_overlap(graft_char_shingles(text, 5), graft_char_shingles(text, 5)) AS self,
        |  size(graft_char_shingles(text, 5)) AS n_shingles,
        |  graft_minhash_sig(graft_word_shingles(transform(split(trim(text), '\\s+'),
        |    w -> xxhash64(w)), 3), 16)[0] AS mh0,
        |  graft_rp_bits(CAST(array(1.0, -2.0) AS ARRAY<FLOAT>), 8, 42) AS rp
        |FROM documents LIMIT 5""".stripMargin).collect()
    assert(sh.forall(row => row.getInt(1) == row.getInt(2)), "self-overlap = set size")
  }
}

class RelationalPlanSpec extends SparkSpec {

  test("q02 pushes the date-range predicate to the parquet scan") {
    val plan = Relational.q02FilterPushdown(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      s"expected pushed filters in plan:\n$plan")
  }

  test("q03 broadcasts the dimension side") {
    val plan = Relational.q03JoinFactDim(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("driver smoke: entry() returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q04 star join is all-broadcast: no sort-merge join in the final plan") {
    val df = Relational.q04MultiwayJoin(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"dims must broadcast at this SF — no fact-side shuffle before the agg:\n$plan")
  }

  test("q01 scan prunes to the needed lineitem columns only") {
    val plan = Relational.q01PricingSummary(spark, sf).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_shipdate"),
      s"unused columns must not reach the scan: $readSchema")
  }

  test("q01 stays inside whole-stage codegen") {
    val df = Relational.q01PricingSummary(spark, sf)
    df.collect() // finalize the AQE plan before inspecting it
    // codegen'd spans render as "*(n) Op" in the AQE final plan; partial
    // (map-side) aggregation must be present too
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) HashAggregate") && plan.contains("partial_sum"))
  }

  // AQE plans print "== Final Plan ==" followed by "== Initial Plan ==";
  // operator counting must only see the final section
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q21 pivot scans once with map-side partials; post-scan shuffles carry only aggregated rows") {
    val plan = finalPlan(Relational.q21Pivot(spark, sf))
    assert(plan.contains("partial_sum"), "map-side partial aggregation expected")
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"explicit value list must not add a discovery scan:\n$plan")
    // Spark plans pivot as pair-aggregate -> pivotfirst aggregate -> sort:
    // 3 exchanges, but only the first moves un-aggregated data
    val exchanges = "Exchange (?:hash|range)partitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"unexpected extra shuffle:\n$plan")
  }

  test("q22 cube expands all grouping sets in a single pass") {
    val plan = finalPlan(Relational.q22Cube(spark, sf))
    assert(plan.contains("Expand"), s"cube must use Expand, not multiple scans:\n$plan")
    // exactly one scan of the input feeds the Expand
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"cube must scan the input once:\n$plan")
  }

  test("q23 bucketed join is co-located: no exchange on either join key") {
    val plan = finalPlan(Relational.q23BucketedJoin(spark, sf))
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // bucketed scans align partitioning with the join keys — the only
    // exchanges left are the post-aggregate ones (status agg + sort)
    assert(!plan.contains("hashpartitioning(o_orderkey") &&
      !plan.contains("hashpartitioning(l_orderkey"),
      s"join keys must NOT shuffle — bucketing is supposed to co-locate:\n$plan")
  }

  test("q23 bucketed-write parallelism bounds the per-task sort slice at any scale") {
    import Relational.bucketWriteParts
    // scale regime: a 15 GB side must land ~64 MB slices (the r17 shape
    // that OOM'd a shared JVM when parts was parallelism-only), and parts
    // stays a multiple of nBuckets so each write task sorts ONE bucket
    val big = bucketWriteParts(15L << 30, defaultParallelism = 32, nBuckets = 8)
    assert(big % 8 == 0)
    assert((15L << 30) / big <= (64L << 20), s"slice too big at parts=$big")
    // floor regime: small corpora still use the whole box
    val small = bucketWriteParts(10L << 20, defaultParallelism = 32, nBuckets = 8)
    assert(small % 8 == 0 && small >= 32 * 4)
    // monotone in bytes — growing the corpus never shrinks parallelism
    assert(bucketWriteParts(100L << 30, 32, 8) > big)
    // unknown-stats sentinel regime: sizeInBytes is a BigInt that can
    // exceed Long.MaxValue, and a caller's .toLong wraps NEGATIVE —
    // negative must mean "unknown/huge" (the 16384-task cap), never
    // silently degrade to the parallelism floor (the r17 unbounded-slice
    // behavior the byte-sizing replaced; r18 ADVICE #1)
    val sentinel = bucketWriteParts(Long.MaxValue, 32, 8)
    assert(bucketWriteParts(-1L, 32, 8) == sentinel)
    assert(bucketWriteParts(Long.MinValue, 32, 8) == sentinel)
    assert(sentinel >= 16384, s"sentinel must hit the task cap, got $sentinel")
    // and the call site's own clamp: BigInt above Long.MaxValue → Long.MaxValue
    assert((BigInt(Long.MaxValue) * 4).min(BigInt(Long.MaxValue)).toLong == Long.MaxValue)
  }

  test("s05 filtered ann keeps the corpus map-only below a broadcast join") {
    val df = graft.operators.Similarity.s05AnnFiltered(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probes must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$plan")
  }

  test("q23 bucket-pair eviction frees catalog AND disk; the next call rebuilds") {
    def bktTables: Set[String] = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_bkt_")).toSet
    def bktDirs: Set[String] =
      Option(new java.io.File(System.getProperty("java.io.tmpdir"))
        .listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("graft_bkt")).map(_.getName).toSet
    // start from a clean slate so assertions are absolute, then build +
    // cache the pair (also exactly what the bench prewarm hook runs)
    Relational.evictBucketedPairs(spark)
    val staleDirs = bktDirs // residue of CRASHED earlier JVMs, if any
    Relational.prewarmBucketedPair(spark, sf)
    assert(bktTables.size >= 2, s"expected a cached pair, got $bktTables")
    assert((bktDirs -- staleDirs).nonEmpty, "expected the pair's data dir on disk")
    // family-boundary eviction: a shared scale JVM must release the
    // ~30 GB sf100 pair as soon as the q family finishes, not at exit
    // (the r18 subset run's transient s03 ENOSPC was this co-tenancy)
    Relational.evictBucketedPairs(spark)
    assert(bktTables.isEmpty, s"tables survived eviction: $bktTables")
    assert((bktDirs -- staleDirs).isEmpty, s"data dirs survived eviction")
    // and the gate transparently rebuilds on the next call
    assert(Relational.q23BucketedJoin(spark, sf).count() > 0)
    Relational.evictBucketedPairs(spark) // leave no residue for other specs
  }
}
