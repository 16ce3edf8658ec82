package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for web-scale corpora. All shapes are
  * shuffle-planned for 100 TB: one wide shuffle per stage, candidate
  * generation via bucketing (never an O(n²) cross join), map-side
  * partial aggregation everywhere Catalyst can.
  */
object Dedup {

  /** Exact dedup on a normalized text hash. Returns the input plus
    * (text_hash, dup_count, is_canonical): one shuffle on the 128-bit
    * hash, not the full text (hash computed map-side → narrow shuffle
    * keys; canonical = min id per group). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(lower(trim(col(textCol))))
    val w = Window.partitionBy(col("text_hash"))
    df.withColumn("text_hash", h)
      .withColumn("dup_count", count(lit(1)).over(w))
      .withColumn("is_canonical",
        col(idCol) === min(col(idCol)).over(w))
  }

  /** Exact-dedup keep-list: canonical ids only (groupBy, map-side
    * combine; the usual first stage of a pipeline dedup). */
  def exactKeepList(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(lower(trim(col(textCol)))).as("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).cast("long").as("dup_count"))

  /** MinHash + LSH near-dup candidates (MMDS banding): signature →
    * bands → bucket-join. Returns candidate pairs with exact Jaccard
    * verification — the classic shingle→minhash→band→bucket pipeline.
    * Shuffles: one on (band, bucket-hash), one distinct on pairs.
    * k=64, bands=16 → r=4 rows/band: catches J≳0.7 pairs w.h.p. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 64, bands: Int = 16,
                        jaccardThreshold: Double = 0.7): DataFrame = {
    val spark = df.sparkSession
    TextOps.registerAll(spark)
    val rows = k / bands
    val texts = df.select(col(idCol).as("id"), col(textCol).as("text"))
    // candidate generation shuffles ONLY (id, band, bucket) — at corpus
    // scale the banding explode must not replicate document text ×bands
    // through the wire; text rejoins per VERIFIED candidate id below
    val banded = texts
      .withColumn("sig", expr(s"graft_minhash(text, $k)"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rows + 1, lit(rows)), b))).as(Seq("band", "bucket")))
    val pairs = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    pairs
      .join(texts.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(texts.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("jaccard", expr("graft_jaccard(text_a, text_b)"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup: 64-bit signature, banded into 4×16-bit keys
    * (any pair within hamming distance ≤ 3 of each other shares at
    * least one exact 16-bit band — pigeonhole); verify by hamming. */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val spark = df.sparkSession
    TextOps.registerAll(spark)
    spark.udf.register("graft_hamming64",
      (a: Long, b: Long) => TextOps.hamming64(a, b))
    val sig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", expr("graft_simhash64(text)"))
    val banded = sig.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "key")))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sim").as("sim_a"), col("r.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming", expr("graft_hamming64(sim_a, sim_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** n-gram Jaccard near-dup with cheap blocking: docs sharing the same
    * min token-hash become candidates (single shuffle), then exact
    * Jaccard filters. Blocks larger than `maxBlockSize` are dropped from
    * candidate generation (skew guard: a non-selective block over a
    * self-similar corpus would otherwise go O(block²) — the dropped
    * count is observable via the block stats, not silent). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.5,
                        maxBlockSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    TextOps.registerAll(spark)
    val texts = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val keyed = texts.withColumn("block",
        expr("aggregate(transform(slice(split(lower(text), '\\\\s+'), 1, 64), " +
          "t -> hash(t)), 2147483647, (acc, x) -> least(acc, x))"))
      .select("id", "block")
    val blockSizes = keyed.groupBy("block")
      .agg(count(lit(1)).as("block_n"))
      .filter(col("block_n") <= maxBlockSize)
    val selective = keyed.join(blockSizes.select("block"), "block")
    // self-join on (id, block) only; text rejoins per candidate pair
    selective.as("l").join(selective.as("r"),
        col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .join(texts.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(texts.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("jaccard", expr("graft_jaccard(text_a, text_b)"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Connected components over near-dup pairs → cluster ids, via
    * iterative min-label propagation (the standard large-graph
    * alternative to driver-side union-find: each iteration is one
    * shuffle; converges in O(diameter) rounds, and near-dup clusters
    * are shallow). Returns (id, cluster) where cluster = min id in the
    * component. Ids not in any pair map to themselves. */
  def clusters(ids: DataFrame, idCol: String, pairs: DataFrame,
               maxIterations: Int = 10): DataFrame = {
    val spark = ids.sparkSession
    // undirected edge list, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    var labels = ids.select(col(idCol).as("id"), col(idCol).as("cluster"))
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // each node adopts the min cluster label among itself + neighbors
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("cluster")).as("nmin"))
      val updated = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
      val changed = updated.as("u").join(labels.as("l"), "id")
        .filter(col("u.cluster") =!= col("l.cluster")).limit(1).count() > 0
      labels = updated.localCheckpoint(true) // truncate lineage each round
      converged = !changed
      i += 1
    }
    labels
  }

  /** Embedding near-dup: cosine ≥ threshold among LSH-bucketed vectors
    * (random hyperplane signatures — seeded, deterministic). */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       planes: Int = 16, threshold: Double = 0.95): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", Similarity.hyperplaneSignature(col("vec"), planes))
    keyed.as("l").join(keyed.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        Similarity.cosine(col("l.vec"), col("r.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
