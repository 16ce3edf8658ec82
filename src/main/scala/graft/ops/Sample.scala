package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling / domain mixing — the data-mixture
  * step of a training pipeline: keep each stratum (domain, language,
  * source, quality bucket) at its own configured rate, decided by a
  * pure hash of a stable key so the SAME rows are kept on every run,
  * every retry, and every cluster size. No RNG, no state: the sample
  * is a filter, fully pushdown-friendly, and rerunning a failed
  * partition cannot change the selection (the property that makes
  * checkpoint-resume exact).
  *
  * Keep rule: row survives iff `hashFrac(key) * 2^24 < round(rate *
  * 2^24)` — rate resolution 2^-24. Two key families (the repo
  * convention): xxhash64 in production (cheap, 64-bit); md5 with
  * `oracleHash = true`, where the fraction is the first 6 hex digits
  * parsed as an integer — DuckDB replays it with a '0x' cast, so the
  * whole selection is hash-gated (`q_sample`).
  *
  * Scale shape: a per-row filter after a broadcast-size CASE over the
  * stratum column — no shuffle, no sampling pass, prunes at the scan.
  */
object Sample {
  private val Denom = 1L << 24

  /** The 24-bit hash fraction numerator for a key column. */
  def hashBucket(key: Column, oracleHash: Boolean): Column =
    if (oracleHash) conv(substring(md5(key.cast("binary")), 1, 6), 16, 10).cast("long")
    else pmod(xxhash64(key), lit(Denom))

  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
                 rates: Map[String, Double], defaultRate: Double = 1.0,
                 oracleHash: Boolean = false): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"sampling rate out of [0,1]: $r"))
    def threshold(r: Double): Long = math.round(r * Denom)
    val thr = rates.foldLeft(lit(threshold(defaultRate))) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(threshold(r))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), oracleHash) < thr)
  }

  /** Deterministic train/valid/test assignment — the holdout-split op
    * of a training pipeline. Same hash-fraction machinery as
    * [[stratified]]: the row's 24-bit hash fraction walks the
    * CUMULATIVE integer thresholds (round(f·2^24) per split, the LAST
    * split absorbing the rounding remainder), so the assignment is a
    * pure per-row projection — no shuffle, retry-exact,
    * cluster-size-independent — and DISJOINT-COMPLETE by construction
    * (the cumulative walk covers the whole [0, 2^24) fraction space:
    * every row gets exactly one split, on every run). */
  def split(df: DataFrame, keyCol: String, fractions: Seq[(String, Double)],
            splitCol: String = "split", oracleHash: Boolean = false): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    fractions.foreach { case (n, f) =>
      require(f >= 0.0 && f <= 1.0, s"split fraction out of [0,1]: $n=$f") }
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val b = hashBucket(col(keyCol), oracleHash)
    val cum = fractions.init
      .scanLeft(0L) { case (acc, (_, f)) => acc + math.round(f * Denom) }.tail
    val expr = fractions.init.zip(cum)
      .foldRight(lit(fractions.last._1): Column) {
        case (((name, _), thr), acc) => when(b < lit(thr), lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic global shuffle into training shards — the
    * example-order randomization step of a training pipeline, with the
    * same no-RNG discipline as [[stratified]]: shard and position are
    * pure functions of (key, salt), so every run, retry, and cluster
    * size produces the IDENTICAL order, and a new epoch is just a new
    * salt. shard = hash24 % shards; pos = dense 0-based rank within
    * the shard by (hash24, key) — the key tiebreak makes the order
    * total even on 24-bit hash collisions.
    *
    * Scale shape: one hash shuffle to `shards` groups, then a
    * PER-SHARD window (hash-partitioned — never a corpus window; a
    * global row_number would serialize 10^12 rows through one task).
    * Shard sizes are balanced by the hash (±O(√(n/S))), so the window
    * partitions are uniform by construction. */
  def shuffleShards(df: DataFrame, keyCol: String, shards: Int, salt: String,
                    oracleHash: Boolean = false): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val b = hashBucket(concat(col(keyCol), lit(":"), lit(salt)), oracleHash)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("hb"), col(keyCol))
    df.withColumn("hb", b)
      .withColumn("shard", pmod(col("hb"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("hb")
  }

  /** Resample toward a TARGET mixture — the corpus-rebalance step of a
    * training pipeline ("60% en, 25% de, 15% fr"): derive per-stratum
    * keep rates from observed counts so the largest achievable sample
    * matches the target proportions WITHOUT upsampling, then apply the
    * same deterministic hash-fraction filter as [[stratified]].
    *
    * Rate derivation is pure INTEGER arithmetic (floor division all the
    * way), so a SQL oracle replays it exactly — no float rounding to
    * diverge on:
    *   W     = sum of weights
    *   T     = min over PRESENT target strata of (n_d * W) // w_d
    *           (the feasible total in weight-normalized units; a
    *           target stratum absent from the data is excluded — you
    *           cannot sample what is not there)
    *   thr_d = min(2^24, (T * w_d * 2^24) // (W * n_d))
    * The binding stratum (the min) keeps ~all its rows; others
    * downsample toward the target; strata OUTSIDE the target drop.
    * Thresholds are computed driver-side in BigInt (at 10^12 rows the
    * product T*w*2^24 overflows Long) from a collected count map of at
    * most |weights| rows — the only driver collect, bounded by the
    * target spec itself, never by the data.
    *
    * Scale shape: one map-side-combined count aggregate over the
    * target strata only (filter BEFORE the groupBy — non-target rows
    * never shuffle), then a per-row broadcast-CASE filter: no second
    * shuffle, no sampling pass, retry-deterministic (the property that
    * makes checkpoint-resume exact).
    */
  def toMixture(df: DataFrame, stratumCol: String, keyCol: String,
                weights: Map[String, Long],
                oracleHash: Boolean = false): DataFrame = {
    require(weights.nonEmpty, "mixture weights must be non-empty")
    weights.values.foreach(w => require(w > 0, s"mixture weight must be > 0: $w"))
    val bigW = BigInt(weights.values.sum)
    val targets = weights.keys.toSeq
    val counts: Map[String, Long] = df
      .filter(col(stratumCol).isin(targets: _*))
      .groupBy(col(stratumCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.filter(lit(false))
    val t: BigInt = counts.map { case (d, n) => BigInt(n) * bigW / weights(d) }.min
    val thr: Map[String, Long] = counts.map { case (d, n) =>
      d -> (t * weights(d) * Denom / (bigW * n)).min(BigInt(Denom)).toLong
    }
    val thrCol = thr.foldLeft(lit(0L)) { case (acc, (d, v)) =>
      when(col(stratumCol) === d, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), oracleHash) < thrCol)
  }

  /** Per-key document quota (the per-domain cap of a crawl-curation
    * pipeline: keep at most `k` documents per registrable domain, best
    * first): rank = position by (score desc, id asc) within the key,
    * rows ranked > k drop. Returns (keyCol, idCol, rank), rank 1-based.
    *
    * Deterministic total order: ties break on the id; null/NaN scores
    * sort LAST (the [[Dedup.keepBest]] convention — they lose, never
    * win, but can still fill a slot in an under-quota key). The id must
    * be integral (the [[TopK]] buffer contract — fail loud, round-2
    * ADVICE).
    *
    * Scale shape: [[TopK.perQueryTopK]]'s bounded size-k buffer inside
    * the partial aggregate — only |keys|·k rows cross the wire, never a
    * row_number Window that shuffles every (key, doc) row to rank it.
    * A billion-page domain contributes k rows past the map side. */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
                scoreCol: String, k: Int): DataFrame = {
    require(k >= 1, s"quota must be >= 1: $k")
    val scored = df.select(col(keyCol).as("query_id"),
      col(idCol).as("vec_id"),
      coalesce(nanvl(col(scoreCol).cast("double"), lit(Double.MinValue)),
        lit(Double.MinValue)).as("cosine"))
    TopK.perQueryTopK(scored, k)
      .select(col("query_id").as(keyCol), col("vec_id").as(idCol), col("rank"))
  }

  /** Token-budget-constrained corpus selection — the "fill a 10B-token
    * training budget with the best documents first" step: documents are
    * laid out on ONE token stream in (score desc, id asc) priority
    * order; a document is kept iff its token interval [start, start+n)
    * lies wholly inside [0, budget] (so a zero-token document keeps iff
    * its offset is within budget, and the first document that straddles
    * the boundary drops — as does everything ranked below it whose
    * interval overruns).
    *
    * Scale shape: the priority order is encoded into ONE ascending long
    * key — key = (maxScore − score)·2^40 + id — so the selection rides
    * [[Pack.concatChunk]]'s two-pass prefix sum unchanged (1 range
    * shuffle + a p-row driver collect; never a corpus-wide Window).
    *
    * Totality: null/NaN scores clamp to 0 (they rank last within the
    * score axis — the keepBest "null loses" convention; the NaN leg
    * matters because the session is ANSI and a raw NaN→long cast
    * throws), scores clamp into [0, maxScore] (floor on fractional
    * scores — exact in double below 2^22), null counts clamp to 0
    * (concatChunk's discipline).
    * Preconditions enforced by DROP, mirroring concatChunk's null-id
    * drop: ids outside [0, 2^40) are dropped — map ids into the window
    * first (a 100 TB corpus has < 2^40 documents).
    *
    * Output: (idCol, score, n_tokens, start_offset, kept) — score is
    * the CLAMPED integer priority actually used. */
  def budgetSelect(df: DataFrame, idCol: String, tokensCol: String,
                   scoreCol: String, budget: Long,
                   maxScore: Long = 1000000L): DataFrame = {
    require(budget >= 0, s"token budget must be >= 0: $budget")
    require(maxScore >= 0 && maxScore < (1L << 22),
      s"maxScore must be in [0, 2^22): $maxScore — the (score, id) pair " +
        "packs into one 62-bit key")
    val idW = 1L << 40
    val s = greatest(lit(0.0d),
      least(lit(maxScore).cast("double"),
        coalesce(nanvl(col(scoreCol).cast("double"), lit(0.0d)), lit(0.0d))))
      .cast("long")
    val enc = df
      .filter(col(idCol).isNotNull &&
        col(idCol).cast("long") >= 0L && col(idCol).cast("long") < idW)
      .select(((lit(maxScore) - s) * lit(idW) + col(idCol).cast("long")).as("k"),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("n"))
    Pack.concatChunk(enc, "k", "n", budget = math.max(budget, 1L))
      .select(pmod(col("k"), lit(idW)).as(idCol),
        (lit(maxScore) - expr(s"k div ${idW}")).as("score"),
        col("n_tokens"), col("start_offset"),
        (col("start_offset") + col("n_tokens") <= lit(budget)).as("kept"))
  }
}
