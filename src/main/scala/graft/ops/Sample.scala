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
}
