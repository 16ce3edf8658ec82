package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches — the corpus-statistics
  * primitives a 100 TB profiling pass runs where exact answers would
  * shuffle the whole corpus: "how many distinct tokens per source"
  * (HyperLogLog registers) and "roughly how often does each token
  * occur" (count-min). Both are built from the deterministic md5 hash
  * family (the [[Sample.hashBucket]] oracle convention), so a DuckDB
  * oracle replays every register and counter bit-for-bit — the sketch
  * CONTENT is exact and testable even though the estimate it supports
  * is approximate.
  *
  * Scale shape: both sketches are map-side-combinable aggregates with
  * HARD output bounds — HLL: ≤256 register rows per group; CMS: d·w
  * counter rows total — so a trillion-token corpus puts 256 rows per
  * group (or d·w rows) on the wire after partial aggregation, never a
  * per-key row. Merging shards = elementwise max (HLL) / sum (CMS),
  * which is exactly what the second-level aggregate already does
  * (ScaleGuardSpec pins shard-merge = whole-corpus equality).
  *
  * Integer discipline: registers are small ints, the harmonic sum is
  * carried as the EXACT integer S = Σ 2^(49−M_j) (M_j ≤ 49 ⇒ S ≤
  * 256·2^49 < 2^58 — no float, no HUGEINT; the float HLL estimate
  * α·m²·2^49/S is a documented driver-side derivation, never a query
  * output). Null keys DROP on both engines (COUNT(DISTINCT) semantics);
  * null groups are the caller's coalesce-at-first-use.
  */
object Sketch {

  /** HLL precision: 8-bit bucket index (first 2 md5 hex digits) →
    * 256 registers; rank source is the next 48 bits (12 hex digits). */
  val HllBuckets = 256
  private val HllRhoMax = 49L // w = 0 over 48 bits ⇒ rho = 48 + 1

  /** Per-group HLL registers: (grpCol, bucket, register) with
    * register = max over keys in the bucket of rho(key) — rho = 1 +
    * leading zeros of the 48-bit rank word, computed as
    * 49 − length(bin(w)) (Spark `bin` and DuckDB `bin` both render
    * the minimal binary string, so the oracle replays it verbatim;
    * w = 0 is the explicit 49 branch — bin(0) = "0" has length 1,
    * not 0). Absent buckets mean "no key hashed there" (register 0);
    * [[hllSummary]] accounts for them arithmetically. */
  def hllRegisters(df: DataFrame, grpCol: String, keyCol: String): DataFrame = {
    val h = md5(col(keyCol).cast("binary"))
    val w = conv(substring(h, 3, 12), 16, 10).cast("long")
    df.filter(col(keyCol).isNotNull)
      .select(col(grpCol),
        conv(substring(h, 1, 2), 16, 10).cast("long").as("bucket"),
        when(w === 0L, lit(HllRhoMax))
          .otherwise(lit(HllRhoMax) - length(bin(w)).cast("long")).as("rho"))
      .groupBy(col(grpCol), col("bucket"))
      .agg(max("rho").as("register"))
  }

  /** Per-group register summary: (grpCol, v_used, max_rho, s_harmonic)
    * — v_used = occupied registers, s_harmonic = Σ_j 2^(49−M_j) over
    * ALL 256 registers (empty ⇒ M_j = 0 ⇒ 2^49), the exact-integer
    * carrier of the HLL harmonic mean. The float estimate is
    * α₂₅₆ · 256² · 2^49 / s_harmonic with α₂₅₆ = 0.7213/(1+1.079/256)
    * — derive it driver-side; it never enters a hash-gated output. */
  def hllSummary(df: DataFrame, grpCol: String, keyCol: String): DataFrame =
    hllRegisters(df, grpCol, keyCol)
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("v_used"),
        max("register").as("max_rho"),
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${HllRhoMax} - register AS INT))"))
          + (lit(HllBuckets.toLong) - count(lit(1))) * lit(1L << HllRhoMax))
          .as("s_harmonic"))

  /** The CMS hash family: row i's bucket for a key is the first 8 md5
    * hex digits of "i:" ++ key, mod width — 32 uniform bits, exactly
    * replayable as CAST('0x' || substr(md5(...), 1, 8) AS BIGINT) %
    * width in DuckDB. */
  private def cmsBucket(i: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$i:"), key).cast("binary")), 1, 8),
      16, 10).cast("long"), lit(width.toLong))

  /** Count-min counter table over key OCCURRENCES: (row, bucket, cnt)
    * — counter[i][j] = Σ counts of keys with h_i(key) = j. Built as a
    * per-key count first (map-side combine on the key), then d rows
    * per DISTINCT key into the d·width-bounded second aggregate —
    * the explode factor pays on distinct keys, never occurrences. */
  def cmsCounters(df: DataFrame, keyCol: String,
                  depth: Int = 3, width: Int = 256): DataFrame =
    cmsCountersFromCounts(
      df.filter(col(keyCol).isNotNull)
        .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt")),
      keyCol, "cnt", depth, width)

  /** Counter table from an ALREADY-AGGREGATED (key, count) frame — the
    * Snapshot-friendly entry when a query shares the per-key counts
    * with other consumers (the compact-key-frame rule). */
  def cmsCountersFromCounts(counts: DataFrame, keyCol: String, cntCol: String,
                            depth: Int = 3, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 8, s"cms depth out of [1,8]: $depth")
    require(width >= 2, s"cms width must be >= 2: $width")
    counts.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"), cmsBucket(i, col(keyCol), width).as("bucket"),
          coalesce(col(cntCol).cast("long"), lit(0L)).as("cnt"))): _*)).as("e"))
      .groupBy(col("e.row").as("row"), col("e.bucket").as("bucket"))
      .agg(sum("e.cnt").as("cnt"))
  }

  /** Point estimates from a counter table: for each probe key, est =
    * min over rows of its counter (absent counter cell = 0 — a left
    * join, so a key the corpus never hashed near estimates 0). The
    * counter table is d·width rows — Spark broadcasts it under the
    * join threshold, so probing is shuffle-free at any probe count.
    * Guarantee carried to the caller: est ≥ true count, always. */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int = 3, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 8, s"cms depth out of [1,8]: $depth")
    require(width >= 2, s"cms width must be >= 2: $width")
    probes.filter(col(keyCol).isNotNull)
      .select(col(keyCol),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("row"),
            cmsBucket(i, col(keyCol), width).as("bucket"))): _*)).as("e"))
      .join(broadcast(counters),
        col("e.row") === counters("row") && col("e.bucket") === counters("bucket"),
        "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(counters("cnt"), lit(0L))).as("est"))
  }
}
