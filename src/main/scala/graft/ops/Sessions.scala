package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream table — the classic
  * web-log building block (crawl scheduling, user-trace grouping) the
  * brief's `events` table exists for.
  *
  * Rule: an event joins its predecessor's session iff
  * `ts - prev_ts < gap`; a gap of >= `gapSec` starts a new session.
  * This matches Structured Streaming's `session_window` merge
  * semantics (a session extends to last_ts + gap, next event joins
  * while strictly inside it), so the batch and streaming paths share
  * one definition and one oracle replay (gaps-and-islands).
  *
  * Scale shape: the ONLY window is PARTITION BY the user key — state
  * is bounded by one user's events, never the corpus (the CLAUDE.md
  * corpus-Window ban is about unpartitioned windows). Comparisons are
  * integer microseconds (`unix_micros`), ties broken by the caller's
  * id column so ordering is total and replay-deterministic. A single
  * pathological user with 10^8 events would skew one partition — the
  * standard mitigation (pre-split such keys by day) composes on top
  * and is out of scope here.
  */
object Sessions {

  /** Per-session rollup: (user, session_seq, start_us, end_us,
    * n_events, n_matched) where n_matched counts rows whose
    * `matchCol` is true (e.g. event_type = 'error'). session_seq is
    * the 1-based ordinal of the session within its user. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, gapSec: Long,
                 matchCol: Column): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    // timezone-FREE microsecond arithmetic: the events table carries
    // TIMESTAMP_NTZ, and unix_micros/casts interpret in the session
    // zone — timestamp_diff from the NTZ epoch is pure arithmetic,
    // matching DuckDB's epoch_us(ntz) exactly on any session zone
    val us = timestamp_diff("MICROSECOND",
      to_timestamp_ntz(lit("1970-01-01 00:00:00")), col(tsCol))
    val prevUs = lag(us, 1).over(w)
    val newSess = prevUs.isNull ||
      (us - prevUs >= gapSec * 1000000L)
    val sid = sum(when(newSess, 1L).otherwise(0L))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.select(col(userCol).as("user_id"), us.as("us"),
        matchCol.cast("long").as("m"), sid.as("session_seq"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"), sum(col("m")).as("n_matched"))
  }
}
