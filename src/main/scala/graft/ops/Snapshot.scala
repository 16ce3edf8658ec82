package graft.ops

import org.apache.spark.sql.DataFrame

/** One materialization for multi-consumer frames. AQE exchange reuse
  * needs canonically identical subtrees, and column pruning routinely
  * breaks that for a frame feeding both an aggregate and a join (each
  * consumer prunes the shared exchange differently — measured 2× scan
  * re-execution in the decontaminate/terms shapes and 6× in
  * duplicatedNgramSpans, via the ngramsEvals counter). Checkpointing
  * the COMPACT post-keygen frame (ids + hashes, a few dozen bytes per
  * row — never the text it was derived from) trades one small
  * write+read for never re-running the text-derived generation, the
  * right 100 TB trade. Reliable checkpoint when a dir is configured
  * (survives executor loss), localCheckpoint otherwise — the
  * Dedup.exact convention. */
object Snapshot {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)
}
