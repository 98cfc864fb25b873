package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Release discipline for per-round `localCheckpoint` frames in
  * iterative operators.
  *
  * A local checkpoint materializes the frame as storage-memory RDD
  * blocks that live until the RDD is garbage-collected on the DRIVER —
  * which, on a large heap, can be minutes after the query finished.
  * An iterative loop that checkpoints every round therefore leaves
  * R copies of its round frame pinned in executor storage memory; in
  * unified memory those blocks squeeze execution memory for every
  * LATER stage and query (measured in the r11 10× sweep: the dedup
  * family back-to-back degraded `dedup_survivors` from ~106 s clean
  * to ~238 s, all of it extra spill — the edge-list-sized round frames
  * of the star-contraction loop are the largest offenders).
  *
  * `release` drops the checkpoint blocks of a SUPERSEDED round frame
  * immediately. It must only be called once the successor round is
  * materialized (eager localCheckpoint — the default — guarantees
  * that) and the released frame can never be re-read: a local
  * checkpoint has no lineage to recompute from, so a released frame
  * is unusable by design. */
object Ckpt {
  /** Unpersists the checkpoint RDD backing a localCheckpoint'd frame.
    *
    * Matches ONLY a root-level `LogicalRDD` — the exact shape
    * `localCheckpoint()` returns. A derived view (filter/select over a
    * checkpointed frame), a `createDataFrame(rdd)` whose RDD is cached
    * elsewhere, or any other plan is a no-op: walking the whole tree
    * would unpersist RDDs the caller does not own, and a released
    * local checkpoint has no lineage to recompute from, so a shared
    * frame would become permanently unreadable. Non-blocking: block
    * deletion proceeds async while the next round runs. */
  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => () // not a bare checkpoint frame: deliberately untouched
    }
}
