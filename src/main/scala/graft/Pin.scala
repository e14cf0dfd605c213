package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for iterative operators (CC label
  * propagation, PageRank, BFS, BPE rounds, MMR rounds, pinned stat frames).
  *
  * Default is `localCheckpoint()`: executor-memory blocks, no I/O — the
  * right latency profile for bench scale, but NOT fault-tolerant (an
  * executor loss kills the blocks and, lineage being truncated, the job).
  * On a real cluster run, set a RELIABLE checkpoint directory first:
  *
  * {{{ spark.sparkContext.setCheckpointDir("hdfs://…/ckpt") }}}
  *
  * and every pin in the engine switches to `checkpoint()` — blocks written
  * to the (replicated) checkpoint store, surviving executor loss. One
  * opt-in, zero per-operator plumbing; results are bit-identical either
  * way (PinSpec asserts this on the iterative operators).
  */
object Pin {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
