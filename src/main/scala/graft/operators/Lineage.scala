package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit storage reclamation for superseded `localCheckpoint(true)`
  * relations.
  *
  * Iterative operators (PageRank, label propagation, CC, k-core) cut
  * lineage once per round with an EAGER local checkpoint; round i's
  * relation is dead the moment round i+1 has materialized, but its
  * blocks sit in the block manager until the DataFrame is GC'd AND the
  * ContextCleaner's weak-reference queue drains — in `local[*]` mode
  * those blocks are DRIVER heap. A long drive (300-query bench at sf1 =
  * ~970 executions, dozens of them iterative) accumulated gigabytes of
  * dead checkpoint blocks this way and needed a 24 g driver; freeing
  * each round's predecessor bounds the live set to one generation.
  *
  * Only call this on a relation that (a) this operator created and
  * checkpointed itself and (b) no later plan reads — a freed checkpoint
  * throws "block not found" on any subsequent action. Non-checkpoint
  * plans (anything whose analyzed root is not the checkpoint's
  * LogicalRDD) are left untouched, so passing the pre-loop initial
  * relation is safe. */
object Lineage {

  /** Drop the persisted blocks behind `df` if (and only if) it is the
    * direct result of a `localCheckpoint` / `checkpoint` call. */
  def free(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false)
    case _             => ()
  }
}
