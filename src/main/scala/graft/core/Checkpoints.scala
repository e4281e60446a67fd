package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for iterative / streaming folds built on eager
  * `localCheckpoint()`.
  *
  * A localCheckpoint materializes the Dataset into persisted RDD blocks
  * and rewires the plan to a [[LogicalRDD]] over them. `Dataset.unpersist`
  * does NOT free those blocks (it only talks to the CacheManager, which
  * never saw them), so a long-lived loop that re-checkpoints every round —
  * cluster propagation, a streaming signature index — retains one
  * generation of blocks per round unless the superseded RDD is unpersisted
  * explicitly. This helper reaches the checkpointed RDD through the public
  * LogicalRDD node and drops its blocks, bounding retention to the
  * generations the caller still holds.
  */
object Checkpoints {

  /** Unpersist the checkpointed RDD blocks behind an eagerly
    * localCheckpoint'd frame. No-op for frames that are not a direct
    * checkpoint product (the lookup is exact, not recursive: freeing
    * blocks under an arbitrary derived plan would be unsound).
    * Non-blocking: block removal proceeds asynchronously.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }
}
