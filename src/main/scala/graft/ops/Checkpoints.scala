package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle control for staged intermediates.
  *
  * `localCheckpoint()` materializes a frame into MEMORY_AND_DISK blocks
  * and cuts lineage — but the blocks are only reclaimed when the backing
  * RDD is garbage-collected and the async ContextCleaner gets to it.
  * Under storage pressure (e.g. a benchmark session running 140+ queries
  * back to back) that lag lets superseded iteration states pile up and
  * evict blocks that *are* still live. These helpers make release
  * deterministic: iterative loops free round N−1 the moment round N is
  * materialized, and staged tables are freed on query exit.
  *
  * On a real cluster the same discipline matters more, not less:
  * executor storage memory is shared with shuffle/execution memory, so a
  * leaked stage table steals from exactly the joins it was built to
  * feed.
  */
object Checkpoints {
  /** Free the storage blocks behind a `localCheckpoint()`ed frame NOW,
    * instead of waiting for GC + ContextCleaner. No-op for frames that
    * are not checkpoint-backed. Non-blocking: the removal message is
    * async, but the blocks are immediately eligible. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
    }
}
