package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared persist/release discipline for operators that cache
  * intermediates feeding multiple plan consumers.
  */
private[graft] object Caching {

  /** Materialize `result` once (eager localCheckpoint — truncates lineage
    * so downstream consumers scan the computed partitions) and release the
    * cached intermediates that fed it. Without this, MEMORY_AND_DISK
    * blocks from shingle/signature/base tables would accumulate for the
    * session lifetime. The checkpointed result's own blocks are freed by
    * the ContextCleaner when the returned frame is garbage-collected.
    */
  def materializeAndRelease(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    cached.foreach(_.unpersist(false))
    out
  }
}
