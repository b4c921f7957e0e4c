package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Bridges `private[spark]` core internals needed by diagnostics tooling
  * (same pattern as [[org.apache.spark.sql.graftshim.SqlShim]] on the SQL
  * side): block-manager storage-memory usage, read by the endurance probe
  * to publish per-wave high-water curves for the crawl engine's
  * checkpoint/cache release machinery.
  */
object CoreShim {

  /** (storageUsedBytes, storageMaxBytes) summed over every block manager —
    * on local[n] that is the one driver block manager; on a cluster, all
    * executors. `used` counts cached RDD/broadcast/localCheckpoint blocks,
    * exactly the pools the crawl release queues are supposed to bound.
    */
  def storageMemory(sc: SparkContext): (Long, Long) = {
    val st = sc.env.blockManager.master.getMemoryStatus
    val used = st.values.iterator.map { case (max, remaining) => max - remaining }.sum
    val max = st.values.iterator.map(_._1).sum
    (used, max)
  }

  /** Resident block census by kind -> (count, memBytes): names WHAT is
    * occupying the storage pool (rdd = cache/localCheckpoint blocks the
    * release queues manage; broadcast = torrent pieces awaiting
    * ContextCleaner). Diagnostic companion to [[storageMemory]] — when a
    * high-water curve grows, this says which population is growing.
    */
  def blockSummary(sc: SparkContext): Map[String, (Int, Long)] = {
    val master = sc.env.blockManager.master
    master.getStorageStatus.iterator
      .flatMap(_.blocks.iterator)
      .toSeq
      .groupBy { case (id, _) =>
        if (id.isBroadcast) "broadcast" else if (id.isRDD) "rdd" else "other"
      }
      .map { case (k, v) => k -> (v.size, v.map(_._2.memSize).sum) }
  }
}
