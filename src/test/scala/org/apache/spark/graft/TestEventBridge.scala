package org.apache.spark.graft

import org.apache.spark.scheduler.SparkListenerBlockUpdated
import org.apache.spark.storage.{BlockManagerId, BlockUpdatedInfo, RDDBlockId, StorageLevel}

/** TEST-ONLY bridge into the `private[spark]` constructors of the
  * storage listener events (same pattern as [[ListenerBridge]]): the
  * EvictionClock pressure/unpersist split is asserted with synthetic
  * block-drop events, because local-mode `removeRdd` posts no
  * BlockUpdated at all — the pressure path can only be driven
  * synthetically in a single-box suite. */
object TestEventBridge {

  /** A block-drop event (invalid storage level) for partition 0 of
    * `rddId` — what the listener bus delivers when a persisted RDD
    * block is evicted or removed. */
  def rddDrop(rddId: Int): SparkListenerBlockUpdated =
    SparkListenerBlockUpdated(BlockUpdatedInfo(
      BlockManagerId("drv", "localhost", 7077),
      RDDBlockId(rddId, 0), StorageLevel.NONE, 0L, 0L))
}
