package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only access to `private[spark]` context state. Lives in the
  * test tree under `org.apache.spark` so CheckpointOpsSpec can make
  * its no-checkpoint-dir assertion deterministic: `setCheckpointDir`
  * has no public unset, so without this the test's precondition
  * depended on suite execution order.
  */
object TestSparkInternals {
  def clearCheckpointDir(sc: SparkContext): Unit =
    sc.checkpointDir = None
}
