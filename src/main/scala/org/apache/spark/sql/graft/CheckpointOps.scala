package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Checkpointing that KEEPS the partitioning contract.
  *
  * `Dataset.localCheckpoint` is the lineage fence every iterative
  * operator here leans on, but under AQE it silently drops
  * `outputPartitioning`: the checkpointed plan is an
  * `AdaptiveSparkPlanExec` whose partitioning is unknown until
  * execution, so the `LogicalRDD` the checkpoint wraps reports
  * `UnknownPartitioning` — and every downstream round re-exchanges the
  * "once-partitioned" table. Profiled on gr_pagerank_conv (sf0.1):
  * the ~90 rounds re-shuffled the 1.2M-row edge table every round
  * (102 MB scanned + 13 MB shuffle-written per round, 338 s summed
  * task time for a 67 s wall) even though the table was repartitioned
  * on the join key ONCE, by design, before the checkpoint.
  *
  * [[checkpointHashPartitioned]] restores the design: repartition by
  * the keys with an EXPLICIT partition count (REPARTITION_BY_NUM —
  * AQE never coalesces a user-numbered exchange, so the physical
  * layout is exactly `murmur3(keys) pmod n`), materialize the rows
  * into local checkpoint blocks, and rebuild the `LogicalRDD` with a
  * truthful `HashPartitioning(keys, n)`. Downstream joins and
  * aggregations keyed on the same columns then satisfy their
  * distribution requirement from the checkpoint — the big side stays
  * stationary across every round and only the O(V) state table moves,
  * which is the whole scale story of the Pregel-style operators.
  *
  * This lives under `org.apache.spark.sql` (the extension-library
  * convention) because `Dataset.ofRows` and `LogicalRDD` are
  * `private[sql]`. Public Spark API only; no behavior is patched.
  */
object CheckpointOps {

  /** Hash-partition `df` by `keys` into `numParts` partitions,
    * eagerly localCheckpoint the result, and return a DataFrame whose
    * plan ADVERTISES that partitioning (what `localCheckpoint(true)`
    * would do if AQE did not erase it). Rows are copied before
    * caching (UnsafeRow buffers are reused per-task) — the same
    * discipline as `Dataset.checkpoint`.
    */
  def checkpointHashPartitioned(df: DataFrame, numParts: Int,
                                keys: String*): DataFrame = {
    require(keys.nonEmpty, "need at least one partitioning key")
    val parted = df.repartition(numParts, keys.map(df.col): _*)
    val spark = parted.sparkSession.asInstanceOf[SparkSession]
    val qe = parted.queryExecution
    val rdd: RDD[InternalRow] = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // materialize NOW so every consumer reuses the blocks
    val output = qe.analyzed.output
    val keyAttrs = keys.map { k =>
      output.find(_.name == k).getOrElse(
        throw new IllegalArgumentException(
          s"partition key '$k' not in ${output.map(_.name).mkString(", ")}"))
    }
    Dataset.ofRows(spark,
      LogicalRDD(output, rdd, HashPartitioning(keyAttrs, numParts))(spark))
  }

  /** Unpersist the checkpoint blocks behind a DataFrame produced by
    * [[checkpointHashPartitioned]] or `localCheckpoint` — for the
    * INTERMEDIATE tables of an iterative operator (superseded fences,
    * the edge layout once the result is materialized). Without this,
    * every invocation leaks its checkpoint blocks into the block
    * manager for the session's lifetime: repeated bench passes over
    * the graph lane accumulated gigabytes of dead fence/edge blocks,
    * and the eviction + GC pressure inflated UNRELATED queries'
    * timings by ~20 %. No-op for other plans.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }
}
