package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointOps.checkpointHashPartitioned

/** The partitioning-preserving checkpoint behind the iterative graph
  * operators: the advertised `HashPartitioning` must be BOTH truthful
  * (rows really live in `murmur3(key) pmod n`) and load-bearing (a
  * downstream groupBy/join on the key plans with no extra exchange).
  */
class CheckpointOpsSpec extends SparkSpec {

  test("values round-trip exactly and partition count is pinned") {
    import spark.implicits._
    val df = (0L until 10000L).map(i => (i % 97, i)).toDF("k", "v")
    val cp = checkpointHashPartitioned(df, 16, "k")
    assert(cp.rdd.getNumPartitions == 16)
    val got = cp.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = (0L until 10000L).groupBy(_ % 97).map { case (k, vs) => (k, vs.sum) }
    assert(got == want)
  }

  test("advertised layout is truthful: rows sit in murmur3(key) pmod n") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i, i * 3)).toDF("k", "v")
    val cp = checkpointHashPartitioned(df, 8, "k")
    // recompute each row's expected partition with Spark's own hash
    // expression and compare to where the checkpoint physically put it
    val misplaced = cp
      .withColumn("pid", spark_partition_id())
      .withColumn("want", pmod(hash(col("k")), lit(8)))
      .where("pid != want")
      .count()
    assert(misplaced == 0, s"$misplaced rows not in their advertised partition")
  }

  test("a groupBy on the key plans with ZERO exchanges") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i % 10, i)).toDF("k", "v")
    val p = checkpointHashPartitioned(df, 8, "k")
      .groupBy("k").agg(sum("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"advertised partitioning not honored — groupBy re-shuffled:\n$p")
  }

  test("a co-partitioned self-join on the key plans with ZERO exchanges") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i % 50, i)).toDF("k", "v")
    val cp = checkpointHashPartitioned(df, 8, "k")
    val p = cp.join(cp.selectExpr("k", "v AS v2").hint("shuffle_hash"), "k")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"co-partitioned join re-shuffled:\n$p")
  }

  test("unknown key is rejected") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("k", "v")
    // df.col resolution fails first with Spark's own AnalysisException;
    // the helper's require is the backstop for post-resolution drift
    intercept[org.apache.spark.sql.AnalysisException] {
      checkpointHashPartitioned(df, 4, "nope")
    }
  }
}
