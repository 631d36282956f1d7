package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the at-rest layout that turns the
  * biggest 100 TB cost (shuffling a fact table for every join) into a
  * zero-shuffle local join: both sides bucketed by the join key with
  * the same bucket count read co-partitioned, so the join plans with
  * no Exchange on either side. Broadcast is disabled throughout so the
  * assertions exercise the shuffle path, not the small-table shortcut.
  */
class BucketingSpec extends SparkSpec {

  private def withNoBroadcast[A](body: => A): A = {
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  private lazy val tables: Unit = {
    import spark.implicits._
    val chunks = (0L until 1000L).map(i => (i, s"chunk text $i")).toDF("doc_id", "text")
    val scores = (0L until 1000L).map(i => (i, i * 0.5)).toDF("doc_id", "score")
    spark.sql("DROP TABLE IF EXISTS b_chunks")
    spark.sql("DROP TABLE IF EXISTS b_scores")
    chunks.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_chunks")
    scores.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_scores")
  }

  test("joining two tables bucketed on the same key plans without any exchange") {
    tables
    withNoBroadcast {
      import spark.implicits._
      val joined = spark.table("b_chunks").join(spark.table("b_scores"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)

      // contrast: the same data unbucketed DOES shuffle both sides
      val chunks = (0L until 1000L).map(i => (i, s"chunk text $i")).toDF("doc_id", "text")
      val scores = (0L until 1000L).map(i => (i, i * 0.5)).toDF("doc_id", "score")
      val plain = chunks.join(scores, "doc_id").queryExecution.executedPlan.toString
      assert(plain.contains("Exchange"))
    }
  }

  test("group-by on the bucket key also skips the exchange") {
    tables
    val agg = spark.table("b_chunks").groupBy("doc_id").agg(count(lit(1)))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
