package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join correctness + distribution: results identical to a plain
  * join, and a pathological hot key spreads across salt buckets.
  */
class SkewSpec extends SparkSpec {

  test("saltedJoin returns exactly the rows of the plain join") {
    import spark.implicits._
    // 90% of rows share one hot key — the classic skew shape
    val large = (0 until 5000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (0L, "zero"), (10L, "ten"), (20L, "twenty"))
      .toDF("k", "label")

    val plain = large.join(small, "k").select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, "k", col("payload"), saltFactor = 8)
      .select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("the hot key's rows actually spread across salt buckets") {
    import spark.implicits._
    val large = (0 until 1000).map(i => (7L, i.toLong)).toDF("k", "payload")
    val buckets = large
      .withColumn("__salt", pmod(col("payload"), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(buckets.length == 8)
    assert(buckets.max < 1000) // no single bucket holds everything
  }
}
