package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Dev tool: synthesize an sf-N corpus from a driver sf directory by
  * unioning `factor` key-shifted copies, for empirical validation of
  * the PLANS.md linear-scaling arguments (the driver ships no sf1).
  *
  * The point is that each copy must be STATISTICALLY INDEPENDENT of the
  * others — naive duplication would make every dedup/near-dup/posting
  * -list query measure duplication pathology (pair spaces exploding
  * factor², cross-copy near-identical vectors) instead of scale. So:
  *
  *   - relational keys shift by disjoint per-copy offsets, consistently
  *     across fact/dim tables (joins stay intact; the corpus becomes
  *     `factor` independent shards sharing only the tiny nation/region
  *     dimensions — exactly how a bigger TPC-H corpus behaves);
  *   - document text is token-decollided per copy (every word suffixed
  *     `~i`), so shingle/posting statistics per copy match the
  *     original and cross-copy overlap is zero;
  *   - embeddings are dimension-ROTATED per copy (a rigid permutation:
  *     norms and all within-copy cosines preserved exactly; cross-copy
  *     similarity decorrelated) — each copy carries the original's
  *     cluster geometry without creating artificial near-duplicates;
  *   - events shift user_id (independent user populations) with ts
  *     untouched in its on-disk vintage.
  *
  * Usage: `sbt "runMain graft.ScaleUp /root/testdata/sf0.1 target/sf1 10"`
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gen(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until factor).map(i => f(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    def shifted(cols: (String, Long)*)(d: DataFrame, i: Int): DataFrame =
      cols.foldLeft(d) { case (acc, (c, off)) =>
        acc.withColumn(c, expr(s"$c + ${off}L * $i"))
      }

    gen("documents") { (d, i) =>
      if (i == 0) d
      else d.selectExpr(s"doc_id + 10000000L * $i AS doc_id",
        s"concat_ws(' ', transform(split(text, ' '), w -> concat(w, '~', $i))) AS text",
        "lang", s"concat(source, '~', $i) AS source")
        .selectExpr("doc_id", "text", "lang", "source",
          "cast(length(text) AS int) AS n_chars")
    }
    gen("embeddings") { (d, i) =>
      val k = (i * 37) % 384
      if (k == 0) shifted("vec_id" -> 10000000L)(d, i)
      else shifted("vec_id" -> 10000000L)(d, i)
        .withColumn("embedding",
          expr(s"concat(slice(embedding, ${k + 1}, ${384 - k}), slice(embedding, 1, $k))"))
    }
    gen("events")(shifted("event_id" -> 1000000000L, "user_id" -> 1000000L))
    gen("lineitem")(shifted("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
      "l_suppkey" -> 100000L))
    gen("orders")(shifted("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
    // names must decollide like document tokens: copy i keeps the
    // ORIGINAL key-shifted rows but rewrites c_name with a DOUBLED
    // suffix ('~i~i'), so any two copies' names sit at edit distance
    // ≥ 2 (each digit of i appears twice; one-digit-vs-two-digit
    // suffixes differ by ≥ 2 inserts). Without this, cross-copy names
    // are ed-0/ed-1 of each other and every edit-distance miner's TRUE
    // OUTPUT grows quadratically in the copy count (r11 measured
    // dd_record_linkage's link set at exactly factor² × the per-copy
    // links — a fixture artifact, not an operator property).
    gen("customer") { (d, i) =>
      val s = shifted("c_custkey" -> 1000000L)(d, i)
      if (i == 0) s
      else s.withColumn("c_name", expr(s"concat(c_name, '~', $i, '~', $i)"))
    }
    gen("part")(shifted("p_partkey" -> 1000000L))
    gen("supplier")(shifted("s_suppkey" -> 100000L))
    gen("nation")((d, i) => if (i == 0) d else d.limit(0)) // shared dims
    gen("region")((d, i) => if (i == 0) d else d.limit(0))
    spark.stop()
  }
}
