package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query (bench=true) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. local[32] with
  * shuffle.partitions=32 (one partition per core — the right size for
  * single-node; on a real cluster this scales with executor count, and
  * AQE coalesces post-shuffle partitions either way).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    // ERROR, not WARN: the driver records the bench tail, and benign
    // per-run warnings (e.g. the documented single-partition window in
    // s5_store_entries) would otherwise drown the JSON line in noise
    spark.sparkContext.setLogLevel("ERROR")
    // noop sink: forces FULL evaluation of every output column —
    // count() would let Catalyst prune projection-only work and
    // under-measure (a fingerprint query's fold never runs under count)
    def exhaust(d: QueryDef, dir: String): Unit =
      d.run(spark, dir).write.mode("overwrite").format("noop").save()
    // optional comma-separated subset filter for local profiling runs;
    // unset (the driver's invocation) benches every registered query
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val benched = Registry.all.filter(_.bench)
      .filter(d => only.forall(_.contains(d.name)))
    // warmup 1 — tiny SF: classload + codegen out of the measured numbers
    benched.foreach { d =>
      try exhaust(d, "/root/testdata/sf0.001")
      catch { case _: Throwable => () }
    }
    // warmup 2 — the TARGET SF, untimed: page cache and JIT reach
    // steady state at the measured scale. Without this, pass 1 ran every
    // query cold, and because the passes used to be CONSECUTIVE
    // per-query, best-of-3 could still record a 4× cold-start artifact
    // (round 3: dd_ngram_jaccard 10.9 s recorded vs 2.5 s steady).
    benched.foreach { d =>
      try exhaust(d, sfDir)
      catch { case _: Throwable => () }
    }
    // three INTERLEAVED timed passes (all queries ×1, then ×2, ×3): a
    // transient memory-pressure episode now inflates one PASS, not all
    // three samples of one query — min-of-3 recovers steady state. A
    // query that fails ALL runs is reported as -1 and listed in
    // "errors", never as a near-zero time that would inflate apparent
    // throughput.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val samples = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    for (_ <- 1 to 3) {
      System.gc() // start each pass from comparable heap pressure
      benched.foreach { d =>
        val t0 = System.nanoTime()
        try {
          exhaust(d, sfDir)
          samples(d.name) = ((System.nanoTime() - t0) / 1e9) :: samples.getOrElse(d.name, Nil)
        } catch {
          case t: Throwable =>
            errors(d.name) = s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(120)}"
        }
      }
    }
    val results = benched.map { d =>
      d.name -> samples.get(d.name).filter(_.nonEmpty).map(_.min).getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\\n\r\t]", " ") + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // Persist the complete line as a repo artifact: the round log keeps
    // only a truncated tail of stdout, which loses the total and early
    // per-query figures. The committed artifact is what
    // tools/bench_diff.py diffs round-over-round.
    try {
      val sfName = new java.io.File(sfDir).getName
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", s"bench/bench_$sfName.json"))
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // the stdout line is the contract; the artifact is best-effort
    spark.stop()
  }
}
