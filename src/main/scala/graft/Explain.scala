package graft

import org.apache.spark.sql.SparkSession

/** Plan-dump main for the optimization-round deliverables: writes
  * `.explain("formatted")` output for the named queries to
  * `$SPARK_GRAFT_EXPLAIN_OUT/<name>.txt` (suffix via
  * `$SPARK_GRAFT_EXPLAIN_SUFFIX`, e.g. `_before`/`_after`). Names come
  * from `$SPARK_GRAFT_EXPLAIN` (comma-separated; `all` = every
  * registered query). Plan construction only — nothing executes, so
  * this is safe to run alongside nothing-in-particular and cheap
  * enough to run for the full registry.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_OUT", "/root/repo/plans/r16")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "")
    val namesEnv = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN", "all")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted: Seq[QueryDef] =
      if (namesEnv.trim == "all") Registry.all
      else {
        val names = namesEnv.split(",").map(_.trim).filter(_.nonEmpty)
        names.toSeq.map(n => Registry.byName.getOrElse(n,
          throw new IllegalArgumentException(s"unknown query: $n")))
      }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    wanted.foreach { d =>
      val path = java.nio.file.Paths.get(outDir, d.name + suffix + ".txt")
      try {
        val df = d.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(path, plan.getBytes("UTF-8"))
        println(s"wrote ${path}")
      } catch {
        case t: Throwable =>
          System.err.println(s"FAILED ${d.name}: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
