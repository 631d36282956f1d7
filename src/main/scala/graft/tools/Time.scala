package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time named queries on a given SF dir, optionally print
  * the formatted physical plan. Usage:
  *   runMain graft.tools.Time <sfDir> [--explain] name [name...]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("--explain")
    val names = args.drop(1).filterNot(_ == "--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val d = graft.Registry.byName(name)
      if (explain) d.run(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i => // run twice: warm vs steady
        val t0 = System.nanoTime()
        d.run(spark, sfDir).write.mode("overwrite").format("noop").save() // full evaluation
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"TIMER $name run$i: $dt%.2f s")
      }
    }
    spark.stop()
  }
}
