package graft

import graft.operators.Knn
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** IVF index at rest: partitioned layout, partition-PRUNED search, and
  * agreement with brute force when the probe covers the right cluster.
  */
class IvfSpec extends SparkSpec {

  private def embeddings() =
    Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def centroids() =
    embeddings().where("vec_id < 8")
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))

  test("index is written partitioned by cluster_id; search prunes partitions") {
    val path = Files.createTempDirectory("graft_ivf").toString + "/index"
    Knn.writeIvfIndex(spark, embeddings(), centroids(), path)

    // on-disk layout: one directory per cluster
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("cluster_id=")) == 8)

    val qVec = embeddings().where("vec_id = 0")
      .collect().head.getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val res = Knn.ivfSearch(spark, path, centroids(), qVec, k = 5, nprobe = 1)

    // the cluster predicate must reach the scan as a PartitionFilter
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
      s"expected partition pruning in:\n$plan")

    val rows = res.collect()
    assert(rows.length == 5)
    // vec_id 0 is its own centroid's best match → similarity 1.0 on top
    assert(rows.head.getAs[Long]("vec_id") == 0L)
    assert(rows.head.getAs[Double]("similarity") == 1.0)
  }

  test("IVF with full probe width equals brute force") {
    val path = Files.createTempDirectory("graft_ivf").toString + "/index"
    Knn.writeIvfIndex(spark, embeddings(), centroids(), path)
    val qVec = embeddings().where("vec_id = 3")
      .collect().head.getAs[scala.collection.Seq[Float]]("embedding").toSeq

    val ivfAll = Knn.ivfSearch(spark, path, centroids(), qVec, k = 5, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSeq

    graft.plans.VectorExprs.register(spark)
    val qLit = qVec.map(v => s"cast($v AS float)").mkString("array(", ", ", ")")
    val brute = embeddings()
      .selectExpr("vec_id", s"round(cosine_f(embedding, $qLit), 6) AS similarity")
      .orderBy(desc("similarity"), col("vec_id"))
      .limit(5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq

    assert(ivfAll == brute)
  }
}
