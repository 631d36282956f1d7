package graft

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** Spark ML interop for the ANN surface (SURVEY §2.4 V2 notes
  * BucketedRandomProjectionLSH / trained centroids as the ML-native
  * scale paths): the engine's own IVF machinery composes with MLlib
  * models, and MLlib's LSH join agrees with the exact pair set.
  */
class MlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def normalized() = {
    graft.plans.VectorExprs.register(spark)
    Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label",
        """CASE WHEN sqrt(aggregate(transform(embedding, x -> cast(x AS double) * cast(x AS double)), 0D, (a, v) -> a + v)) = 0D
                THEN transform(embedding, x -> cast(x AS double))
                ELSE transform(embedding, x -> cast(x AS double)
                       / sqrt(aggregate(transform(embedding, y -> cast(y AS double) * cast(y AS double)), 0D, (a, v) -> a + v)))
           END AS emb_n""")
      .withColumn("features", array_to_vector(col("emb_n")))
  }

  test("BucketedRandomProjectionLSH join covers the exact near-dup pair set") {
    val df = normalized().cache()
    // exact pairs: cosine >= 0.35 on unit vectors ⟺ ||a-b|| <= sqrt(2 - 2*0.35)
    val distThreshold = math.sqrt(2.0 - 2.0 * 0.35)
    val exact = df.alias("a").join(df.alias("b"),
        expr("a.vec_id < b.vec_id AND dot_f(a.emb_n, b.emb_n) >= 0.35"))
      .selectExpr("a.vec_id AS va", "b.vec_id AS vb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus should contain near-dup pairs")

    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(8).setSeed(42)
    val model = lsh.fit(df)
    val approx = model.approxSimilarityJoin(df, df, distThreshold, "dist")
      .selectExpr("datasetA.vec_id AS va", "datasetB.vec_id AS vb")
      .where("va < vb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every LSH pair within the radius is exact-verified by construction
    assert(approx.subsetOf(exact), "LSH emitted a pair outside the distance radius")
    // recall: with 8 hash tables at this bucket length the planted
    // near-dups should essentially all surface
    assert(approx.size >= (exact.size * 0.8).toInt,
      s"LSH recall too low: ${approx.size}/${exact.size}")
    df.unpersist()
  }

  test("KMeans-trained centroids drive the IVF index; full probe equals brute force") {
    import spark.implicits._
    val df = normalized().cache()
    val k = 8
    val kmeans = new KMeans().setK(k).setSeed(1L).setFeaturesCol("features")
    val model = kmeans.fit(df)
    val cent = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.toArray.map(_.toFloat).toSeq)
    }.toSeq.toDF("cent_id", "cent_emb")

    val dir = java.nio.file.Files.createTempDirectory("graft_ml_ivf").toString
    val embeddings = Tables.embeddings(spark, sf)
    graft.operators.Knn.writeIvfIndex(spark, embeddings, cent, dir)

    val q = embeddings.where("vec_id = 0")
      .selectExpr("embedding").collect().head
      .getAs[scala.collection.Seq[Float]](0).toSeq
    val full = graft.operators.Knn.ivfSearch(spark, dir, cent, q, k = 5, nprobe = k)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    graft.plans.VectorExprs.register(spark)
    val qLit = q.map(v => s"cast($v AS float)").mkString("array(", ", ", ")")
    val brute = embeddings
      .selectExpr("vec_id", s"round(cosine_f(embedding, $qLit), 6) AS sim")
      .orderBy(desc("sim"), col("vec_id"))
      .limit(5).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full == brute, "nprobe = K must equal brute force")
    df.unpersist()
  }

  test("ml_train_linear: the perceptron learns the planted boilerplate to zero error") {
    val rows = Registry.byName("ml_train_linear").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // epoch 1 evaluates the zero model — everything misclassifies
    assert(rows.head._2 > 0 && rows.head._3 == 0L)
    // training error is non-increasing and the planted signal is
    // perfectly separable — the final model must reach zero error
    assert(rows.map(_._2).sliding(2).forall(w => w(1) <= w(0)))
    assert(rows.last._2 == 0L && rows.last._3 == 1000000L)
  }

  test("ml_score_docs: per-doc verdicts agree with the trace's final error count") {
    val verdicts = Registry.byName("ml_score_docs").run(spark, sf).collect()
    val nWrong = verdicts.count(_.getLong(4) == 0L)
    val traceFinal = Registry.byName("ml_train_linear").run(spark, sf)
      .where("epoch = 4").collect().head.getLong(1)
    assert(nWrong.toLong == traceFinal)
    // the gate actually separates: planted docs predict +1, clean −1
    assert(verdicts.forall(r => r.getLong(3) == (if (r.getLong(0) % 7 == 0) 1L else -1L)))
  }

  test("ml_train_linear plan: the weight table broadcasts — the corpus side never sorts") {
    val p = Registry.byName("ml_train_linear").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(!p.toLowerCase.contains("cartesianproduct"))
  }
}
