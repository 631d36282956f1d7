package graft

import graft.operators.Dedup

/** Embedding near-dup formulation equivalence: the LSH-banded candidate
  * generator (the registered dd_embed_neardup query) must recall the
  * EXACT pair set the all-pairs-within-label formulation verifies at
  * the production threshold over the same derived twin corpus. The
  * planes, the perturbation direction, and the corpus are all fixed
  * constants, so this equality is deterministic — a parameter change
  * that hurts recall fails here before it fails the driver gate.
  */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("banded near-dup pair set == twin-corpus all-pairs set (sf0.001)") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getAs[Int]("label"), r.getAs[Long]("vec_a"),
          r.getAs[Long]("vec_b"), r.getAs[Double]("cosine")))
        .toSet
    val allPairs = pairs(Dedup.embedTwinAllPairs(spark, sf))
    val banded = pairs(Dedup.embedNearDupBanded(spark, sf))
    assert(allPairs.nonEmpty, "ground truth is empty — threshold or data drifted")
    // every original must pair with its planted twin
    assert(allPairs.size >= 500, s"expected >= 500 twin pairs, got ${allPairs.size}")
    val missed = allPairs -- banded
    assert(missed.isEmpty, s"banding lost ${missed.size} pairs: ${missed.take(5)}")
    val phantom = banded -- allPairs
    assert(phantom.isEmpty, s"banding invented ${phantom.size} pairs: ${phantom.take(5)}")
  }

  test("paragraph dedup: planted boilerplate survives exactly once, in doc 0") {
    val rows = Dedup.queries.find(_.name == "dd_paragraph").get.run(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_paras"),
        r.getAs[Long]("n_kept"), r.getAs[String]("text_kept")))
    assert(rows.length == 500)
    // the shared paragraph is the boiler's first 12 tokens
    val boilerPara = Dedup.ParaBoiler.split(' ').take(12).mkString(" ")
    val holders = rows.filter(_._4.contains(boilerPara))
    assert(holders.map(_._1).toSeq == Seq(0L),
      s"boiler must survive only in doc 0, found in ${holders.map(_._1).take(5)}")
    // every planted doc except doc 0 lost at least its boiler paragraph
    rows.filter(r => r._1 % 5 == 0 && r._1 > 0).foreach { case (id, np, nk, _) =>
      assert(nk < np, s"planted doc $id kept all $np paragraphs")
    }
    // reassembled text never grows
    rows.foreach { case (_, np, nk, _) => assert(nk <= np) }
  }
}
