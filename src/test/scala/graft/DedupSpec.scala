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
}
