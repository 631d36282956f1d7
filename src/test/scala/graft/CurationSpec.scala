package graft

import graft.operators.Curation

/** Curation building blocks: connected components on known graphs. */
class CurationSpec extends SparkSpec {

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Curation.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, triangle, and isolated pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain needs multiple propagation rounds and still converges") {
    val chain = (0L until 12L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.values.toSet == Set(0L))
    assert(got.size == 13)
  }

  test("edge direction does not matter") {
    assert(components(Seq((5L, 3L), (3L, 9L))) == Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }
}
