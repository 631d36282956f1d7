package graft

import graft.operators.Events

/** Misra-Gries heavy hitters (`ev_heavyhitters` core): the sketch is an
  * approximation, but the confirm pass must make the OUTPUT exact — so
  * every case here checks bit-equality against a plain exact groupBy,
  * under inputs chosen to stress the sketch itself (cardinality ≫ k,
  * boundary counts, adversarial partition layouts).
  */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def exact(items: Seq[Long], k: Int): Set[(Long, Long, Long)] = {
    val n = items.size.toLong
    items.groupBy(identity).view
      .mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }
      .map { case (i, c) => (i, c, c * 1000000L / n) }
      .toSet
  }

  private def run(items: Seq[Long], k: Int, parts: Int): Set[(Long, Long, Long)] =
    Events.heavyHitters(items.toDS().repartition(parts), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("cardinality ≫ k: planted hot keys found exactly, tail rejected") {
    // 8000 distinct tail keys seen once + 3 hot keys at 600 each;
    // k=50 counters per partition, so the sketch holds 0.6% of the
    // key space — the guarantee, not capacity, must carry the result
    val items = (0L until 8000L) ++
      Seq.fill(600)(9000001L) ++ Seq.fill(600)(9000002L) ++ Seq.fill(600)(9000003L)
    val got = run(items, k = 50, parts = 7)
    assert(got == exact(items, 50))
    assert(got.map(_._1) == Set(9000001L, 9000002L, 9000003L))
  }

  test("boundary: cnt·k == N is NOT a heavy hitter (strict >)") {
    // key 1 has exactly N/k occurrences (10 of 100, k=10) — the MG
    // guarantee only covers strictly-greater, and the filter agrees
    val items = Seq.fill(10)(1L) ++ (100L until 190L).flatMap(Seq(_)) // N=100
    assert(items.size == 100)
    val got = run(items, k = 10, parts = 4)
    assert(got == exact(items, 10))
    assert(!got.map(_._1).contains(1L))
  }

  test("adversarial layout: result is partitioning-independent") {
    val rng = new scala.util.Random(42)
    val items = Seq.fill(5000)(rng.nextInt(40).toLong) ++ (10000L until 12000L)
    val expected = exact(items, 100)
    for (parts <- Seq(1, 3, 16)) {
      assert(run(items, 100, parts) == expected, s"parts=$parts")
    }
    // hot keys concentrated in one partition vs spread: same answer
    assert(run(items.sorted, 100, 5) == expected)
  }

  test("ev_heavyhitters: the planted 14-key skew is the full answer at sf0.001") {
    val rows = Registry.byName("ev_heavyhitters").run(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getLong(0)).toSet ==
      ((0L to 6L) ++ (10L to 16L)).toSet)
    // each hot key carries ~5% of traffic — far above the 1/500 line
    assert(rows.forall(_.getLong(2) > 2000L))
  }

  test("st_heavyhitters: the drained stream equals the batch operator") {
    def rows(name: String) =
      Registry.byName(name).run(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows("st_heavyhitters") == rows("ev_heavyhitters"))
  }

  test("plan: confirm pass joins through a broadcast of the candidate set") {
    val p = Registry.byName("ev_heavyhitters").run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(!p.toLowerCase.contains("sortmergejoin"))
  }
}
