package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Candidate-count guards for every bucketed dedup generator.
  *
  * The driver's recall oracles prove a candidate generator found every
  * true pair — they CANNOT see pruning silently break (r4 shipped a
  * 16-band × 2-bit embedding banding whose bucket join admitted ~99% of
  * random pairs: the oracle stayed green while the "LSH" regenerated
  * the whole pair space with extra steps). These specs pin the other
  * half of the contract: candidates ≪ the all-pairs space the banding
  * exists to avoid.
  */
class PruningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def pairsOf(n: Long): Long = n * (n - 1) / 2

  test("minhash LSH: candidates ≪ all pairs, and contain the verified set") {
    val nDocs = Tables.documents(spark, sf).count()
    val cand = Dedup.minhashCandidates(spark, sf).count()
    val verified = Dedup.minhashPairs(spark, sf).count()
    assert(verified > 0, "no verified near-dups — corpus drifted")
    assert(verified <= cand, "verified pairs must come from the candidate set")
    assert(cand * 10 <= pairsOf(nDocs),
      s"minhash banding admits $cand of ${pairsOf(nDocs)} pairs — pruning broke")
  }

  test("simhash bands: candidates ≪ all pairs") {
    val nDocs = Tables.documents(spark, sf).count()
    val cand = Dedup.simhashCandidates(spark, sf).count()
    assert(cand > 0, "no simhash candidates — corpus drifted")
    assert(cand * 10 <= pairsOf(nDocs),
      s"simhash banding admits $cand of ${pairsOf(nDocs)} pairs — pruning broke")
  }

  test("embed banding: production 4×8 bands prune; the r4 16×2 grouping did not") {
    val corpus = Dedup.embedTwinCorpus(spark, sf).cache()
    val withinLabelPairs = corpus.groupBy("label").count().collect()
      .map(r => pairsOf(r.getLong(1))).sum
    val good = Dedup.embedBandCandidates(corpus, bands = 4, bits = 8).count()
    // the exact grouping dd_embed_neardup shipped with in r4, over the
    // same 32 planes: per-band collision for orthogonal vectors is
    // (1/2)² and 1 − (3/4)¹⁶ ≈ 0.99 — it must NOT be reintroduced
    val degenerate = Dedup.embedBandCandidates(corpus, bands = 16, bits = 2).count()
    assert(good * 5 <= withinLabelPairs,
      s"4×8 banding admits $good of $withinLabelPairs pairs — pruning broke")
    assert(degenerate * 2 > withinLabelPairs,
      s"16×2 banding unexpectedly pruned ($degenerate of $withinLabelPairs) — " +
        "if the corpus changed, re-derive the production parameters")
    corpus.unpersist()
  }

  test("simpairs triangle blocking: exact equality with all-pairs, tasks bounded") {
    // a cap small enough to force multi-cell blocking on the fixture
    val cap = 16
    val blocked = Dedup.embedSimPairsBlocked(spark, sf, cap)
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    val exact = Dedup.embedNearDupAllPairs(spark, sf)
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(exact.nonEmpty, "no similarity pairs — corpus drifted")
    // blocking is a work-spreading layout, NOT pruning: result identical
    assert(blocked == exact,
      s"blocked mining lost/invented pairs: ${(blocked diff exact).size} extra, " +
        s"${(exact diff blocked).size} missing")

    // per-task bound: each (label, ka, kb) cell pair — one shuffle
    // task's work — stays within a small constant of cap², even though
    // hash cells are only approximately even
    val e = Tables.embeddings(spark, sf).select("label", "vec_id")
    val maxTask = Dedup.simPairsCellCandidates(e, cap)
      .groupBy("label", "ka", "kb").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxTask <= 4L * cap * cap,
      s"a cell-pair task holds $maxTask candidates (cap=$cap) — blocking broke")

    // and blocking actually engaged (m > 1 somewhere), or the test is vacuous
    val nCells = Dedup.simPairsCellCandidates(e, cap)
      .select("label", "ka").distinct().count()
    val nLabels = e.select("label").distinct().count()
    assert(nCells > nLabels, "cap=16 produced one cell per label — fixture drifted")
  }

  test("embed banding: a single hot label stays pruned") {
    // every vector in ONE label block — the 100 TB skew scenario the
    // label-blocked all-pairs form degenerates on
    val hot = Dedup.embedTwinCorpus(spark, sf).withColumn("label", lit(0)).cache()
    val n = hot.count()
    val cand = Dedup.embedBandCandidates(hot, bands = 4, bits = 8).count()
    assert(cand * 5 <= pairsOf(n),
      s"hot-label banding admits $cand of ${pairsOf(n)} pairs — quadratic blowup")
    hot.unpersist()
  }
}
