package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointOps.{checkpointHashPartitioned, release, FenceSyntax}

/** Graph analytics over relational edge lists — the companion family to
  * Curation.connectedComponents. PageRank here is INTEGER-EXACT: scores
  * live in parts-per-million BIGINTs and every per-edge contribution is
  * an integer division (`r div outdeg`), so the fixpoint after a fixed
  * iteration count is bit-identical across engines, partition layouts,
  * and retries — no floating sums whose order a shuffle could change.
  * The floor division leaks a little probability mass (bounded by
  * outdeg per vertex per round); rankings are unaffected and the gate
  * hashes exact values.
  *
  * Scale shape per iteration: one join of the edge list against the
  * score table (co-partitioned on the source key after the first
  * round), one partial-aggregated groupBy on the destination, one left
  * join back onto the vertex set. O(iterations) rounds of linear work —
  * the classic Pregel schedule expressed relationally. Scores are
  * localCheckpoint-fenced so the logical plan stays O(1) per round
  * (the same lineage-truncation lesson as connectedComponents).
  */
object Graph {

  private val Damping = 85L // ×/100 — 0.85 in integer per-cent arithmetic
  private val BasePpm = 150000L // (1 - 0.85) × 1e6
  private val Iters = 5

  /** Partition width for the once-checkpointed iteration tables. An
    * EXPLICIT count (repartition(w, col) — REPARTITION_BY_NUM) is load-
    * bearing: a bare repartition(col) is an AQE-coalescible exchange,
    * and AQE sizes it by shuffle BYTES (~1 MB/partition floor), so the
    * checkpointed edge table comes out ~10 partitions at sf0.1 and
    * every subsequent round — the expensive part, replayed 5–120× —
    * runs on 10 of 32 cores (profiled: gr_pagerank_conv wall 67 s over
    * 338 s summed task time). Rounds re-scan the checkpoint, so its
    * width must be sized for the ITERATION's CPU, not one exchange's
    * data volume: session parallelism, same policy as gr_linkpred's
    * wedge join.
    */
  private def iterWidth(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Run a Pregel-style round loop with adaptive execution and
    * whole-stage codegen OFF, restoring both afterwards. Measured on
    * the sf0.1 purchase graph (20-round PageRank, idle machine, both
    * orders tried, 2 reps): baseline ~14-17 s, AQE off ~13-15 s,
    * codegen off ~11-12 s, both off **~8-9 s** — per-round wall is
    * driver-bound, not executor-bound (338 s of task time fit in a
    * 56 s wall at 32 threads). Every round is a NEW plan with fresh
    * expr-ids, so whole-stage codegen compiles ~3 never-reused
    * classes per round (Janino time on the critical path) and AQE
    * re-optimizes every shuffle stage to coalesce a few-MB exchange
    * it should leave alone. Interpreted eval is slower per row, but a
    * round touches only O(E/n) rows per task — the driver overhead
    * dominates by an order of magnitude. The loop STRUCTURE
    * (stationary co-partitioned edges, shuffle_hash score joins) is
    * unchanged and scale-independent; this trades a per-row constant
    * that is irrelevant at test SF and amortized at 100 TB (where
    * task time, not plan time, dominates and a fixed plan per round
    * still skips the per-round compile).
    */
  private def withIterConf[T](spark: SparkSession)(f: => T): T =
    withIterConf(spark, codegen = false)(f)

  private def withIterConf[T](spark: SparkSession, codegen: Boolean)(f: => T): T = {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled")
    val wsc = conf.get("spark.sql.codegen.wholeStage")
    val cp = conf.get("spark.sql.constraintPropagation.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    // constraint propagation re-derives the constraint set of every
    // join/filter subtree on each round's fresh plan — pure optimizer
    // inference (no plan it enables matters in these loops: the round
    // joins are all hinted shuffle_hash on advertised partitionings)
    // that grows with plan depth between fences. Paired back-to-back
    // A/B on gr_pagerank_conv sf0.1 (r16): 44.6 -> 42.6 s and
    // 43.2 -> 40.7 s with it off (~5%), same rows. Scoped to the
    // iteration and restored after — global queries keep the
    // inference (e.g. IsNotNull pushdown from join conditions).
    conf.set("spark.sql.constraintPropagation.enabled", "false")
    try f finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.codegen.wholeStage", wsc)
      conf.set("spark.sql.constraintPropagation.enabled", cp)
    }
  }

  /** Integer PageRank over a directed edge list `(src, dst)`. Every
    * vertex must appear as a source (undirected graphs: union both
    * directions); init score = 1e6 ppm.
    */
  /** One lazy PageRank round over the stationary fences (shared by
    * [[pageRank]], [[pageRankConverged]], and the plan-evidence
    * seams). The score table CARRIES outdeg, so the per-round quotient
    * is a row-local projection — no join against a degree table at
    * all (r17; the r16 shape paid a V-sized shuffled-hash quotient
    * join per round, and the pre-r16 shape carried outdeg on the
    * E-sized edge fence and divided per edge). `sum(q)` with q =
    * r div outdeg is bit-identical to the per-edge `sum(r div
    * outdeg)`: every edge out of `src` contributes the same floored
    * quotient. The score side keeps the shuffle_hash hint: the
    * stationary edge fence streams against a per-partition hash map
    * of the O(V/n) (id, outdeg, r) rows, never an E-sized sort.
    */
  private def prRound(eFence: DataFrame, vertsDeg: DataFrame,
                      r: DataFrame): DataFrame = {
    val q = r.selectExpr("id AS src", "r div outdeg AS q")
    val contrib = eFence
      .join(q.hint("shuffle_hash"), "src")
      .groupBy("dst").agg(expr("cast(sum(q) AS bigint) AS c"))
    vertsDeg.join(contrib.selectExpr("dst AS id", "c").hint("shuffle_hash"),
        Seq("id"), "left")
      .selectExpr("id", "outdeg",
        s"$BasePpm + ($Damping * coalesce(c, 0L)) div 100 AS r")
  }

  def pageRank(edges: DataFrame, iters: Int = Iters): DataFrame = {
    val e = edges.toDF("src", "dst").fenced
    withIterConf(e.sparkSession) {
    val w = iterWidth(edges)
    // hash-partition the edge table on src ONCE and checkpoint it with
    // the partitioning ADVERTISED (checkpointHashPartitioned — a plain
    // localCheckpoint forgets it under AQE and every round re-shuffled
    // the E-sized table), so every round's edge⋈score join reuses this
    // layout and only the O(V) score table moves — the edge list (the
    // 100 TB side) never re-shuffles. The fence is (src, dst) ONLY:
    // outdeg lives on the V-sized vertex table and rides the score
    // rows (see prRound), so the re-scanned-per-round payload carries
    // no degree column (guide §2.3 — the r16 prc narrowing, now
    // applied family-wide).
    val eFence = checkpointHashPartitioned(e, w, "src")
    // one V-sized table serves as both the vertex set and the degree
    // table: group-by-src IS distinct-src here (every vertex appears
    // as a source in the both-directions edge list)
    val vertsDeg = checkpointHashPartitioned(
      e.groupBy("src").agg(expr("cast(count(*) AS bigint) AS outdeg"))
        .selectExpr("src AS id", "outdeg"), w, "id")
    var r = vertsDeg.withColumn("r", lit(1000000L))
    var loopFence: DataFrame = null
    (1 to iters).foreach { i =>
      r = prRound(eFence, vertsDeg, r)
      // a FIXED iteration count needs no per-round convergence action,
      // so lineage stays lazy — one job plans all rounds (materializing
      // every round tripled wall-clock); the fence only kicks in on
      // walks deep enough for plan analysis to grow noticeable. Each
      // fence supersedes the previous one — release it, or deep runs
      // leak a fence per 6 rounds (blocks locally; corpus-sized FILE
      // sets under the reliable mode)
      if (i % 6 == 0 && i < iters) {
        val prev = loopFence
        r = r.fenced
        loopFence = r
        if (prev != null) release(prev)
      }
    }
    // materialize INSIDE the guard so the rounds execute under the
    // iteration confs (returned lazily, they would plan at the
    // caller's action with codegen+AQE back on)
    val out = checkpointHashPartitioned(r.select("id", "r"), w, "id")
    // the result is materialized — drop the iteration-only checkpoint
    // blocks so repeated invocations (bench passes) don't pile dead
    // blocks into the block manager
    if (loopFence != null) release(loopFence)
    release(eFence); release(vertsDeg); release(e)
    out
    }
  }

  private val HitsIters = 8

  /** Kleinberg HITS over a symmetric ±-coded purchase edge list (only
    * the even→odd customer→supplier direction is used). Integer
    * max-normalized ppm scores, 8 rounds — see gr_hits's commentary.
    * Returns one row per vertex with its role score at round 8
    * (hub score for customers, authority score for suppliers).
    */
  /** The two lazy HITS half-rounds (pre-observe, pre-fence), factored
    * so the loop and [[hitsRoundPlanForSpec]] share one definition:
    * raw authority = per-dst sum of hub scores over the src-stationary
    * edge fence; raw hub = per-src sum of authority scores over the
    * dst-stationary fence. Both are shuffle_hash joins against the
    * stationary checkpoints — no crossJoin, no BroadcastExchange (the
    * r16 max-normalization rides the fence as an observed metric and
    * divides by a literal).
    */
  private def hitsAuthRaw(eSrc: DataFrame, h: DataFrame): DataFrame =
    eSrc.join(h.selectExpr("id AS src", "h AS hs").hint("shuffle_hash"), "src")
      .groupBy("dst").agg(expr("cast(sum(hs) AS bigint) AS ar"))

  private def hitsHubRaw(eDst: DataFrame, a: DataFrame): DataFrame =
    eDst.join(a.selectExpr("id AS dst", "a AS av").hint("shuffle_hash"), "dst")
      .groupBy("src").agg(expr("cast(sum(av) AS bigint) AS hrw"))

  /** One HITS half-round's executed-plan string (authority pass with
    * its riding max observation) — plan evidence for the fenced loop.
    */
  private[graft] def hitsRoundPlanForSpec(edges: DataFrame): String = {
    val dirE = edges.toDF("src", "dst").where("src % 2 = 0").fenced
    withIterConf(dirE.sparkSession) {
      val w = iterWidth(dirE)
      val eSrc = checkpointHashPartitioned(dirE, w, "src")
      val h = eSrc.select(col("src").as("id")).distinct()
        .withColumn("h", lit(1000000L))
      val obs = org.apache.spark.sql.Observation("hits_amax_spec")
      val s = hitsAuthRaw(eSrc, h)
        .observe(obs, expr("max(ar) AS am"))
        .queryExecution.executedPlan.toString
      release(eSrc); release(dirE)
      s
    }
  }

  def hits(edges: DataFrame, iters: Int = HitsIters): DataFrame = {
    require(iters >= 1, "hits needs at least one round")
    val dirE = edges.toDF("src", "dst").where("src % 2 = 0").fenced
    withIterConf(dirE.sparkSession) {
      val w = iterWidth(dirE)
      val eSrc = checkpointHashPartitioned(dirE, w, "src")
      val eDst = checkpointHashPartitioned(dirE, w, "dst")
      var h = eSrc.select(col("src").as("id")).distinct()
        .withColumn("h", lit(1000000L))
      var a: DataFrame = null
      val fences = scala.collection.mutable.ListBuffer.empty[DataFrame]
      (1 to iters).foreach { i =>
        // the round max must MATERIALIZE, so unlike the pageRank loop
        // (which stays lazy for a fixed round count) the raw per-round
        // aggregate is checkpoint-fenced FIRST — without the fence each
        // max re-executes the whole prior-round lineage and the plan
        // re-runs combinatorially (first measured shape: 48 s solo at
        // sf0.1 for 8 rounds; fenced: ~1 s). The max itself rides the
        // FENCE job as an observed metric (r16): the eager checkpoint
        // is already an action over every araw/hraw row, so a
        // CollectMetrics node yields the round max for free — replacing
        // the 2 extra aggregate jobs + broadcast exchanges + crossJoins
        // per round the old amax/hmax DataFrames cost (16 scheduler
        // round-trips across the run), and the normalization becomes a
        // row-local projection with a literal divisor.
        val obsA = org.apache.spark.sql.Observation(s"hits_amax_$i")
        val araw = hitsAuthRaw(eSrc, h)
          .observe(obsA, expr("max(ar) AS am"))
          .fenced
        fences += araw
        val am = obsA.get("am").asInstanceOf[Long]
        a = araw.selectExpr("dst AS id", s"ar * 1000000 div ${am}L AS a")
        val obsH = org.apache.spark.sql.Observation(s"hits_hmax_$i")
        val hraw = hitsHubRaw(eDst, a)
          .observe(obsH, expr("max(hrw) AS hm"))
          .fenced
        fences += hraw
        val hm = obsH.get("hm").asInstanceOf[Long]
        h = hraw.selectExpr("src AS id", s"hrw * 1000000 div ${hm}L AS h")
      }
      // materialize INSIDE the conf guard (the pageRank lesson); `out`
      // is then self-contained, so every per-round fence releases —
      // 16 superseded O(V) block sets would otherwise pile up per
      // bench pass (the bpeLearn release discipline)
      val out = h.selectExpr("id", "'customer' AS kind", "id div 2 AS key",
          "h AS score_ppm")
        .unionByName(a.selectExpr("id", "'supplier' AS kind", "id div 2 AS key",
          "a AS score_ppm"))
        .fenced
      fences.foreach(release)
      release(eSrc); release(eDst); release(dirE)
      out
    }
  }

  /** One-shot holder (the Ml.trainChain discipline): putIfAbsent
    * decides the winner atomically, and only the winning holder's
    * lazy val ever materializes, so a lost race can never checkpoint
    * a duplicate edge list nobody would release.
    */
  private final class EdgeHolder(spark: SparkSession, dir: String) {
    lazy val value: DataFrame = {
      val cs = Tables.orders(spark, dir).selectExpr("o_orderkey", "o_custkey")
        .join(Tables.lineitem(spark, dir).selectExpr("l_orderkey", "l_suppkey"),
          expr("o_orderkey = l_orderkey"))
        .selectExpr("o_custkey * 2 AS cv", "l_suppkey * 2 + 1 AS sv")
        .distinct()
      cs.selectExpr("cv AS src", "sv AS dst")
        .unionByName(cs.selectExpr("sv AS src", "cv AS dst"))
        .fenced
    }
  }

  private val edgeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), EdgeHolder]

  /** Memoized 5-round label propagation over the purchase graph —
    * shared by gr_labelprop (which reports the communities) and
    * gr_modularity (which scores them), the purchaseEdges/bpeLearned
    * holder discipline.
    */
  private final class LabelHolder(spark: SparkSession, dir: String) {
    @volatile var built = false
    lazy val value: DataFrame = {
      val v = labelPropagation(purchaseEdges(spark, dir), rounds = 5)
      built = true
      v
    }
  }

  private val labelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), LabelHolder]

  private[graft] def propagatedLabels(spark: SparkSession, dir: String): DataFrame = {
    labelCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    val fresh = new LabelHolder(spark, dir)
    labelCache.putIfAbsent((spark, dir), fresh).getOrElse(fresh).value
  }

  /** Drop + release the memoized label table so the next
    * [[propagatedLabels]] call rebuilds it. This is gr_labelprop's
    * OUTPUT-level memo: Bench resets it before each timed pass so the
    * lane row measures labelPropagation, not a cached checkpoint read
    * (the r13 0.22 s-vs-5.9 s-solo accounting gap). The `built` guard
    * keeps release from materializing a never-evaluated lazy val.
    */
  private[graft] def resetPropagatedLabels(spark: SparkSession, dir: String): Unit =
    labelCache.remove((spark, dir)).foreach(h => if (h.built) release(h.value))

  /** The undirected customer⇄supplier purchase edge list, built ONCE
    * per (session, dir) and shared: four graph queries (gr_pagerank,
    * gr_pagerank_conv, gr_ppr_segment, gr_bfs_dist) re-derive the
    * identical orders⋈lineitem distinct — the most expensive part of
    * the cheap graph queries — and repeated bench passes multiply it.
    * Memoizing the materialized edge checkpoint is the Ml.trainChain
    * discipline (same holder pattern, same stopped-session eviction).
    * gr_pagerank_w and gr_kcore stay out: the weighted relation keeps
    * the per-order multiplicity this distinct collapses, and kcore
    * peels a different (part co-purchase) graph.
    */
  private[graft] def purchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    edgeCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    val fresh = new EdgeHolder(spark, dir)
    edgeCache.putIfAbsent((spark, dir), fresh).getOrElse(fresh).value
  }

  /** One un-materialized PageRank round's executed-plan string, built
    * exactly the way the loop builds it — for PlanShapeSpec to pin the
    * round shape (1 contribution exchange, 2 shuffled-hash joins, no
    * sort) without reaching into the guarded loop.
    */
  private[graft] def oneRoundPlanForSpec(edges: DataFrame): String = {
    val e = edges.toDF("src", "dst").fenced
    withIterConf(e.sparkSession) {
      val w = iterWidth(e)
      val eFence = checkpointHashPartitioned(e, w, "src")
      val vertsDeg = checkpointHashPartitioned(
        e.groupBy("src").agg(expr("cast(count(*) AS bigint) AS outdeg"))
          .selectExpr("src AS id", "outdeg"), w, "id")
      val r = vertsDeg.withColumn("r", lit(1000000L))
      val s = prRound(eFence, vertsDeg, r)
        .queryExecution.executedPlan.toString
      release(eFence); release(vertsDeg); release(e)
      s
    }
  }

  /** PageRank iterated to the exact integer FIXPOINT CYCLE instead of a
    * fixed round count. Measured fact (sf0.01 purchase graph, and the
    * round count is damping-driven — 0.85ⁿ on ppm magnitudes — so
    * roughly size-independent): consecutive-round delta never reaches
    * 0; the system enters a stable period-2 cycle (514 oscillating
    * vertices) around round 72–80, r_80 == r_82 == … == r_120. A plain
    * "delta = 0" early-exit therefore NEVER fires on bipartite graphs
    * like this one — the honest convergence semantics is the
    * period-≤2 fixpoint.
    *
    * Determinism across engines without agreeing on the detection
    * round: scores are fenced every `checkEvery` rounds (lazy
    * composition in between — materializing each round tripled
    * wall-clock) and compared to the previous fence. `r_t == r_{t-k}`
    * proves a cycle of period dividing k; detection lands on a
    * multiple of k, and 120 − t is then also a multiple of k, so the
    * detected fence carries EXACTLY the scores of the oracle's fixed
    * 120th round. Any EVEN k that divides 120 is therefore
    * semantics-identical (the realized period is 2; odd k would never
    * detect it). k = 6 is the measured sweet spot of the
    * block-depth-vs-fence-count trade (r13, sf0.1 solo, idle:
    * k = 2 → 37.4 s, 4 → 37.1 s, 6 → 35.1 s, 10 → 40.2 s — deeper
    * lazy blocks pay per-stage lineage-serialization, shallower ones
    * pay fence+cycle-check jobs).
    */
  /** One pageRankConverged round PLUS the block-ending cycle-check
    * join, executed-plan string — the plan-evidence seam for the
    * fenced loop (the outer dump collapses to a checkpoint scan).
    * Built exactly the way the loop builds it: stationary fences, one
    * shared [[prRound]] (quotient is a row-local projection — outdeg
    * rides the score rows), then the exchange-free
    * hash(id,w)⋈hash(id,w) compare-to-previous-fence join whose
    * count_if rides the fence job as an observed metric.
    */
  private[graft] def prcRoundPlanForSpec(edges: DataFrame): String = {
    val e = edges.toDF("src", "dst").fenced
    withIterConf(e.sparkSession) {
      val w = iterWidth(edges)
      val eFence = checkpointHashPartitioned(e, w, "src")
      val vertsDeg = checkpointHashPartitioned(
        e.groupBy("src").agg(expr("cast(count(*) AS bigint) AS outdeg"))
          .selectExpr("src AS id", "outdeg"), w, "id")
      val r0 = checkpointHashPartitioned(
        vertsDeg.withColumn("r", lit(1000000L)), w, "id")
      val obs = org.apache.spark.sql.Observation("prc_diff_spec")
      val s = prRound(eFence, vertsDeg, r0)
        .join(r0.selectExpr("id", "r AS rp").hint("shuffle_hash"), "id")
        .observe(obs, expr("count_if(r != rp) AS d"))
        .select("id", "outdeg", "r")
        .queryExecution.executedPlan.toString
      release(eFence); release(vertsDeg); release(r0); release(e)
      s
    }
  }

  def pageRankConverged(edges: DataFrame, maxIters: Int = 190,
                        checkEvery: Int = 6): DataFrame = {
    val e = edges.toDF("src", "dst").fenced
    withIterConf(e.sparkSession) {
    val w = iterWidth(edges)
    // The stationary table a round re-reads is the 100 TB side and is
    // re-scanned once PER ROUND — keep it as narrow as the algorithm
    // allows (guide §2.3 "narrower types / project early", applied to
    // the fence): (src, dst) only. Profiled before the r16 split:
    // 10.9 GB of fence-block re-reads per run at sf0.1 — dropping
    // outdeg cut the re-read payload by a third. r17 goes further:
    // outdeg RIDES THE SCORE ROWS (vertsDeg is both the vertex set and
    // the degree table; the periodic fence carries id, outdeg, r), so
    // the per-round quotient is a row-local projection and the
    // V-sized quotient join the r16 shape paid per round disappears —
    // see prRound for the bit-identity argument.
    val eFence = checkpointHashPartitioned(e, w, "src")
    val vertsDeg = checkpointHashPartitioned(
      e.groupBy("src").agg(expr("cast(count(*) AS bigint) AS outdeg"))
        .selectExpr("src AS id", "outdeg"), w, "id")
    var r = checkpointHashPartitioned(
      vertsDeg.withColumn("r", lit(1000000L)), w, "id")
    var prevFence = r
    var i = 0
    var cycled = false
    while (i < maxIters && !cycled) {
      // clamp the last block so a maxIters that is not a multiple of
      // checkEvery still runs EXACTLY maxIters rounds (an unclamped
      // block would overshoot and the no-cycle diagnostic would
      // misreport the returned round)
      val block = math.min(checkEvery, maxIters - i)
      (1 to block).foreach { _ => r = prRound(eFence, vertsDeg, r) }
      i += block
      // fence WITH the id-layout advertised: the next block's rounds
      // start from a co-partitioned state table instead of re-deriving
      // the layout. The cycle check RIDES the fence job as an observed
      // metric (the gr_hits/k-core r16 discipline): join the new state
      // to the previous fence — both advertise hash(id, w), so the
      // join is exchange-free, and shuffle_hash keeps it sort-free —
      // and count differing rows while the fence materializes. The old
      // shape paid a separate isEmpty JOB per block (~17 extra
      // scheduler barriers over a 102-round run) that re-read both
      // fenced block sets for one boolean. Both sides hold exactly one
      // row per vertex id, so the inner join is row-preserving and
      // d == 0 ⟺ the old "no row differs".
      val obs = org.apache.spark.sql.Observation(s"prc_diff_$i")
      r = checkpointHashPartitioned(
        r.join(prevFence.selectExpr("id", "r AS rp").hint("shuffle_hash"), "id")
          .observe(obs, expr("count_if(r != rp) AS d"))
          .select("id", "outdeg", "r"),
        w, "id")
      cycled = obs.get("d").asInstanceOf[Long] == 0L
      if (prevFence ne r) release(prevFence) // superseded fence blocks
      prevFence = r
    }
    // A maxIters exit means NO period-dividing-`checkEvery` cycle was
    // detected — a graph with a longer period (or genuine divergence)
    // would silently return the round-`maxIters` state and mismatch a
    // fixed-round oracle with no clue why. Make that attributable.
    if (!cycled)
      System.err.println(
        s"[graft] pageRankConverged: no period-$checkEvery cycle within " +
        s"$maxIters rounds — returning round-$i scores; a fixed-round " +
        "oracle may disagree (raise maxIters or checkEvery for this graph)")
    else
      // attributability for wall-clock shifts: the round count is
      // data-dependent (damping x graph structure), so a corpus
      // regeneration can legitimately move it — make that visible
      // instead of letting the bench row drift unexplained (r15: the
      // 2026-08-13 testdata vintage moved sf0.1 detection 84 -> ~132)
      System.err.println(
        s"[graft] pageRankConverged: period-$checkEvery cycle detected at round $i")
    release(eFence); release(vertsDeg); release(e)
    r.select("id", "r")
    }
  }

  /** Personalized PageRank: teleport mass returns only to the SEED set
    * (seeds start with the full unit mass, non-seeds with 0), so the
    * fixpoint measures proximity to the seeds rather than global
    * centrality. Same integer-ppm arithmetic and per-round shape as
    * [[pageRank]].
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int = Iters): DataFrame = {
    val e = edges.toDF("src", "dst").fenced
    withIterConf(e.sparkSession) {
    val w = iterWidth(edges)
    // the pageRank r17 shape: narrow (src, dst) edge fence; outdeg and
    // the seed flag ride the V-sized vertex/score rows so the per-round
    // quotient is a row-local projection (see prRound's bit-identity
    // argument — every edge out of src contributes the same floored
    // quotient either way)
    val eFence = checkpointHashPartitioned(e, w, "src")
    val vertsDeg = checkpointHashPartitioned(
      e.groupBy("src").agg(expr("cast(count(*) AS bigint) AS outdeg"))
        .selectExpr("src AS id", "outdeg")
        .join(seeds.toDF("id").withColumn("seed", lit(true)), Seq("id"), "left")
        .selectExpr("id", "outdeg", "coalesce(seed, false) AS seed"), w, "id")
    var r = vertsDeg.selectExpr("id", "outdeg", "seed",
      "CASE WHEN seed THEN 1000000L ELSE 0L END AS r")
    var loopFence: DataFrame = null
    (1 to iters).foreach { i =>
      val q = r.selectExpr("id AS src", "r div outdeg AS q")
      val contrib = eFence
        .join(q.hint("shuffle_hash"), "src")
        .groupBy("dst").agg(expr("cast(sum(q) AS bigint) AS c"))
      r = vertsDeg.join(contrib.selectExpr("dst AS id", "c").hint("shuffle_hash"),
          Seq("id"), "left")
        .selectExpr("id", "outdeg", "seed",
          s"CASE WHEN seed THEN $BasePpm ELSE 0L END + ($Damping * coalesce(c, 0L)) div 100 AS r")
      // release superseded in-loop fences (see pageRank)
      if (i % 6 == 0 && i < iters) {
        val prev = loopFence
        r = r.fenced
        loopFence = r
        if (prev != null) release(prev)
      }
    }
    val out = checkpointHashPartitioned(r.select("id", "r"), w, "id")
    if (loopFence != null) release(loopFence)
    release(eFence); release(vertsDeg); release(e)
    out
    }
  }

  /** Weighted integer PageRank: each edge carries an integer weight and
    * a source's mass splits proportionally — contribution = (r · w) div
    * Σw(src) per edge, still exact int64 arithmetic (one floor division
    * per edge per round).
    */
  def pageRankWeighted(edges: DataFrame, iters: Int = Iters): DataFrame = {
    val e = edges.toDF("src", "dst", "w").fenced
    withIterConf(e.sparkSession) {
    val wdt = iterWidth(edges)
    // the pageRank r17 shape, weighted flavor: the stationary fence is
    // (src, dst, w) — the per-source weight TOTAL rides the V-sized
    // vertex/score rows instead of being duplicated onto every edge
    // row (guide §2.3: one bigint column off the E-sized re-scanned-
    // per-round payload). The per-edge contribution (rs · w) div sw is
    // unchanged arithmetic; rs and sw arrive on the score side of the
    // join instead of sw sitting on the edge side.
    val eFence = checkpointHashPartitioned(e, wdt, "src")
    val vertsSw = checkpointHashPartitioned(
      e.groupBy("src").agg(expr("cast(sum(w) AS bigint) AS sw"))
        .selectExpr("src AS id", "sw"), wdt, "id")
    var r = vertsSw.withColumn("r", lit(1000000L))
    var loopFence: DataFrame = null
    (1 to iters).foreach { i =>
      val contrib = eFence
        .join(r.selectExpr("id AS src", "r AS rs", "sw").hint("shuffle_hash"), "src")
        .groupBy("dst").agg(expr("cast(sum((rs * w) div sw) AS bigint) AS c"))
      r = vertsSw.join(contrib.selectExpr("dst AS id", "c").hint("shuffle_hash"),
          Seq("id"), "left")
        .selectExpr("id", "sw",
          s"$BasePpm + ($Damping * coalesce(c, 0L)) div 100 AS r")
      // release superseded in-loop fences (see pageRank)
      if (i % 6 == 0 && i < iters) {
        val prev = loopFence
        r = r.fenced
        loopFence = r
        if (prev != null) release(prev)
      }
    }
    val out = checkpointHashPartitioned(r.select("id", "r"), wdt, "id")
    if (loopFence != null) release(loopFence)
    release(eFence); release(vertsSw); release(e)
    out
    }
  }

  /** Synchronous label propagation: `rounds` fixed rounds, each vertex
    * adopting the most frequent neighbor label, ties to the SMALLEST —
    * a deterministic total order. Same stationary-edge iteration shape
    * as [[pageRank]]. Returns (id, lbl).
    *
    * codegen stays OFF here like the rest of the family — the r11
    * late flip to ON was REVERTED in r13 on measurement: ON costs
    * ~1.7× at sf0.1 (solo 10.0 s vs ~5.9 s — five rounds of fresh
    * Janino compiles dominate small data; this was the one bench_diff
    * regression in three idle lane runs) and +18 % at sf3 (34.6 vs
    * 29.4 s at 48 g), for a wash at sf10 (114.3 vs 118.0 s). The one
    * thing ON bought was surviving a 16 GiB driver at sf3 — but that
    * is the local[32] single-JVM conflating executor heap with driver
    * heap, the same envelope gr_linkpred already documents: sf3+ runs
    * set SPARK_DRIVER_MEM (48 g sf3 / 96 g sf10); on a real cluster
    * this is ordinary per-executor memory scaled by executor count.
    * Decade exponent sf3→sf10 = 0.94 codegen-off (PLANS.md r13
    * adjudication; the committed 1.55 point was ambient-load
    * contamination).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.toDF("src", "dst").fenced
    withIterConf(e.sparkSession) {
      val w = iterWidth(e)
      val withE = checkpointHashPartitioned(e, w, "src")
      val verts = checkpointHashPartitioned(
        e.select(col("src").as("id")).distinct(), w, "id")
      var lbls = verts.withColumn("lbl", col("id"))
      (1 to rounds).foreach { r =>
        val win = withE
          .join(lbls.selectExpr("id AS src", "lbl").hint("shuffle_hash"), "src")
          .groupBy("dst", "lbl")
          .agg(expr("cast(count(*) AS bigint) AS cnt"))
          .groupBy("dst")
          .agg(expr("max(named_struct('c', cnt, 'nl', -lbl)) AS m"))
          .selectExpr("dst AS id", "-m.nl AS wl")
        lbls = lbls.join(win.hint("shuffle_hash"), Seq("id"), "left")
          .selectExpr("id", "coalesce(wl, lbl) AS lbl")
        if (r % 3 == 0 && r < rounds) {
          val old = lbls
          lbls = checkpointHashPartitioned(lbls, w, "id")
          release(old) // superseded mid-loop fence (no-op on lazy plans)
        }
      }
      val out = checkpointHashPartitioned(lbls, w, "id")
      release(withE); release(verts); release(e)
      out
    }
  }

  /** Newman modularity of a community assignment over a symmetric
    * directed edge list, exact integer arithmetic (see gr_modularity's
    * commentary): per-community rows + the '-1' Q summary.
    */
  private[graft] def modularityOf(lab0: DataFrame, edges: DataFrame): DataFrame = {
    val lab = lab0.toDF("id", "lbl")
    val e = edges.toDF("src", "dst")
    val ne = e.groupBy().agg(expr("cast(count(*) AS bigint) AS ne"))
    val intra = e
      .join(lab.selectExpr("id AS src", "lbl AS sl"), "src")
      .join(lab.selectExpr("id AS dst", "lbl AS dl"), "dst")
      .where("sl = dl")
      .groupBy("sl").agg(expr("cast(count(*) AS bigint) AS in_e"))
    // community degree WITHOUT a second E-sized join: fold E to the
    // O(V) per-vertex degree table first, then join the O(V) labels
    // and sum — Σ_v deg(v)·1[lbl(v)=c] ≡ counting edge rows by source
    // label, row for row. The r14 sf10 profile caught the old shape
    // (e ⋈ lab twice) re-running the E-join per consumer: two ~equal
    // 400 s-class task-time stages, 35 % of the query's compute.
    val deg = e.groupBy("src").agg(expr("cast(count(*) AS bigint) AS vd"))
      .join(lab.selectExpr("id AS src", "lbl"), "src")
      .groupBy("lbl").agg(expr("cast(sum(vd) AS bigint) AS d"))
    val per = deg
      .join(intra.selectExpr("sl AS lbl", "in_e"), Seq("lbl"), "left")
      .crossJoin(broadcast(ne))
      .selectExpr("lbl AS community",
        "coalesce(in_e, 0L) AS in_edges", "d AS degree",
        "coalesce(in_e, 0L) * 1000000 div ne - (d * 1000 div ne) * (d * 1000 div ne) AS q_ppm")
    per.unionByName(
      per.groupBy().agg(
          expr("cast(sum(in_edges) AS bigint) AS ie"),
          expr("cast(sum(degree) AS bigint) AS dg"),
          expr("cast(sum(q_ppm) AS bigint) AS q"))
        .selectExpr("-1L AS community", "ie AS in_edges", "dg AS degree", "q AS q_ppm"))
  }

  /** DuckDB CTE chain for 5-round label propagation over the purchase
    * graph, ending in `l5(id, lbl)` (with `edges` exposed) — shared by
    * the gr_labelprop and gr_modularity oracles so they cannot
    * diverge. Mirrors [[labelPropagation]] exactly: per-round
    * (dst, lbl) counts, most-frequent-smallest winner, left-join
    * carry-over.
    */
  private def labelChainSql: String = {
    val iters = (1 to 5).map { r => s"""
        c$r AS MATERIALIZED (
          SELECT e.dst, l.lbl, count(*)::BIGINT AS cnt
          FROM edges e JOIN l${r - 1} l ON e.src = l.id
          GROUP BY e.dst, l.lbl),
        w$r AS MATERIALIZED (
          SELECT dst, lbl FROM (
            SELECT dst, lbl,
                   row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, lbl) AS rn
            FROM c$r) WHERE rn = 1),
        l$r AS MATERIALIZED (
          SELECT p.id, coalesce(w.lbl, p.lbl) AS lbl
          FROM l${r - 1} p LEFT JOIN w$r w ON w.dst = p.id)"""
    }.mkString(",")
    s"""cs AS (
          SELECT DISTINCT o_custkey * 2 AS cv, l_suppkey * 2 + 1 AS sv
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (
          SELECT cv AS src, sv AS dst FROM cs
          UNION ALL
          SELECT sv AS src, cv AS dst FROM cs),
        l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lbl FROM edges),
        $iters"""
  }

  def queries: Seq[QueryDef] = Seq(
    // -------------------------------------- PageRank over purchase graph
    // Vertices: customers (2k) and suppliers (2k+1) — the two TPC-H key
    // spaces interleaved into one id space. Edges: the DISTINCT
    // customer→supplier purchase relation from orders⋈lineitem, walked
    // in both directions so every vertex has out-degree ≥ 1 (no
    // dangling mass). Output: every vertex's integer-ppm score after 5
    // rounds plus its degree — high-degree suppliers accumulate rank.
    QueryDef(
      "gr_pagerank",
      (spark, dir) => {
        val edges = purchaseEdges(spark, dir)
        val deg = edges.groupBy("src").agg(expr("cast(count(*) AS bigint) AS degree"))
        pageRank(edges)
          .join(deg.selectExpr("src AS id", "degree"), "id")
          .selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind",
            "id div 2 AS key", "degree", "r AS score_ppm")
      },
      Some {
        val iter = (i: Int) => s"""
        r$i AS (
          SELECT v.id, $BasePpm + ($Damping * coalesce(s.c, 0)) // 100 AS r
          FROM v LEFT JOIN (
            SELECT e.dst, sum(r${i - 1}.r // d.outdeg)::BIGINT AS c
            FROM edges e JOIN r${i - 1} ON e.src = r${i - 1}.id
                         JOIN deg d ON e.src = d.src
            GROUP BY e.dst) s ON v.id = s.dst)"""
        s"""
        WITH cs AS (
          SELECT DISTINCT o_custkey * 2 AS cv, l_suppkey * 2 + 1 AS sv
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (
          SELECT cv AS src, sv AS dst FROM cs
          UNION ALL
          SELECT sv AS src, cv AS dst FROM cs),
        deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
        v AS (SELECT DISTINCT src AS id FROM edges),
        r0 AS (SELECT id, 1000000::BIGINT AS r FROM v),
        ${(1 to Iters).map(iter).mkString(",")}
        SELECT v.id, CASE WHEN v.id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               v.id // 2 AS key, d.outdeg AS degree, r$Iters.r AS score_ppm
        FROM v JOIN deg d ON v.id = d.src
               JOIN r$Iters ON v.id = r$Iters.id"""
      }),

    // ------------------- PageRank at its converged integer fixpoint
    // Same graph as gr_pagerank, run to the period-≤2 integer fixpoint
    // (see pageRankConverged: consecutive-delta never hits 0 here —
    // the exact system settles into a stable 2-cycle around round
    // 72–80). The oracle runs a FIXED 120 rounds; the Spark side
    // early-exits at the first multiple-of-10 fence inside the cycle —
    // provably the same scores. bench=false, measured: convergence is
    // ~16× gr_pagerank's 5 rounds, so an early-exit cannot land below
    // the fixed-iteration figure on this graph; gr_pagerank stays the
    // benched representative and this row pins full-convergence
    // semantics instead.
    QueryDef(
      "gr_pagerank_conv",
      (spark, dir) => {
        val edges = purchaseEdges(spark, dir)
        // SPARK_GRAFT_CONV_K: fence-cadence experiment knob (bench
        // grids only). Any EVEN k is bit-identical on this graph's
        // period-2 fixpoint (the checkEvery=6 adoption proof), so the
        // knob clamps odd values up to even rather than let a grid
        // typo silently change semantics.
        val k = sys.env.get("SPARK_GRAFT_CONV_K").map(_.toInt)
          .map(v => v + (v & 1)).getOrElse(6)
        pageRankConverged(edges, checkEvery = k)
          .selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind",
            "id div 2 AS key", "r AS score_ppm")
      },
      Some {
        // Every CTE is MATERIALIZED: DuckDB inlines single-reference
        // CTEs, and 120 inlined iterations build a 120-deep join tree
        // whose optimization never finishes; materialization turns the
        // chain into 120 small sequential queries (seconds total).
        val iter = (i: Int) => s"""
        r$i AS MATERIALIZED (
          SELECT v.id, $BasePpm + ($Damping * coalesce(s.c, 0)) // 100 AS r
          FROM v LEFT JOIN (
            SELECT e.dst, sum(r${i - 1}.r // d.outdeg)::BIGINT AS c
            FROM edges e JOIN r${i - 1} ON e.src = r${i - 1}.id
                         JOIN deg d ON e.src = d.src
            GROUP BY e.dst) s ON v.id = s.dst)"""
        val ConvIters = 120
        s"""
        WITH cs AS MATERIALIZED (
          SELECT DISTINCT o_custkey * 2 AS cv, l_suppkey * 2 + 1 AS sv
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS MATERIALIZED (
          SELECT cv AS src, sv AS dst FROM cs
          UNION ALL
          SELECT sv AS src, cv AS dst FROM cs),
        deg AS MATERIALIZED (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
        v AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
        r0 AS MATERIALIZED (SELECT id, 1000000::BIGINT AS r FROM v),
        ${(1 to ConvIters).map(iter).mkString(",")}
        SELECT v.id, CASE WHEN v.id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               v.id // 2 AS key, r$ConvIters.r AS score_ppm
        FROM v JOIN r$ConvIters ON v.id = r$ConvIters.id"""
      }),

    // ----------------------- weighted PageRank over purchase volumes
    // Same graph, but each customer↔supplier edge carries the number
    // of DISTINCT orders connecting the pair — mass flows
    // proportionally to trade volume, not mere adjacency, so a
    // supplier a customer orders from 10× pulls 10× the mass. Per-edge
    // contribution is one exact integer floor division; the rest of
    // the machinery (partition-resident edges, ppm BIGINT scores)
    // matches gr_pagerank.
    QueryDef(
      "gr_pagerank_w",
      (spark, dir) => {
        val cs = Tables.orders(spark, dir).selectExpr("o_orderkey", "o_custkey")
          .join(Tables.lineitem(spark, dir).selectExpr("l_orderkey", "l_suppkey"),
            expr("o_orderkey = l_orderkey"))
          .selectExpr("o_custkey * 2 AS cv", "l_suppkey * 2 + 1 AS sv", "o_orderkey")
          .distinct()
          .groupBy("cv", "sv")
          .agg(expr("cast(count(*) AS bigint) AS w"))
        val edges = cs.selectExpr("cv AS src", "sv AS dst", "w")
          .unionByName(cs.selectExpr("sv AS src", "cv AS dst", "w"))
        pageRankWeighted(edges)
          .selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind",
            "id div 2 AS key", "r AS score_ppm")
      },
      Some {
        val iter = (i: Int) => s"""
        r$i AS (
          SELECT v.id, $BasePpm + ($Damping * coalesce(s.c, 0)) // 100 AS r
          FROM v LEFT JOIN (
            SELECT e.dst, sum((r${i - 1}.r * e.w) // sw.sw)::BIGINT AS c
            FROM edges e JOIN r${i - 1} ON e.src = r${i - 1}.id
                         JOIN sw ON e.src = sw.src
            GROUP BY e.dst) s ON v.id = s.dst)"""
        s"""
        WITH cs AS (
          SELECT cv, sv, count(*)::BIGINT AS w
          FROM (SELECT DISTINCT o_custkey * 2 AS cv, l_suppkey * 2 + 1 AS sv, o_orderkey
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
          GROUP BY cv, sv),
        edges AS (
          SELECT cv AS src, sv AS dst, w FROM cs
          UNION ALL
          SELECT sv AS src, cv AS dst, w FROM cs),
        sw AS (SELECT src, sum(w)::BIGINT AS sw FROM edges GROUP BY src),
        v AS (SELECT DISTINCT src AS id FROM edges),
        r0 AS (SELECT id, 1000000::BIGINT AS r FROM v),
        ${(1 to Iters).map(iter).mkString(",")}
        SELECT v.id, CASE WHEN v.id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               v.id // 2 AS key, r$Iters.r AS score_ppm
        FROM v JOIN r$Iters ON v.id = r$Iters.id"""
      }),

    // ------------------- personalized PageRank from a customer segment
    // "Which suppliers matter to the BUILDING segment": teleport mass
    // is confined to BUILDING customers, so supplier scores measure
    // purchase-graph proximity to that segment — the recommendation /
    // attribution query shape. Output: supplier-side scores only (the
    // seed side's scores are dominated by their own teleport mass).
    QueryDef(
      "gr_ppr_segment",
      (spark, dir) => {
        val edges = purchaseEdges(spark, dir)
        val seeds = Tables.customer(spark, dir)
          .where("c_mktsegment = 'BUILDING'")
          .selectExpr("c_custkey * 2 AS id")
        personalizedPageRank(edges, seeds)
          .where("id % 2 = 1")
          .selectExpr("id div 2 AS suppkey", "r AS score_ppm")
      },
      Some {
        val iter = (i: Int) => s"""
        r$i AS (
          SELECT v.id,
                 (CASE WHEN v.seed THEN $BasePpm ELSE 0 END)
                   + ($Damping * coalesce(s.c, 0)) // 100 AS r
          FROM v LEFT JOIN (
            SELECT e.dst, sum(r${i - 1}.r // d.outdeg)::BIGINT AS c
            FROM edges e JOIN r${i - 1} ON e.src = r${i - 1}.id
                         JOIN deg d ON e.src = d.src
            GROUP BY e.dst) s ON v.id = s.dst)"""
        s"""
        WITH cs AS (
          SELECT DISTINCT o_custkey * 2 AS cv, l_suppkey * 2 + 1 AS sv
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (
          SELECT cv AS src, sv AS dst FROM cs
          UNION ALL
          SELECT sv AS src, cv AS dst FROM cs),
        deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
        v AS (
          SELECT t.id, (sd.id IS NOT NULL) AS seed
          FROM (SELECT DISTINCT src AS id FROM edges) t
          LEFT JOIN (SELECT c_custkey * 2 AS id FROM customer
                     WHERE c_mktsegment = 'BUILDING') sd ON t.id = sd.id),
        r0 AS (SELECT id, CASE WHEN seed THEN 1000000 ELSE 0 END::BIGINT AS r FROM v),
        ${(1 to Iters).map(iter).mkString(",")}
        SELECT v.id // 2 AS suppkey, r$Iters.r AS score_ppm
        FROM v JOIN r$Iters ON v.id = r$Iters.id
        WHERE v.id % 2 = 1"""
      }),

    // ------------------------- triangle counting (degree orientation)
    // Triangles over the bought-together part graph (two parts are
    // adjacent when some 1996 order contains both) — the local-density
    // signal community detection and recommendation mining start from.
    // Parts AND orders both scale with the corpus, so this graph keeps
    // constant average degree at any SF — unlike a co-supply graph
    // over the fixed supplier population, which densifies toward a
    // clique as orders grow (measured: near-complete at sf0.1, where
    // triangle ENUMERATION itself is the cost, no algorithm helps). The
    // classic distributed algorithm: orient every undirected edge from
    // its lower-(degree, id) endpoint to the higher, enumerate wedges
    // only at each vertex's ORIENTED out-neighborhood, and close them
    // against the oriented edge set. Orientation bounds per-vertex
    // out-degree by O(√m) on any graph (arboricity), so the wedge join
    // — the quadratic step — is bounded per task no matter how hot a
    // hub vertex is; the unoriented wedge space a naive self-join
    // explodes at a 10⁶-degree hub never materializes. Two equi-joins,
    // both on edge keys: the plan a 100 TB edge list needs.
    // Output: top-20 vertices by triangle participation with integer
    // local-clustering ppm (2e6·t div d(d-1)), plus one 'graph' row
    // (id = -1) carrying edge count and global transitivity ppm
    // (3e6·triangles div wedges). All-integer arithmetic end to end —
    // no float a shuffle could reorder.
    QueryDef(
      "gr_triangles",
      (spark, dir) => {
        val os = Tables.lineitem(spark, dir)
          .where("l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'")
          .selectExpr("l_orderkey AS ok", "l_partkey AS s").distinct()
        val edges = os.selectExpr("ok", "s AS a")
          .join(os.selectExpr("ok", "s AS b"), "ok")
          .where("a < b").select("a", "b").distinct()
        triangleReport(edges)
      },
      Some("""
        WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem
                    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'),
        edges AS (
          SELECT DISTINCT l.s AS a, r.s AS b
          FROM os l JOIN os r ON l.ok = r.ok WHERE l.s < r.s),
        deg AS (
          SELECT v, count(*)::BIGINT AS d
          FROM (SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)
          GROUP BY v),
        oriented AS (
          SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN a ELSE b END AS src,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN b ELSE a END AS dst,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN db.d ELSE da.d END AS dd
          FROM edges JOIN deg da ON a = da.v JOIN deg db ON b = db.v),
        tri AS (
          SELECT l.src AS u, l.dst AS v, r.dst AS w
          FROM oriented l JOIN oriented r ON l.src = r.src
          JOIN oriented c ON c.src = l.dst AND c.dst = r.dst
          WHERE l.dd < r.dd OR (l.dd = r.dd AND l.dst < r.dst)),
        pv AS (
          SELECT id, count(*)::BIGINT AS n_tri
          FROM (SELECT u AS id FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
          GROUP BY id)
        (SELECT 'vertex' AS scope, pv.id, deg.d AS degree, pv.n_tri,
                ((2000000 * pv.n_tri) // (deg.d * (deg.d - 1)))::BIGINT AS ppm
         FROM pv JOIN deg ON pv.id = deg.v
         ORDER BY pv.n_tri DESC, pv.id LIMIT 20)
        UNION ALL
        SELECT 'graph' AS scope, -1::BIGINT AS id,
               (SELECT sum(d) // 2 FROM deg)::BIGINT AS degree,
               (SELECT count(*) FROM tri)::BIGINT AS n_tri,
               ((3000000 * (SELECT count(*) FROM tri))
                 // (SELECT sum(d * (d - 1)) // 2 FROM deg))::BIGINT AS ppm""")),

    // ---------------------------------- 3-core of the part graph
    // Spark peels to the exact fixpoint (data-dependent rounds, driver
    // count check per round); the oracle unrolls a FIXED 60 peel
    // rounds — peeling is idempotent at the fixpoint, so any unroll ≥
    // the true depth is byte-identical (the gr_pagerank_conv trick).
    // Measured depths: 6 (sf0.001) / 28 (sf0.01) / 37 (sf0.1), all
    // comfortably under the 60-round oracle budget (23-round margin at
    // the deepest gate SF — GraphSpec pins depth ≤ budget − 10 so a
    // regenerated corpus trips a named assertion, not a bare hash
    // mismatch; extra MATERIALIZED rounds are linear, not free-floating
    // plan growth). bench=true (r9): the peel loop's iteration shape —
    // a SHRINKING edge list with two semi-joins per round — is a
    // different scaling regime than gr_pagerank's fixed-edge rounds,
    // so the graph family times BOTH representatives; profile evidence
    // in bench/profile_sf0.1.json + PLANS.md.
    QueryDef(
      "gr_kcore",
      (spark, dir) => kCore(kcoreEdges(spark, dir), 3),
      Some {
        // AS MATERIALIZED: each e_i is referenced three times; an
        // inlined CTE chain re-expands the whole prefix per reference
        // (3^depth scans — "too many open files" long before planning
        // finishes). Materialization keeps the oracle linear in depth.
        val peel = (i: Int) => s"""
        k$i AS MATERIALIZED (SELECT src FROM e$i GROUP BY src HAVING count(*) >= 3),
        e${i + 1} AS MATERIALIZED (SELECT e$i.src, e$i.dst FROM e$i
                      JOIN k$i ka ON e$i.src = ka.src
                      JOIN k$i kb ON e$i.dst = kb.src)"""
        s"""
        WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem
                    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'),
        ed AS (SELECT DISTINCT l.s AS a, r.s AS b
               FROM os l JOIN os r ON l.ok = r.ok WHERE l.s < r.s),
        e0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
               UNION ALL SELECT b, a FROM ed),
        ${(0 until KCoreUnroll).map(peel).mkString(",")}
        SELECT src AS id, count(*)::BIGINT AS core_deg
        FROM e$KCoreUnroll GROUP BY src"""
      }),

    // ----------------------- multi-source BFS distances (blast radius)
    // Hop distance from the BUILDING customer segment over the same
    // bipartite customer–supplier purchase graph as gr_pagerank:
    // "which suppliers are 1 hop (direct), 3 hops (friend-of-friend)
    // from the segment" — the influence-horizon query. Seeds restrict
    // to vertices actually present in the graph (a segment customer
    // who never ordered has no position in it). Distances are exact
    // integers; the oracle recomputes them with a recursive-CTE
    // reachability and takes min(d) per vertex — a different algorithm
    // arriving at the same unique fixpoint.
    QueryDef(
      "gr_bfs_dist",
      (spark, dir) => {
        val edges = purchaseEdges(spark, dir)
        val verts = edges.select(col("src").as("id")).distinct()
        val seeds = Tables.customer(spark, dir)
          .where("c_mktsegment = 'BUILDING'")
          .selectExpr("c_custkey * 2 AS id")
          .join(verts, "id")
        bfsDistances(edges, seeds, maxHops = 4)
          .selectExpr("id",
            "CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind",
            "id div 2 AS key", "dist")
      },
      Some("""
        WITH RECURSIVE cs AS (
          SELECT DISTINCT o_custkey * 2 AS cv, l_suppkey * 2 + 1 AS sv
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (
          SELECT cv AS src, sv AS dst FROM cs
          UNION ALL
          SELECT sv AS src, cv AS dst FROM cs),
        v AS (SELECT DISTINCT src AS id FROM edges),
        seeds AS (
          SELECT id FROM v
          WHERE id IN (SELECT c_custkey * 2 FROM customer
                       WHERE c_mktsegment = 'BUILDING')),
        reach(id, d) AS (
          SELECT id, 0 FROM seeds
          UNION
          SELECT e.dst, r.d + 1
          FROM reach r JOIN edges e ON e.src = r.id
          WHERE r.d < 4)
        SELECT id,
               CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               id // 2 AS key, min(d)::BIGINT AS dist
        FROM reach
        GROUP BY id""")),

    // -------------------- community detection (label propagation)
    // Synchronous label propagation over the purchase graph, made
    // deterministic and integer-exact: every vertex starts as its own
    // community (label = id), and each of 5 fixed rounds every vertex
    // adopts the most frequent label among its neighbors, ties broken
    // by SMALLEST label — a total order, so the fixpoint prefix is
    // bit-identical across engines and layouts (the gr_pagerank
    // discipline; no convergence semantics to negotiate, fixed rounds
    // like the oracle). Per round: the stationary edge checkpoint
    // streams against the shuffled O(V) label table (shuffle_hash, no
    // per-round edge exchange or sort — checkpointHashPartitioned),
    // one (dst, lbl) count aggregate bounded by E, and the argmax
    // folds as max(struct(count, -label)) — one hash aggregate, no
    // window over the corpus. Output: each vertex's community and the
    // community's size.
    QueryDef(
      "gr_labelprop",
      (spark, dir) => {
        val labels = propagatedLabels(spark, dir)
        val sizes = labels.groupBy("lbl")
          .agg(expr("cast(count(*) AS bigint) AS n_members"))
        labels.join(sizes, "lbl")
          .selectExpr("id",
            "CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind",
            "id div 2 AS key", "lbl AS community", "n_members")
      },
      Some(s"""
        WITH $labelChainSql,
        sizes AS (SELECT lbl, count(*)::BIGINT AS n_members FROM l5 GROUP BY lbl)
        SELECT l.id,
               CASE WHEN l.id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               l.id // 2 AS key, l.lbl AS community, s.n_members
        FROM l5 l JOIN sizes s ON s.lbl = l.lbl"""),
      resetMemo = Some((s, d) => resetPropagatedLabels(s, d))),

    // ---------------- modularity of the propagated communities
    // The quality score for gr_labelprop's output — Newman modularity
    // Q = Σ_c (e_c/|E| − (d_c/|E|)²) over the symmetric edge list, in
    // exact integer arithmetic: intra fraction in ppm (10⁶ div), the
    // expected fraction as squared per-mille (so d_c² never overflows
    // a 64-bit lane at any SF — (d·10³ div |E|)² IS ppm), both
    // identical op sequences cross-engine. Per-community contribution
    // rows plus the '-1 summary' carrying Q itself. Scale shape: the
    // label table is memoized and shared with gr_labelprop (the
    // purchaseEdges holder discipline); scoring is two E-bounded
    // hash joins of edges against the O(V) labels (src label, dst
    // label) and community-bounded aggregates — nothing wider than
    // one labelprop round.
    QueryDef(
      "gr_modularity",
      (spark, dir) =>
        modularityOf(propagatedLabels(spark, dir), purchaseEdges(spark, dir)),
      Some(s"""
        WITH $labelChainSql,
        lab AS (SELECT id, lbl FROM l5),
        m AS (SELECT count(*)::BIGINT AS ne FROM edges),
        intra AS (
          SELECT a.lbl, count(*)::BIGINT AS in_e
          FROM edges e
          JOIN lab a ON e.src = a.id
          JOIN lab b ON e.dst = b.id AND a.lbl = b.lbl
          GROUP BY a.lbl),
        deg AS (
          SELECT l.lbl, count(*)::BIGINT AS d
          FROM edges e JOIN lab l ON e.src = l.id GROUP BY l.lbl),
        per AS (
          SELECT deg.lbl AS community,
                 coalesce(in_e, 0)::BIGINT AS in_edges, d AS degree,
                 (coalesce(in_e, 0) * 1000000 // ne
                  - (d * 1000 // ne) * (d * 1000 // ne))::BIGINT AS q_ppm
          FROM deg LEFT JOIN intra ON intra.lbl = deg.lbl, m)
        SELECT community, in_edges, degree, q_ppm FROM per
        UNION ALL
        SELECT -1, sum(in_edges)::BIGINT, sum(degree)::BIGINT, sum(q_ppm)::BIGINT FROM per""")),

    // ---------------- degree assortativity (graph-structure fingerprint)
    // Newman's r over the purchase graph: do high-degree vertices
    // attach to high-degree vertices? The moments Σjk, Σ(j+k),
    // Σ(j²+k²) over the symmetric directed edge list are EXACT 64-bit
    // integers (j, k are degrees; the sums bounded by E·deg² — inside
    // bigint for ~10⁹-edge shards); only the final coefficient
    // (4M·Σjk − B²) / (2M·ΣC − B²) is one fixed-op-order double — the
    // bm25/ln discipline — because B² escapes 64 bits at cluster
    // scale. Bipartite purchase graphs skew negative (customers attach
    // to suppliers, never to each other) — the structural fingerprint
    // a graph-data release ships next to modularity. Scale shape: one
    // degree aggregate, two E-bounded joins of edges against the O(V)
    // degree table, one scalar row out.
    QueryDef(
      "gr_assortativity",
      (spark, dir) => {
        val e = purchaseEdges(spark, dir)
        val deg = e.groupBy("src").agg(expr("cast(count(*) AS bigint) AS d"))
        e.join(deg.selectExpr("src", "d AS dj"), "src")
          .join(deg.selectExpr("src AS dst", "d AS dk"), "dst")
          .groupBy()
          .agg(
            expr("cast(count(*) AS bigint) AS m_edges"),
            expr("cast(sum(dj * dk) AS bigint) AS sum_jk"),
            expr("cast(sum(dj + dk) AS bigint) AS sum_j_plus_k"),
            expr("cast(sum(dj * dj + dk * dk) AS bigint) AS sum_j2_k2"))
          .selectExpr("m_edges", "sum_jk", "sum_j_plus_k", "sum_j2_k2",
            """round((4.0D * cast(m_edges AS double) * cast(sum_jk AS double)
                      - cast(sum_j_plus_k AS double) * cast(sum_j_plus_k AS double))
                     / (2.0D * cast(m_edges AS double) * cast(sum_j2_k2 AS double)
                        - cast(sum_j_plus_k AS double) * cast(sum_j_plus_k AS double)), 6) AS r6""")
      },
      Some("""
        WITH cs AS (
          SELECT DISTINCT o_custkey * 2 AS cv, l_suppkey * 2 + 1 AS sv
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (
          SELECT cv AS src, sv AS dst FROM cs
          UNION ALL
          SELECT sv AS src, cv AS dst FROM cs),
        deg AS (SELECT src, count(*)::BIGINT AS d FROM edges GROUP BY src),
        mom AS (
          SELECT count(*)::BIGINT AS m_edges,
                 sum(j.d * k.d)::BIGINT AS sum_jk,
                 sum(j.d + k.d)::BIGINT AS sum_j_plus_k,
                 sum(j.d * j.d + k.d * k.d)::BIGINT AS sum_j2_k2
          FROM edges e
          JOIN deg j ON e.src = j.src
          JOIN deg k ON e.dst = k.src)
        SELECT m_edges, sum_jk, sum_j_plus_k, sum_j2_k2,
               round((4.0 * m_edges::DOUBLE * sum_jk::DOUBLE
                      - sum_j_plus_k::DOUBLE * sum_j_plus_k::DOUBLE)
                     / (2.0 * m_edges::DOUBLE * sum_j2_k2::DOUBLE
                        - sum_j_plus_k::DOUBLE * sum_j_plus_k::DOUBLE), 6) AS r6
        FROM mom""")),

    // ------------- community conductance (the cut-quality complement)
    // gr_modularity scores how much BETTER than random each community's
    // internal density is; conductance φ(C) = cut(C) / min(vol(C),
    // vol(rest)) scores how LEAKY its boundary is — the metric sparse-
    // cut theory (Cheeger) and every graph-partitioner report next to
    // Q. Over the directed-symmetric edge rows: cut(C) counts rows
    // whose SOURCE is in C and destination is not (each undirected cut
    // edge once from C's side), vol(C) is the member out-degree mass
    // via the same fold-E-to-degrees-first shape the r14 modularity
    // profile forced (never a second E-join per consumer), and φ is
    // exact integer ppm with the min() in directed-row units. Shares
    // the memoized label table with gr_labelprop/gr_modularity and the
    // labelChainSql oracle — three community queries, one propagation.
    // Scale shape: two E-bounded joins (cut needs both endpoints'
    // labels), one O(V) degree fold, communities-bounded output.
    QueryDef(
      "gr_conductance",
      (spark, dir) => {
        val lab = propagatedLabels(spark, dir).toDF("id", "lbl")
        val e = purchaseEdges(spark, dir).toDF("src", "dst")
        val ne = e.groupBy().agg(expr("cast(count(*) AS bigint) AS ne"))
        val cut = e
          .join(lab.selectExpr("id AS src", "lbl AS sl"), "src")
          .join(lab.selectExpr("id AS dst", "lbl AS dl"), "dst")
          .where("sl != dl")
          .groupBy("sl").agg(expr("cast(count(*) AS bigint) AS cut_e"))
        val vol = e.groupBy("src").agg(expr("cast(count(*) AS bigint) AS vd"))
          .join(lab.selectExpr("id AS src", "lbl"), "src")
          .groupBy("lbl").agg(expr("cast(sum(vd) AS bigint) AS vol"))
        vol
          .join(cut.selectExpr("sl AS lbl", "cut_e"), Seq("lbl"), "left")
          .crossJoin(broadcast(ne))
          .selectExpr("lbl AS community",
            "coalesce(cut_e, 0L) AS cut_edges", "vol AS volume",
            """CASE WHEN least(vol, ne - vol) = 0 THEN 0L
                    ELSE coalesce(cut_e, 0L) * 1000000 div least(vol, ne - vol)
               END AS phi_ppm""")
      },
      Some(s"""
        WITH $labelChainSql,
        lab AS (SELECT id, lbl FROM l5),
        m AS (SELECT count(*)::BIGINT AS ne FROM edges),
        cut AS (
          SELECT a.lbl, count(*)::BIGINT AS cut_e
          FROM edges e
          JOIN lab a ON e.src = a.id
          JOIN lab b ON e.dst = b.id AND a.lbl != b.lbl
          GROUP BY a.lbl),
        vol AS (
          SELECT l.lbl, sum(vd)::BIGINT AS vol
          FROM (SELECT src, count(*)::BIGINT AS vd FROM edges GROUP BY src) d
          JOIN lab l ON d.src = l.id GROUP BY l.lbl)
        SELECT vol.lbl AS community,
               coalesce(cut_e, 0)::BIGINT AS cut_edges,
               vol AS volume,
               CASE WHEN least(vol, ne - vol) = 0 THEN 0
                    ELSE coalesce(cut_e, 0) * 1000000 // least(vol, ne - vol)
               END::BIGINT AS phi_ppm
        FROM vol LEFT JOIN cut ON cut.lbl = vol.lbl, m""")),

    // ------------------- HITS hubs & authorities (bipartite ranking)
    // Kleinberg's HITS over the DIRECTED customer→supplier purchase
    // edges (the natural bipartite reading: hub customers aggregate
    // many good suppliers, authority suppliers aggregate many good
    // customers — where PageRank measures stationary mass, HITS
    // separates the two roles). Mutual recursion a = Eᵀh, h = Ea for
    // 8 rounds; the usual L2 normalization is replaced by integer
    // MAX-normalization to ppm (score·10⁶ div round-max) — same
    // fixpoint direction, exact 64-bit arithmetic, bit-identical
    // cross-engine (the PageRank ppm discipline; per-round sums stay
    // under 10¹⁷ for in-degrees ≲ 10⁵ per mille-scaled step — re-range
    // before the multiply if a deployment's hubs exceed that). Scale
    // shape: the pageRank loop machinery verbatim — the E-sized edge
    // table is checkpointHashPartitioned ONCE per join side (src for
    // the authority step, dst for the hub step) and never re-shuffles;
    // each round moves only the O(V) score tables (shuffle_hash
    // hints), the round max is a 1-row broadcast, and the whole walk
    // runs under withIterConf with periodic O(V) fences.
    QueryDef(
      "gr_hits",
      (spark, dir) => hits(purchaseEdges(spark, dir)),
      Some {
        val iter = (i: Int) => s"""
        ar$i AS MATERIALIZED (
          SELECT e.dst, sum(h.h)::BIGINT AS ar
          FROM cs e JOIN hc${i - 1} h ON e.src = h.id GROUP BY e.dst),
        am$i AS (SELECT max(ar) AS am FROM ar$i),
        an$i AS MATERIALIZED (
          SELECT dst AS id, (ar * 1000000 // am)::BIGINT AS a FROM ar$i, am$i),
        hr$i AS MATERIALIZED (
          SELECT e.src, sum(an.a)::BIGINT AS hr
          FROM cs e JOIN an$i an ON e.dst = an.id GROUP BY e.src),
        hm$i AS (SELECT max(hr) AS hm FROM hr$i),
        hc$i AS MATERIALIZED (
          SELECT src AS id, (hr * 1000000 // hm)::BIGINT AS h FROM hr$i, hm$i)"""
        s"""
        WITH cs AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        hc0 AS (SELECT DISTINCT src AS id, 1000000::BIGINT AS h FROM cs),
        ${(1 to HitsIters).map(iter).mkString(",")}
        SELECT id, 'customer' AS kind, id // 2 AS key, h AS score_ppm FROM hc$HitsIters
        UNION ALL
        SELECT id, 'supplier' AS kind, id // 2 AS key, a AS score_ppm FROM an$HitsIters"""
      }),

    // ----------------- link prediction (common neighbors + RA index)
    // "Which supplier pairs are most likely to be related?" — scored
    // by shared customers: common-neighbor count plus the
    // resource-allocation index Σ_z 1/deg(z) over shared customers z
    // (Zhou et al. 2009 — the stronger LP baseline because a shared
    // customer who buys from everyone is weak evidence). RA folds in
    // integer ppm (10⁶ div deg — exact, order-independent), so the
    // ranking is hash-stable. Scale shape: the dd_ngram_jaccard
    // discipline on a graph — hub customers above the degree cap are
    // DROPPED before the wedge join (standard LP practice: a
    // 10⁶-degree hub contributes ~0 RA mass but 10¹² wedges), so the
    // pair space is bounded by cap·|edges|, and the fenced edge list
    // feeds the degree counter and both wedge sides without rescans.
    QueryDef(
      "gr_linkpred",
      (spark, dir) => {
        val kept = linkpredKept(spark, dir)
        // shuffle_hash: both sides are the same advertised-c-layout
        // checkpoint, so the join is exchange-free; the hint keeps it
        // sort-free too (default SMJ would sort the checkpoint twice)
        kept.selectExpr("c", "s AS s_a", "dc")
          .join(kept.selectExpr("c", "s AS s_b").hint("shuffle_hash"),
            Seq("c"))
          .where("s_a < s_b")
          // shuffle the RAW wedge rows by pair BEFORE aggregating: a
          // supplier pair recurs only once per shared customer, so the
          // map-side partial aggregate's dedup bet loses — at sf10 its
          // per-task hash map over the pair space spilled 67 GB (78% of
          // the query, exponent 1.6; profile_sf10_linkpred). With the
          // explicit pair exchange the aggregate runs ONCE, on its own
          // partition's 1/Par of the pair space (the final-agg stage
          // that never spilled), and the shuffle carries wedge rows
          // that partial aggregation was barely shrinking anyway.
          // Shuffle count is unchanged (1 either way).
          .repartition(spark.sessionState.conf.numShufflePartitions,
            col("s_a"), col("s_b"))
          .groupBy("s_a", "s_b")
          .agg(
            expr("cast(count(*) AS bigint) AS common_cust"),
            expr("cast(sum(1000000L div dc) AS bigint) AS ra_ppm"))
          .orderBy(org.apache.spark.sql.functions.desc("common_cust"),
            org.apache.spark.sql.functions.desc("ra_ppm"),
            org.apache.spark.sql.functions.col("s_a"),
            org.apache.spark.sql.functions.col("s_b"))
          .limit(20)
      },
      Some(s"""
        WITH cs AS (
          SELECT DISTINCT o_custkey AS c, l_suppkey AS s
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        deg AS (
          SELECT c, count(*)::BIGINT AS dc FROM cs GROUP BY c
          HAVING count(*) <= 50),
        kept AS (SELECT cs.c, cs.s, deg.dc FROM cs JOIN deg USING (c))
        SELECT a.s AS s_a, b.s AS s_b,
               count(*)::BIGINT AS common_cust,
               sum(1000000 // a.dc)::BIGINT AS ra_ppm
        FROM kept a JOIN kept b ON a.c = b.c AND a.s < b.s
        GROUP BY a.s, b.s
        ORDER BY common_cust DESC, ra_ppm DESC, s_a, s_b
        LIMIT 20""")),

    // --------------- deterministic random walks (embedding data prep)
    // The data half of DeepWalk/node2vec (Perozzi et al. 2014; Grover &
    // Leskovec 2016): fixed-length walks from a seed set, the corpus a
    // skip-gram embedder then trains on. The RNG is replaced by the
    // engine's md5 discipline — step t of walk w moves to neighbor
    // rank md5(w:t) mod outdeg, where ranks order neighbors by vertex
    // id — so walks are retry-stable, engine-identical, and any walk
    // is independently recomputable from (walk_id) alone, the property
    // that lets a 100 TB walk corpus regenerate lost shards instead of
    // storing them. Plan: the ranked adjacency (one row_number window
    // over the src-sharded edge exchange) and the degree table
    // checkpoint once and serve all 4 unrolled steps; each step is ONE
    // hash join of the seeds-bounded frontier against adjacency — no
    // global state, no iteration-depth plan growth at L=4. Oracle =
    // a recursive CTE replaying the identical md5 choice.
    QueryDef(
      "gr_walks",
      (spark, dir) => {
        val edges = purchaseEdges(spark, dir)
        // per-vertex SORTED neighbor arrays, not a row_number-ranked
        // edge table: one groupBy exchange builds V rows (vs a window
        // sort over E), and each step's rank pick is a row-local
        // element_at instead of an E-row rn filter — measured 40.6 s →
        // the array form at sf10 for identical output
        val adjArr = edges.groupBy("src")
          .agg(expr("array_sort(collect_list(dst)) AS ns"))
          .selectExpr("src", "ns", "cast(size(ns) AS bigint) AS outdeg")
          .fenced
        val seeds = edges.select(col("src").as("id")).distinct()
          .where("id % 101 = 0")
        var frontier = seeds.selectExpr("id AS walk_id", "id AS cur")
        var out = frontier.selectExpr("walk_id", "0L AS step", "cur AS vertex")
        for (t <- 1 to 4) {
          frontier = frontier.join(adjArr, frontier("cur") === adjArr("src"))
            .selectExpr("walk_id",
              s"element_at(ns, cast(cast(conv(substring(md5(concat(cast(walk_id AS string), ':', '$t')), 1, 15), 16, 10) AS bigint) % outdeg AS int) + 1) AS cur")
          out = out.unionByName(frontier.selectExpr("walk_id", s"${t}L AS step", "cur AS vertex"))
        }
        out.selectExpr("walk_id", "step",
          "CASE WHEN vertex % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind",
          "vertex div 2 AS key")
      },
      Some("""
        WITH RECURSIVE cs AS (
          SELECT DISTINCT o_custkey * 2 AS cv, l_suppkey * 2 + 1 AS sv
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (
          SELECT cv AS src, sv AS dst FROM cs
          UNION ALL
          SELECT sv AS src, cv AS dst FROM cs),
        adj AS (
          SELECT src, dst,
                 row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
          FROM edges),
        deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
        seeds AS (SELECT DISTINCT src AS id FROM edges WHERE src % 101 = 0),
        walk(walk_id, step, vertex) AS (
          SELECT id, 0::BIGINT, id FROM seeds
          UNION ALL
          SELECT w.walk_id, w.step + 1, a.dst
          FROM walk w
          JOIN deg d ON d.src = w.vertex
          JOIN adj a ON a.src = w.vertex
           AND a.rn - 1 = ('0x' || substr(md5(w.walk_id::VARCHAR || ':' || (w.step + 1)::VARCHAR), 1, 15))::BIGINT % d.outdeg
          WHERE w.step < 4)
        SELECT walk_id, step,
               CASE WHEN vertex % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               vertex // 2 AS key
        FROM walk"""))
  )

  /** gr_linkpred's fenced wedge-join input: the distinct
    * customer↔supplier edge list with hub customers above the degree
    * cap dropped (standard LP practice: a 10⁶-degree hub contributes
    * ~0 RA mass but 10¹² wedges), so the pair space is bounded by
    * cap·|edges|. Widened BEFORE the fence: the r9 profile showed the
    * wedge join running on 4 AQE-coalesced tasks (max task 1.4 s) —
    * the pair expansion is the query's dominant work and wants every
    * core, so the width tracks the session's shuffle parallelism (the
    * builder pins it to cores; on a real cluster it scales with the
    * executor count instead of capping at a constant).
    * Checkpointing AFTER the repartition preserves the layout so both
    * self-join sides are already co-partitioned on c.
    */
  private[graft] def linkpredKept(spark: SparkSession, dir: String): DataFrame = {
    val cap = 50
    val cs = Tables.orders(spark, dir).selectExpr("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, dir).selectExpr("l_orderkey", "l_suppkey"),
        expr("o_orderkey = l_orderkey"))
      .selectExpr("o_custkey AS c", "l_suppkey AS s")
      .distinct()
      .fenced // degree counter + both wedge sides
    val deg = cs.groupBy("c").agg(expr("cast(count(*) AS bigint) AS dc"))
      .where(s"dc <= $cap")
    // checkpointHashPartitioned, not repartition+fenced: a plain fence
    // FORGETS the c-layout, so both wedge self-join sides re-exchanged
    // the kept table and re-read its 36 MB of blocks through separate
    // shuffle stages (r17 profile: two ~6-8 s-task-time scan+shuffle
    // stages feeding the join). With the layout advertised the
    // self-join consumes the checkpoint in place, exchange-free.
    checkpointHashPartitioned(cs.join(deg, "c"),
      spark.sessionState.conf.numShufflePartitions, "c")
  }

  /** k-core decomposition membership: iteratively peel vertices of
    * degree < k until the remaining subgraph is stable, returning each
    * surviving vertex with its degree INSIDE the core. The standard
    * cohesion filter before community detection — pendant chains and
    * sparse fringe collapse away, only the mutually-dense region
    * survives.
    *
    * Scale shape: the same BSP schedule as connectedComponents — each
    * round one degree aggregate plus two semi-join filters of the edge
    * list against the (shrinking) keep set, `localCheckpoint`-fenced so
    * the logical plan stays O(1) per round and each round's input is
    * the materialized previous round, never replayed lineage. Rounds
    * are O(peel depth) (degeneracy ordering length, a graph property —
    * not corpus size); the edge list only ever shrinks.
    */
  private[graft] def kCore(edges: DataFrame, k: Int): DataFrame =
    kCoreWithDepth(edges, k)._1

  /** gr_kcore's input: the 1996-shipments part co-purchase graph as a
    * simple undirected `(a, b)`, `a < b` edge list — factored from the
    * QueryDef so the plan-evidence seam peels the same graph.
    */
  private[graft] def kcoreEdges(spark: SparkSession, dir: String): DataFrame = {
    val os = Tables.lineitem(spark, dir)
      .where("l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'")
      .selectExpr("l_orderkey AS ok", "l_partkey AS s").distinct()
    os.selectExpr("ok", "s AS a")
      .join(os.selectExpr("ok", "s AS b"), "ok")
      .where("a < b").select("a", "b").distinct()
  }

  /** Oracle-side fixed unroll for gr_kcore. Any value ≥ the true peel
    * depth is output-identical (peeling is idempotent at the fixpoint);
    * GraphSpec asserts measured depth ≤ this − 10 so corpus growth
    * surfaces as a named assertion instead of a bare gate hash miss.
    */
  private[graft] val KCoreUnroll = 60

  /** [[kCore]] plus the measured peel depth (waves that removed at
    * least one vertex) — the depth is what bounds the oracle's fixed
    * unroll.
    *
    * r17: DELTA PEELING. The r16 shape re-derived the whole state
    * every wave — an O(E) degree aggregate, two O(E) semi-joins, an
    * O(E) re-shuffle, and an O(E) re-checkpoint, × peel-depth waves.
    * The delta form keeps the both-directions edge list STATIONARY
    * for the entire peel (checkpointed once, laid out by dst) and
    * maintains only the V-sized live-degree table: each wave takes
    * the just-removed vertex set `rm` (vertices whose maintained
    * degree fell below k), probes the stationary fence with it
    * exchange-free (rm repartitions to the fence's dst layout — the
    * only per-wave exchanges are the O(frontier) rm table and the
    * matched-edge partial aggregate), and decrements survivors'
    * degrees by their edge count into `rm`. Every edge is matched in
    * EXACTLY the wave its dst is removed, so total per-wave join
    * output across the whole peel is ≤ 2·E — the r16 shape shuffled
    * and re-wrote Θ(E · depth). Equivalence to recount-from-scratch:
    * a survivor's induced-subgraph degree = initial degree − edges
    * into removed vertices, accumulated wave by wave; edges whose
    * OTHER endpoint was removed earlier produce delta rows for
    * removed sources, which the survivors-only join-back drops. The
    * peel-frontier count rides each wave's fence as an observed
    * metric, and termination (rm = 0) is known from the fence that
    * produced the state — no extra job.
    */
  private[graft] def kCoreWithDepth(edges: DataFrame, k: Int): (DataFrame, Int) = {
    val spark = edges.sparkSession
    val wMax = spark.sessionState.conf.numShufflePartitions
    // SCALE-ADAPTIVE wave width (guide §2: derive partitioning from
    // input size, never a constant tuned for one deployment): the
    // peel runs O(depth) waves of stages over the stationary fence
    // and the V-sized degree table, and a width fixed at the session
    // parallelism makes every tiny wave pay 32-task scheduling for
    // kilobytes of state (first delta cut measured 6.7 s vs 4.7 s
    // baseline solo at sf0.1 from exactly that). ~250k edge rows per
    // task, clamped to the session parallelism: sf0.1 → 1, sf10 → a
    // dozen, production → the full cluster width. The count that
    // feeds the sizing rides the one-time full-width materialization
    // of the wedge join; when the adaptive width equals the session
    // width (every at-scale run) the re-layout below is skipped, so
    // the sizing costs nothing there, and at tiny SFs the re-layout
    // is a block-to-block copy of a few MB.
    val obsE = org.apache.spark.sql.Observation("kcore_edges")
    var eDst = checkpointHashPartitioned(
      edges.selectExpr("a AS src", "b AS dst")
        .unionByName(edges.selectExpr("b AS src", "a AS dst"))
        .observe(obsE, expr("count(*) AS n")),
      wMax, "dst")
    val nE = obsE.get("n").asInstanceOf[Long]
    val w = math.max(1L, math.min(wMax.toLong, nE / 250000L + 1L)).toInt
    if (w != wMax) {
      val wide = eDst
      eDst = checkpointHashPartitioned(wide, w, "dst")
      release(wide)
    }
    val obs0 = org.apache.spark.sql.Observation("kcore_rm_0")
    var deg = checkpointHashPartitioned(
      eDst.groupBy("src").agg(expr("cast(count(*) AS bigint) AS d"))
        .observe(obs0, expr(s"count_if(d < $k) AS rm")),
      w, "src")
    var nRm = obs0.get("rm").asInstanceOf[Long]
    var depth = 0
    // only the WAVES run under the iteration confs: the one-time setup
    // above (the wedge-join materialization — the query's real compute)
    // wants codegen and AQE; the waves are fresh tiny plans per round
    // where per-round Janino compiles and AQE re-optimization are the
    // dominant cost (the pageRank-family measurement)
    withIterConf(spark) {
    while (nRm > 0) {
      depth += 1
      val wave = kcoreWave(eDst, deg, k, w)
      val obs = org.apache.spark.sql.Observation(s"kcore_rm_$depth")
      val degNew = checkpointHashPartitioned(
        wave.observe(obs, expr(s"count_if(d < $k) AS rm")), w, "src")
      nRm = obs.get("rm").asInstanceOf[Long]
      release(deg) // superseded live-degree table (degNew materialized)
      deg = degNew
    }
    val out = deg.selectExpr("src AS id", "d AS core_deg").fenced
    release(deg); release(eDst)
    (out, depth)
    }
  }

  /** One lazy delta-peel wave (pre-observe, pre-fence): the vertices
    * whose maintained degree fell below k probe the stationary
    * dst-partitioned edge fence (exchange-free after rm's own tiny
    * repartition), the matched edges aggregate per surviving source,
    * and survivors' degrees decrement. Shared by the loop and
    * [[kcoreRoundPlanForSpec]].
    */
  private def kcoreWave(eDst: DataFrame, deg: DataFrame, k: Int,
                        w: Int): DataFrame = {
    val rm = deg.where(s"d < $k").selectExpr("src AS dst")
      .repartition(w, col("dst"))
    val delta = eDst.join(rm.hint("shuffle_hash"), "dst")
      .groupBy("src").agg(expr("cast(count(*) AS bigint) AS dd"))
    deg.where(s"d >= $k")
      .join(delta.hint("shuffle_hash"), Seq("src"), "left")
      .selectExpr("src", "d - coalesce(dd, 0L) AS d")
  }

  /** One delta-peel wave's executed-plan string — plan evidence for
    * the fenced loop, built on the same stationary dst-layout edge
    * fence and live-degree checkpoint the loop maintains.
    */
  private[graft] def kcoreRoundPlanForSpec(edges: DataFrame, k: Int): String = {
    val spark = edges.sparkSession
    val w = spark.sessionState.conf.numShufflePartitions
    val eDst = checkpointHashPartitioned(
      edges.selectExpr("a AS src", "b AS dst")
        .unionByName(edges.selectExpr("b AS src", "a AS dst")), w, "dst")
    val deg = checkpointHashPartitioned(
      eDst.groupBy("src").agg(expr("cast(count(*) AS bigint) AS d")), w, "src")
    val obs = org.apache.spark.sql.Observation("kcore_rm_spec")
    val s = kcoreWave(eDst, deg, k, w)
      .observe(obs, expr(s"count_if(d < $k) AS rm"))
      .queryExecution.executedPlan.toString
    release(deg); release(eDst)
    s
  }

  /** Multi-source BFS hop distances over a directed edge list — the
    * "how far is everything from this segment" primitive behind blast-
    * radius, influence-horizon, and recommendation-depth questions.
    * Frontier-expansion BSP: per hop, ONE equi-join of the (shrinking)
    * frontier against the once-partitioned edge list plus one anti-join
    * against the known set; the edge side never re-shuffles (the
    * pageRank discipline), every round is localCheckpoint-fenced so
    * lineage stays O(1), and an empty frontier exits early (the fixed
    * `maxHops` keeps the output deterministic either way — hop counts
    * are exact integers, nothing to converge).
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    val w = spark.sessionState.conf.numShufflePartitions
    // src-layout ADVERTISED (r17): the old repartition+plain-fence
    // forgot the partitioning, so every hop re-exchanged the O(E)
    // edge table to join the frontier (profiled at sf0.1: one 9 MB
    // edge shuffle per hop). With the layout advertised only the
    // O(frontier) side moves per hop — the pageRank discipline,
    // actually enforced.
    val e = checkpointHashPartitioned(edges.toDF("src", "dst"), w, "src")
    var known = seeds.toDF("id").distinct()
      .withColumn("dist", lit(0L))
      .repartition(col("id")).fenced
    var frontier = known
    var h = 0
    var empty = frontier.isEmpty
    while (h < maxHops && !empty) {
      h += 1
      // frontier size rides the fence job (observed metric) instead of
      // a separate isEmpty job per hop
      val obs = org.apache.spark.sql.Observation(s"bfs_n_$h")
      val next = e.join(frontier.selectExpr("id AS src")
            .repartition(w, col("src")).hint("shuffle_hash"), "src")
        .selectExpr("dst AS id").distinct()
        .join(known.select("id"), Seq("id"), "left_anti")
        .withColumn("dist", lit(h.toLong))
        .observe(obs, expr("count(*) AS n"))
        .fenced
      empty = obs.get("n").asInstanceOf[Long] == 0L
      if (!empty) {
        val grown = known.unionByName(next).repartition(col("id")).fenced
        release(known) // superseded accumulator (grown is materialized)
        if (frontier ne known) release(frontier) // h=1: same fence, once
        known = grown
        frontier = next
      } else {
        release(next) // the empty terminal frontier's zero-row blocks
      }
    }
    if (frontier ne known) release(frontier)
    release(e)
    known
  }

  /** Degree-ordered triangle counting over an undirected simple edge
    * list `(a, b)` with a < b. Returns top-20 'vertex' rows (triangle
    * participation + local clustering ppm) and one 'graph' row
    * (id = -1: edge count, global transitivity ppm). See the
    * gr_triangles QueryDef comment for the scale argument: orientation
    * by (degree, id) bounds the wedge join's per-vertex fan-out by the
    * graph's arboricity, so no hub vertex can explode the pair space.
    */
  private[graft] def triangleReport(edges: DataFrame): DataFrame = {
    // deg is consumed 4× (both orientation joins, the per-vertex join,
    // the global stats) and oriented 3× (twice in the wedge self-join,
    // once in the closure probe). Without a fence each consumer
    // re-computes the whole subtree INCLUDING its broadcast builds —
    // profiled at sf0.1 as a 14-sequential-broadcast-job chain where
    // wall (3.1 s) ran 3× the actual task work (0.9 s). localCheckpoint
    // is the same lineage discipline pageRank/kCore already apply:
    // deg is O(V); oriented is O(E), the price every multi-pass
    // consumer of an edge list pays once instead of per pass.
    val deg = edges.selectExpr("a AS v").unionByName(edges.selectExpr("b AS v"))
      .groupBy("v").agg(expr("cast(count(*) AS bigint) AS d"))
      .fenced
    val oriented = edges
      .join(deg.selectExpr("v AS a", "d AS da"), "a")
      .join(deg.selectExpr("v AS b", "d AS db"), "b")
      .selectExpr(
        "CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS src",
        "CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS dst",
        "CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS dd")
      .fenced
    val tri = oriented.selectExpr("src", "dst AS v", "dd AS dv")
      .join(oriented.selectExpr("src", "dst AS w", "dd AS dw"), "src")
      .where("dv < dw OR (dv = dw AND v < w)")
      .join(oriented.selectExpr("dst AS w", "src AS v"), Seq("v", "w"))
      .selectExpr("src AS u", "v", "w")
    val perVertex = tri.selectExpr("u AS id")
      .unionByName(tri.selectExpr("v AS id"))
      .unionByName(tri.selectExpr("w AS id"))
      .groupBy("id").agg(expr("cast(count(*) AS bigint) AS n_tri"))
      .join(deg.selectExpr("v AS id", "d"), "id")
      .selectExpr("'vertex' AS scope", "id", "d AS degree", "n_tri",
        "(2000000L * n_tri) div (d * (d - 1)) AS ppm")
      .orderBy(expr("n_tri").desc, expr("id")).limit(20)
    val global = tri.agg(expr("cast(count(*) AS bigint) AS t"))
      .crossJoin(broadcast(deg.agg(
        expr("cast(sum(d) AS bigint) div 2 AS m"),
        expr("cast(sum(d * (d - 1)) AS bigint) div 2 AS wedges"))))
      .selectExpr("'graph' AS scope", "-1L AS id", "m AS degree", "t AS n_tri",
        "(3000000L * t) div wedges AS ppm")
    perVertex.unionByName(global)
  }
}
