package graft.operators

import org.apache.spark.sql.graft.CheckpointOps.FenceSyntax
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search — the reference's query-execution layer (SURVEY.md
  * §2.4 V1–V4: embed → cosine kNN top-k, `src/vector_store.py:152-175`),
  * plus the scale-path extensions (batch kNN, IVF partition-pruned ANN,
  * deterministic hashed-n-gram embedding).
  *
  * Physical shape: the query vector(s) are BROADCAST (a few KB) so the
  * corpus scan stays shuffle-free; `ORDER BY sim DESC LIMIT k` plans as
  * TakeOrderedAndProject (per-partition heap + driver merge — no global
  * sort). That plan is identical at 100 TB: one pass over the vectors,
  * k rows back.
  */
object Knn {

  private val K = 5
  private val MmrPool = 20 // v10_mmr candidate pool
  // v12_knn_classify holdout cap: the query slice is vec_id % 23 = 0
  // AND vec_id < ClassifyBudget, so the broadcast query set is at most
  // ClassifyBudget/23 vectors (a constant) regardless of corpus size.
  private val ClassifyBudget = 4096L

  // ------------------------- random-hyperplane LSH (v4_lsh_ann) config
  // 4 bands × 8 sign-bits from 32 fixed Gaussian hyperplanes. The
  // planes are generated from a FIXED seed and inlined as %.6f literals
  // into BOTH engines' SQL (same discipline as the minhash coefficient
  // arrays) so the signatures cannot diverge.
  private val LshBandBits = 8
  private val LshBands = 4
  // private[graft]: Dedup's banded embedding near-dup reuses the SAME 32
  // fixed hyperplanes, regrouped as 16 bands × 2 bits (its cosine
  // threshold is far lower than an ANN probe's, so recall needs many
  // narrow bands instead of few wide ones)
  private[graft] val LshPlanes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(12345)
    Seq.fill(LshBands * LshBandBits)(Seq.fill(64)(rnd.nextGaussian()))
  }
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
  private[graft] def planeSpark(p: Seq[Double]): String =
    p.map(v => s"${fmt(v)}D").mkString("array(", ", ", ")")
  private[graft] def planeDuck(p: Seq[Double]): String =
    p.map(fmt).mkString("[", ", ", "]")
  /** Spark band value: 8 sign bits of dot(embedding, plane) packed LSB-first. */
  private def bandValSpark(b: Int): String =
    (0 until LshBandBits).map { j =>
      s"(CASE WHEN dot_f(embedding, ${planeSpark(LshPlanes(b * LshBandBits + j))}) > 0D THEN ${1L << j}L ELSE 0L END)"
    }.mkString("(", " + ", ")")
  private def bandValDuck(b: Int): String =
    (0 until LshBandBits).map { j =>
      val p = planeDuck(LshPlanes(b * LshBandBits + j))
      s"""(CASE WHEN list_sum(list_transform(generate_series(1, 64),
            i -> embedding[i]::DOUBLE * ($p)[i])) > 0 THEN ${1L << j} ELSE 0 END)"""
    }.mkString("(", " + ", ")")

  /** Cosine via the native codegen'd expression (graft.plans.CosineSim):
    * left-to-right double accumulation — value-identical to the
    * aggregate(zip_with(...)) formulation and the DuckDB oracle, but it
    * stays inside WholeStageCodegen instead of interpreting 3 lambda
    * folds per row.
    */
  private def cosExpr(a: String, b: String): String = s"cosine_f($a, $b)"

  private val duckCos: String =
    """list_sum(list_transform(generate_series(1, len(%A)), i -> %A[i]::DOUBLE * %B[i]::DOUBLE))
      |/ (sqrt(list_sum(list_transform(%A, x -> x::DOUBLE * x::DOUBLE)))
      |   * sqrt(list_sum(list_transform(%B, x -> x::DOUBLE * x::DOUBLE))))""".stripMargin
  private[graft] def dCos(a: String, b: String): String =
    duckCos.replace("%A", a).replace("%B", b)

  def queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------ V3: top-k cosine kNN
    // Query vector = embedding of vec_id 0 (a deterministic stand-in for
    // the reference's embedded query text). similarity = plain cosine
    // (reference's 1 - cosine_distance, may be negative,
    // src/vector_store.py:172). Tie-break on vec_id keeps the LIMIT set
    // deterministic across engines.
    QueryDef(
      "v3_knn_topk",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        val e = Tables.embeddings(spark, dir)
        val q = e.where("vec_id = 0").select(col("embedding").as("q_emb"))
        e.crossJoin(broadcast(q))
          .selectExpr("vec_id", s"round(${cosExpr("embedding", "q_emb")}, 6) AS similarity")
          .orderBy(desc("similarity"), col("vec_id"))
          .limit(K)
      },
      Some(s"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, round(${dCos("embedding", "q_emb")}, 6) AS similarity
        FROM embeddings, q
        ORDER BY similarity DESC, vec_id
        LIMIT $K""")),

    // ----------------------------------------- batch kNN (many queries)
    // 8 query vectors broadcast against the corpus; per-query top-k via a
    // rank window partitioned by query id. This is the bulk-scoring shape
    // of a training-data pipeline (score all candidates against a probe
    // set in one pass).
    QueryDef(
      "v3_knn_batch",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        val e = Tables.embeddings(spark, dir)
        val q = e.where("vec_id < 8")
          .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))
        e.crossJoin(broadcast(q))
          .where("vec_id != q_vec_id")
          .selectExpr("q_vec_id", "vec_id", s"round(${cosExpr("embedding", "q_emb")}, 6) AS similarity")
          .selectExpr(
            "q_vec_id", "vec_id", "similarity",
            s"""cast(row_number() OVER (PARTITION BY q_vec_id
                                        ORDER BY similarity DESC, vec_id) AS bigint) AS rank""")
          .where(s"rank <= $K")
      },
      Some(s"""
        WITH q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
        scored AS (
          SELECT q.q_vec_id, e.vec_id,
                 round(${dCos("e.embedding", "q.q_emb")}, 6) AS similarity
          FROM embeddings e, q
          WHERE e.vec_id != q.q_vec_id)
        SELECT q_vec_id, vec_id, similarity, rank
        FROM (SELECT q_vec_id, vec_id, similarity,
                     row_number() OVER (PARTITION BY q_vec_id
                                        ORDER BY similarity DESC, vec_id)::BIGINT AS rank
              FROM scored)
        WHERE rank <= $K""")),

    // ---------------- batch kNN via the typed bounded-heap Aggregator
    // Same result set as v3_knn_batch, computed through
    // TopK.TopKAggregator instead of a rank window: the window SORTS
    // every query's full candidate list after shuffling ALL of it; the
    // aggregator keeps ≤ k rows per query at every stage and
    // partial-merges map-side, so the shuffle carries k×queries rows —
    // at 100 TB, the difference between shuffling the corpus and
    // shuffling the answer. Oracle: identical SQL to the window form.
    QueryDef(
      "v3_knn_batch_agg",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        import spark.implicits._
        val e = Tables.embeddings(spark, dir)
        val q = e.where("vec_id < 8")
          .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))
        val scored = e.crossJoin(broadcast(q))
          .where("vec_id != q_vec_id")
          .selectExpr("q_vec_id", "vec_id", s"round(${cosExpr("embedding", "q_emb")}, 6) AS similarity")
          .as[(Long, Long, Double)]
        TopK.topKByKey(scored, K)
          .toDF("q_vec_id", "rank", "vec_id", "similarity")
          .select("q_vec_id", "vec_id", "similarity", "rank")
      },
      Some(s"""
        WITH q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
        scored AS (
          SELECT q.q_vec_id, e.vec_id,
                 round(${dCos("e.embedding", "q.q_emb")}, 6) AS similarity
          FROM embeddings e, q
          WHERE e.vec_id != q.q_vec_id)
        SELECT q_vec_id, vec_id, similarity, rank
        FROM (SELECT q_vec_id, vec_id, similarity,
                     row_number() OVER (PARTITION BY q_vec_id
                                        ORDER BY similarity DESC, vec_id)::BIGINT AS rank
              FROM scored)
        WHERE rank <= $K""")),

    // ------------------------------------ IVF-style partition-pruned ANN
    // Scale path for 100 TB: vectors are assigned to the nearest of a
    // small centroid set (here: the 8 vectors with vec_id < 8, a
    // deterministic stand-in for trained k-means centroids); at rest the
    // corpus is PARTITIONED BY cluster_id, so a query probes only its
    // cluster's partition (partition pruning does the index lookup).
    // This query materializes assignment + the pruned search for the
    // query vector vec_id 0.
    //
    // Assignment is ROW-LOCAL: the centroid set folds to ONE broadcast
    // row carrying a sorted array of (cent_id, cent_emb), and the native
    // argmax_cos expression picks the nearest centroid inside the
    // projection — zero exchange on the corpus side. The previous
    // formulation (crossJoin × 8 centroids + row_number OVER (PARTITION
    // BY vec_id)) shuffled 8 copies of every vector to compute the same
    // argmin; at 100 TB index-build that shuffle IS the cost.
    // PlanShapeSpec pins the exchange-free streamed side.
    QueryDef(
      "v5_ivf_knn",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        val e = Tables.embeddings(spark, dir)
        val assigned = assignToCentroids(
          e, e.where("vec_id < 8")
            .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb")))
        val qCluster = assigned.where("vec_id = 0")
          .select(col("cluster_id").as("q_cluster"), col("embedding").as("q_emb"))
        assigned.join(broadcast(qCluster), assigned("cluster_id") === qCluster("q_cluster"))
          .selectExpr("vec_id", "cluster_id",
            s"round(${cosExpr("embedding", "q_emb")}, 6) AS similarity")
          .orderBy(desc("similarity"), col("vec_id"))
          .limit(K)
      },
      Some(s"""
        WITH cent AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 8),
        assigned AS (
          SELECT vec_id, embedding, cent_id AS cluster_id
          FROM (
            SELECT e.vec_id, e.embedding, c.cent_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY ${dCos("e.embedding", "c.cent_emb")} DESC, c.cent_id) AS rn
            FROM embeddings e, cent c)
          WHERE rn = 1),
        q AS (SELECT cluster_id AS q_cluster, embedding AS q_emb FROM assigned WHERE vec_id = 0)
        SELECT vec_id, cluster_id, round(${dCos("embedding", "q_emb")}, 6) AS similarity
        FROM assigned, q
        WHERE cluster_id = q_cluster
        ORDER BY similarity DESC, vec_id
        LIMIT $K""")),

    // ------------------------------ IVF multi-probe over the index at rest
    // The recall/cost knob a 100 TB deployment actually tunes: nprobe > 1
    // widens the probed fraction of the corpus (here 2 of 8 clusters) to
    // recover neighbors that fell just across a Voronoi boundary. Unlike
    // v5 (which assigns inline), this row exercises the FULL at-rest path
    // the scale design prescribes: writeIvfIndex persists the corpus
    // PARTITIONED BY cluster_id, and ivfSearch's cluster predicate prunes
    // the scan to the probe partitions (IvfSpec pins both the pruning and
    // the probe count). Oracle: exact kNN RESTRICTED to the same two
    // probed clusters, derived from the rank-window assignment — an
    // independent formulation of both the assignment and the probe set.
    QueryDef(
      "v5_ivf_knn_mp",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        val e = Tables.embeddings(spark, dir)
        val cents = e.where("vec_id < 8")
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
        val idx = java.nio.file.Files.createTempDirectory("graft_ivf_gate").toString + "/idx"
        writeIvfIndex(spark, e, cents, idx)
        val q = e.where("vec_id = 0").select("embedding").collect().head
          .getAs[scala.collection.Seq[Float]]("embedding").toSeq
        ivfSearch(spark, idx, cents, q, k = K, nprobe = 2)
      },
      Some(s"""
        WITH cent AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 8),
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        probes AS (
          SELECT cent_id FROM cent, q
          ORDER BY ${dCos("cent_emb", "q_emb")} DESC, cent_id
          LIMIT 2),
        assigned AS (
          SELECT vec_id, embedding, cent_id AS cluster_id
          FROM (
            SELECT e.vec_id, e.embedding, c.cent_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY ${dCos("e.embedding", "c.cent_emb")} DESC, c.cent_id) AS rn
            FROM embeddings e, cent c)
          WHERE rn = 1)
        SELECT vec_id, cluster_id, round(${dCos("embedding", "q_emb")}, 6) AS similarity
        FROM assigned, q
        WHERE cluster_id IN (SELECT cent_id FROM probes)
        ORDER BY similarity DESC, vec_id
        LIMIT $K""")),

    // ------------------------- product-quantized ADC scan (the V2 memory path)
    // The compression half of a production vector index (IVF prunes READS,
    // PQ shrinks BYTES): each 64-dim vector splits into 8 subspaces of 8
    // dims; per subspace a 16-codeword codebook (subvectors of the first
    // 16 vectors — the deterministic stand-in for trained k-means, as in
    // v5) quantizes the subvector to the argmax-cosine codeword. At rest
    // a vector is 8 code bytes instead of 256 embedding bytes (32×); a
    // query scores candidates ASYMMETRICALLY (ADC): its 8 exact
    // subvectors dot the SELECTED codewords — here expressed as
    // element_at(codebook, argmax_cos(...) + 1) per subspace, an
    // all-codegen row-local projection over one broadcast codebook row,
    // zero corpus exchange (the same shape as assignToCentroids, 8×).
    // Oracle: the identical construction via rank-window argmax + an
    // ordered list_sum fold — different formulation, same fixpoint.
    QueryDef(
      "v7_pq_adc",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        val e = Tables.embeddings(spark, dir)
        val M = 8; val D = 8; val CB = 16
        val cbAggs = (0 until M).map(m => expr(
          s"sort_array(collect_list(named_struct('cid', vec_id, 'cw', slice(embedding, ${m * D + 1}, $D)))) AS cbs$m"))
        val cb = broadcast(e.where(s"vec_id < $CB").groupBy().agg(cbAggs.head, cbAggs.tail: _*))
        val qv = e.where("vec_id = 0").select("embedding").collect().head
          .getAs[scala.collection.Seq[Float]]("embedding")
        def qm(m: Int) = qv.slice(m * D, m * D + D)
          .map(v => s"cast($v AS float)").mkString("array(", ", ", ")")
        val score = (0 until M).map { m =>
          s"dot_f(${qm(m)}, element_at(cbs$m.cw, argmax_cos(slice(embedding, ${m * D + 1}, $D), cbs$m.cw) + 1))"
        }.mkString(" + ")
        e.crossJoin(cb)
          .selectExpr("vec_id", s"round($score, 6) AS approx_sim")
          .orderBy(desc("approx_sim"), col("vec_id"))
          .limit(10)
      },
      Some(s"""
        WITH ms AS (SELECT unnest(generate_series(0, 7)) AS m),
        cw AS (
          SELECT ms.m, row_number() OVER (PARTITION BY ms.m ORDER BY vec_id) - 1 AS k,
                 list_transform(embedding[ms.m*8+1 : ms.m*8+8], x -> x::DOUBLE) AS cwv
          FROM embeddings, ms
          WHERE vec_id < 16),
        sub AS (
          SELECT e.vec_id, ms.m, list_transform(e.embedding[ms.m*8+1 : ms.m*8+8], x -> x::DOUBLE) AS sv
          FROM embeddings e, ms),
        assigned AS (
          SELECT vec_id, m, k FROM (
            SELECT s.vec_id, s.m, c.k,
                   row_number() OVER (PARTITION BY s.vec_id, s.m
                                      ORDER BY ${dCos("s.sv", "c.cwv")} DESC, c.k) AS rn
            FROM sub s JOIN cw c ON s.m = c.m)
          WHERE rn = 1),
        q AS (
          SELECT ms.m, list_transform(embedding[ms.m*8+1 : ms.m*8+8], x -> x::DOUBLE) AS qv
          FROM embeddings, ms WHERE vec_id = 0),
        term AS (
          SELECT a.vec_id, a.m,
                 list_sum(list_transform(generate_series(1, 8), i -> q.qv[i] * c.cwv[i])) AS d
          FROM assigned a
          JOIN cw c ON a.m = c.m AND a.k = c.k
          JOIN q ON q.m = a.m),
        score AS (
          SELECT vec_id, list_sum(list(d ORDER BY m)) AS s
          FROM term GROUP BY vec_id)
        SELECT vec_id, round(s, 6) AS approx_sim
        FROM score
        ORDER BY approx_sim DESC, vec_id
        LIMIT 10""")),

    // ----------------------- IVF-PQ: the composed production index
    // v5 prunes READS (probe nprobe of the coarse clusters), v7 shrinks
    // BYTES (residuals quantized to 8 code bytes) — this row composes
    // them into the architecture a 100 TB vector corpus actually
    // deploys: assign to the nearest coarse centroid (row-local
    // argmax_cos over one broadcast centroid row), quantize the RESIDUAL
    // v − c per 8-dim subspace against a 16-codeword residual codebook
    // (residual subvectors of vectors 16..31 — vectors 0..15 contain the
    // centroids themselves, whose zero residuals would put NaN cosines
    // on every codeword and degenerate the quantizer), and score a query
    // asymmetrically per probed cluster: approx ⟨q,v⟩ = ⟨q,c⟩ +
    // Σ_m ⟨(q−c)_m, codeword(v,m)⟩. The centroid term ⟨q,c⟩ makes the
    // ranking comparable ACROSS the probed clusters — constant within
    // one cluster, decisive between them.
    //
    // Plan shape: corpus side is scan → broadcast joins (centroid row,
    // probe row, codebook row) → projection → TakeOrderedAndProject —
    // zero corpus exchange, all scoring codegen'd. Oracle: the identical
    // construction via rank windows + ordered list_sum folds — the
    // summation order (qc + (t0 + t1 + … + t7)) is pinned in both
    // engines so the doubles agree bitwise before rounding.
    QueryDef(
      "v8_ivfpq",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        val e = Tables.embeddings(spark, dir)
        val M = 8; val D = 8; val NProbe = 2
        val cents = e.where("vec_id < 8")
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
        val resid = residuals(e, cents)
        val cbAggs = (0 until M).map(m => expr(
          s"sort_array(collect_list(named_struct('cid', vec_id, 'cw', slice(rv, ${m * D + 1}, $D)))) AS cbs$m"))
        val cb = broadcast(resid.where("vec_id >= 16 AND vec_id < 32")
          .groupBy().agg(cbAggs.head, cbAggs.tail: _*))
        val qv = e.where("vec_id = 0").select("embedding").collect().head
          .getAs[scala.collection.Seq[Float]]("embedding")
        val qLit = qv.map(v => s"cast($v AS float)").mkString("array(", ", ", ")")
        val probes = broadcast(cents
          .selectExpr("cent_id", "cent_emb", s"${cosExpr("cent_emb", qLit)} AS cs")
          .orderBy(desc("cs"), col("cent_id"))
          .limit(NProbe)
          .selectExpr("cent_id AS p_cluster",
            s"dot_f($qLit, cent_emb) AS qc",
            s"zip_with($qLit, cent_emb, (x, c) -> cast(x AS double) - cast(c AS double)) AS qr"))
        val terms = (0 until M).map { m =>
          s"dot_f(slice(qr, ${m * D + 1}, $D), element_at(cbs$m.cw, argmax_cos(slice(rv, ${m * D + 1}, $D), cbs$m.cw) + 1))"
        }.mkString(" + ")
        resid.join(probes, resid("cluster_id") === probes("p_cluster"))
          .crossJoin(cb)
          .selectExpr("vec_id", "cluster_id", s"round(qc + ($terms), 6) AS approx_sim")
          .orderBy(desc("approx_sim"), col("vec_id"))
          .limit(10)
      },
      Some(s"""
        WITH cent AS (SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings WHERE vec_id < 8),
        assigned AS (
          SELECT vec_id, embedding, cent_id AS cluster_id
          FROM (
            SELECT e.vec_id, e.embedding, c.cent_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY ${dCos("e.embedding", "c.cent_emb")} DESC, c.cent_id) AS rn
            FROM embeddings e, cent c)
          WHERE rn = 1),
        resid AS (
          SELECT a.vec_id, a.cluster_id,
                 list_transform(generate_series(1, len(a.embedding)),
                                i -> a.embedding[i]::DOUBLE - c.cent_emb[i]::DOUBLE) AS rv
          FROM assigned a JOIN cent c ON a.cluster_id = c.cent_id),
        ms AS (SELECT unnest(generate_series(0, 7)) AS m),
        cw AS (
          SELECT ms.m, row_number() OVER (PARTITION BY ms.m ORDER BY vec_id) - 1 AS k,
                 r.rv[ms.m*8+1 : ms.m*8+8] AS cwv
          FROM resid r, ms
          WHERE r.vec_id >= 16 AND r.vec_id < 32),
        sub AS (
          SELECT r.vec_id, r.cluster_id, ms.m, r.rv[ms.m*8+1 : ms.m*8+8] AS sv
          FROM resid r, ms),
        acode AS (
          SELECT vec_id, cluster_id, m, k FROM (
            SELECT s.vec_id, s.cluster_id, s.m, c.k,
                   row_number() OVER (PARTITION BY s.vec_id, s.m
                                      ORDER BY ${dCos("s.sv", "c.cwv")} DESC, c.k) AS rn
            FROM sub s JOIN cw c ON s.m = c.m)
          WHERE rn = 1),
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        probes AS (
          SELECT cent_id, cent_emb FROM cent, q
          ORDER BY ${dCos("cent_emb", "q_emb")} DESC, cent_id
          LIMIT 2),
        pq AS (
          SELECT p.cent_id AS p_cluster,
                 list_sum(list_transform(generate_series(1, len(p.cent_emb)),
                                         i -> q.q_emb[i]::DOUBLE * p.cent_emb[i]::DOUBLE)) AS qc,
                 list_transform(generate_series(1, len(p.cent_emb)),
                                i -> q.q_emb[i]::DOUBLE - p.cent_emb[i]::DOUBLE) AS qr
          FROM probes p, q),
        term AS (
          SELECT a.vec_id, a.cluster_id, a.m, pq.qc,
                 list_sum(list_transform(generate_series(1, 8),
                                         i -> pq.qr[a.m*8+i] * c.cwv[i])) AS d
          FROM acode a
          JOIN cw c ON a.m = c.m AND a.k = c.k
          JOIN pq ON pq.p_cluster = a.cluster_id),
        score AS (
          SELECT vec_id, cluster_id, min(qc) + list_sum(list(d ORDER BY m)) AS s
          FROM term GROUP BY vec_id, cluster_id)
        SELECT vec_id, cluster_id, round(s, 6) AS approx_sim
        FROM score
        ORDER BY approx_sim DESC, vec_id
        LIMIT 10""")),

    // --------------------- sharded-NSW graph ANN (the V2 HNSW analog)
    // Build the per-shard navigable-small-world index, then search it at
    // FULL beam width: coverage is total, so the result must equal the
    // exact top-k — which is precisely what the oracle computes
    // (brute-force kNN SQL). A recall regression, a broken graph link,
    // or nondeterministic construction all surface as a hash mismatch
    // against an oracle that never saw the graph. Narrow-beam behavior
    // is spec-tested (GraphAnnSpec recall bound).
    QueryDef(
      "v6_graph_ann",
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        val idx = java.nio.file.Files.createTempDirectory("graft_gann_gate").toString + "/idx"
        GraphAnn.buildIndex(e, idx, numParts = 8, m = 8, efC = 64)
        val q = e.where("vec_id = 0").select("embedding").collect().head
          .getAs[scala.collection.Seq[Float]]("embedding").toSeq
        GraphAnn.search(spark, idx, q, k = 25, ef = 1 << 20)
          .selectExpr("vec_id", "round(similarity, 6) AS similarity")
          .orderBy(desc("similarity"), col("vec_id"))
          .limit(K)
      },
      Some(s"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, round(${dCos("embedding", "q_emb")}, 6) AS similarity
        FROM embeddings, q
        ORDER BY similarity DESC, vec_id
        LIMIT $K""")),

    // ------------------------ LSH-bucketed ANN (the other V2 scale path)
    // Random-hyperplane LSH: 32 fixed Gaussian planes → 4 bands × 8 sign
    // bits per vector; candidate pairs share a (band_id, band_val)
    // bucket; exact cosine re-ranks the candidates, top-20 out. The
    // 100 TB shape: signatures are one codegen'd scan (dot_f per plane),
    // the self-join touches only (vec_id, band key) pairs — never the
    // vectors — and the O(n²) pair space is never formed. Bucket width
    // (bits) and recall (bands) tune independently.
    QueryDef(
      "v4_lsh_ann",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        val e = Tables.embeddings(spark, dir)
        val bandStructs = (0 until LshBands)
          .map(b => s"named_struct('band_id', $b, 'band_val', ${bandValSpark(b)})")
          .mkString("array(", ", ", ")")
        val bands = e.selectExpr("vec_id", s"explode($bandStructs) AS bk")
          .selectExpr("vec_id", "bk.band_id AS band_id", "bk.band_val AS band_val")
        val l = bands.select(col("band_id"), col("band_val"), col("vec_id").as("vec_a"))
        val r = bands.select(col("band_id").as("band_id_r"), col("band_val").as("band_val_r"),
          col("vec_id").as("vec_b"))
        val cand = l.join(r,
            l("band_id") === r("band_id_r") && l("band_val") === r("band_val_r") &&
              l("vec_a") < r("vec_b"))
          .select(col("vec_a"), col("vec_b"))
          .distinct()
        val ea = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
        val eb = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
        cand.join(ea, "vec_a").join(eb, "vec_b")
          .selectExpr("vec_a", "vec_b", "round(cosine_f(emb_a, emb_b), 6) AS cosine")
          .orderBy(desc("cosine"), col("vec_a"), col("vec_b"))
          .limit(20)
      },
      Some(s"""
        WITH bands AS (
          ${(0 until LshBands).map(b =>
            s"SELECT vec_id, $b AS band_id, ${bandValDuck(b)} AS band_val FROM embeddings")
            .mkString("\n          UNION ALL\n          ")}
        ),
        cand AS (
          SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
          FROM bands l JOIN bands r
            ON l.band_id = r.band_id AND l.band_val = r.band_val AND l.vec_id < r.vec_id
        )
        SELECT vec_a, vec_b, round(${dCos("a.embedding", "b.embedding")}, 6) AS cosine
        FROM cand JOIN embeddings a ON vec_a = a.vec_id JOIN embeddings b ON vec_b = b.vec_id
        ORDER BY cosine DESC, vec_a, vec_b
        LIMIT 20""")),

    // --------------------------- V1: deterministic hashed-n-gram embedding
    // The reference's embedding step is store-side and model-based
    // (SURVEY §2.4 V1 — and its loaded model is dead code); the engine's
    // faithful analog is a deterministic text → vector map with cosine
    // geometry: hash word tokens into 64 buckets (md5-derived, so the
    // oracle reproduces it exactly), L2-normalize the counts.
    // Physical shape: explode tokens → hash to bucket → groupBy count →
    // re-assemble the vector from a bucket map. All codegen'd shuffle
    // aggregation — a naive 64-passes-over-the-token-array lambda was
    // 19 s at sf0.1, this is ~1 s, and it's the shape that survives
    // 100 TB (embedding construction as aggregation, not per-row loops).
    //
    // Output is EXPLODED to (doc_id, dim, val) scalars: the driver's
    // comparator hashes column values and cannot hash a raw
    // array<double> (round-1 forfeit); a row per dimension carries the
    // identical information in comparable form.
    QueryDef(
      "v1_embed",
      (spark, dir) =>
        embedDocs(spark, dir)
          .select(col("doc_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .selectExpr("doc_id", "cast(dim AS bigint) AS dim", "round(v, 6) AS val"),
      Some(s"""
        WITH emb AS ($v1EmbedOracle)
        SELECT doc_id, (g.i - 1)::BIGINT AS dim, round(embedding[g.i], 6) AS val
        FROM emb, (SELECT unnest(generate_series(1, 64)) AS i) g""")),

    // ------------------------- V1+V3 composed: text query → embed → kNN
    // The reference's actual query path (src/qa_system.py:119 →
    // src/vector_store.py:152-175): embed the query TEXT with the same
    // function as the corpus, then cosine top-k. The query embedding is
    // one row (broadcast); the corpus embedding reuses the scalable
    // aggregation pipeline; scoring is the native codegen'd cosine.
    QueryDef(
      "v2_text_knn",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        val q = spark.sql(s"SELECT ${embedLiteralSpark(s"'${graft.operators.Qa.Query}'")} AS q_emb")
        embedDocs(spark, dir).crossJoin(broadcast(q))
          .selectExpr("doc_id", "round(cosine_f(embedding, q_emb), 6) AS similarity")
          .orderBy(desc("similarity"), col("doc_id"))
          .limit(K)
      },
      Some(s"""
        WITH emb AS ($v1EmbedOracle),
        q AS (SELECT ${embedLiteralDuck(s"'${graft.operators.Qa.Query}'")} AS q_emb)
        SELECT doc_id, round(${dCos("embedding", "q_emb")}, 6) AS similarity
        FROM emb, q
        ORDER BY similarity DESC, doc_id
        LIMIT $K""")),

    // --------------------- MMR diversity re-ranking (λ = 0.5, k = 5)
    // Maximal Marginal Relevance (Carbonell & Goldstein 1998): from
    // the exact top-20 candidates, greedily pick the item maximizing
    // λ·sim(c, q) − (1−λ)·max_{s∈selected} sim(c, s) — relevance
    // traded against redundancy, the re-rank layer RAG retrieval runs
    // after kNN. The candidate pool and its pairwise similarity matrix
    // are computed DISTRIBUTED (broadcast query, 20×20 pair grid);
    // only the O(k²) greedy walks on the driver — the same bounded
    // collect contract as ivfSearch's probe selection. The oracle
    // unrolls the identical greedy as five SQL pick-layers — an
    // independent implementation, not a re-expression.
    QueryDef(
      "v10_mmr",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        import spark.implicits._
        val e = Tables.embeddings(spark, dir)
        val q = e.where("vec_id = 10").select(col("embedding").as("q_emb"))
        val cand = e.crossJoin(broadcast(q))
          .selectExpr("vec_id", "embedding", s"${cosExpr("embedding", "q_emb")} AS sim")
          .orderBy(desc("sim"), col("vec_id"))
          .limit(MmrPool)
          .persist()
        val sims = cand.selectExpr("vec_id AS va", "embedding AS ea", "sim")
          .crossJoin(cand.selectExpr("vec_id AS vb", "embedding AS eb"))
          .selectExpr("va", "vb", "sim", s"${cosExpr("ea", "eb")} AS s")
          .collect()
        cand.unpersist()
        val simToQ = sims.map(r => r.getAs[Long]("va") -> r.getAs[Double]("sim")).toMap
        val pair = sims.map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb")) -> r.getAs[Double]("s")).toMap
        val ids = simToQ.keys.toSeq.sorted
        val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
        (1 to K).foreach { _ =>
          val best = ids.filterNot(selected.contains).map { c =>
            val red = if (selected.isEmpty) 0.0 else selected.map(s => pair((c, s))).max
            (c, 0.5 * simToQ(c) - 0.5 * red)
          }.minBy { case (c, score) => (-score, c) }._1
          selected += best
        }
        selected.zipWithIndex
          .map { case (v, i) => (i + 1L, v, simToQ(v)) }.toSeq
          .toDF("rank", "vec_id", "sim")
          .selectExpr("rank", "vec_id", "round(sim, 6) AS similarity")
      },
      Some {
        val step = (i: Int) => s"""
        red$i AS (
          SELECT p.va AS vec_id, max(p.s) AS red
          FROM pair p JOIN sel${i - 1} s ON p.vb = s.vec_id
          GROUP BY p.va),
        pick$i AS (
          SELECT c.vec_id, $i::BIGINT AS rank
          FROM cand c JOIN red$i r ON c.vec_id = r.vec_id
          WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
          ORDER BY 0.5 * c.sim - 0.5 * r.red DESC, c.vec_id
          LIMIT 1),
        sel$i AS (SELECT vec_id, rank FROM sel${i - 1}
                  UNION ALL SELECT vec_id, rank FROM pick$i)"""
        s"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 10),
        cand AS (
          SELECT vec_id, embedding, ${dCos("embedding", "q_emb")} AS sim
          FROM embeddings, q
          ORDER BY sim DESC, vec_id
          LIMIT $MmrPool),
        pair AS (
          SELECT a.vec_id AS va, b.vec_id AS vb,
                 ${dCos("a.embedding", "b.embedding")} AS s
          FROM cand a, cand b),
        sel1 AS (
          SELECT vec_id, 1::BIGINT AS rank FROM cand
          ORDER BY sim DESC, vec_id LIMIT 1),
        ${(2 to K).map(step).mkString(",")}
        SELECT s.rank, s.vec_id, round(c.sim, 6) AS similarity
        FROM sel$K s JOIN cand c ON s.vec_id = c.vec_id"""
      }),

    // ------------------------- IVF recall sweep: the tuning curve itself
    // What a 100 TB deployment actually reads before choosing nprobe:
    // recall@k of the IVF probe against exact kNN, for every probe
    // width. One pass computes each vector's exact rank (brute-force
    // cosine) and its cluster's probe rank (how early that cluster is
    // probed for this query); recall@k for nprobe=p is then just
    // counting top-k-ranked vectors whose in-probe rank also lands in
    // the top k — the whole sweep is ONE aggregation, not p searches.
    // Everything is rank arithmetic over the same deterministic cosine
    // the other v-rows hash — the evaluation harness is itself
    // oracle-checked.
    QueryDef(
      "v9_ivf_recall",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        val e = Tables.embeddings(spark, dir)
        val cents = e.where("vec_id < 8")
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
        // query = vec_id 10: its true top-5 straddles five clusters, so
        // the sweep actually exhibits the recall/cost curve (vec 0's
        // neighbors all share its cluster — a flat 1.0 line)
        val q = e.where("vec_id = 10")
          .select(col("embedding").as("q_emb"))
        val probeRank = cents.crossJoin(broadcast(q))
          .selectExpr("cent_id", s"${cosExpr("cent_emb", "q_emb")} AS cs")
          .selectExpr("cent_id",
            "cast(row_number() OVER (ORDER BY cs DESC, cent_id) AS bigint) AS probe_rank")
        val ranked = assignToCentroids(e, cents)
          .crossJoin(broadcast(q))
          .selectExpr("vec_id", "cluster_id", s"${cosExpr("embedding", "q_emb")} AS sim")
          .selectExpr("vec_id", "cluster_id", "sim",
            "cast(row_number() OVER (ORDER BY sim DESC, vec_id) AS bigint) AS exact_rank")
          .join(broadcast(probeRank.selectExpr("cent_id AS cluster_id", "probe_rank")), "cluster_id")
        // fan the corpus out per probe width (an EVALUATION query — at
        // 100 TB this sweep runs on a sampled query/corpus slice), rank
        // within each probed UNION, and count true neighbors recovered:
        // exactly what ivfSearch at that nprobe would return
        val sweep = spark.range(1, 9).selectExpr("id AS nprobe")
        sweep.join(ranked, expr("probe_rank <= nprobe"))
          .selectExpr("nprobe", "vec_id", "exact_rank", "sim")
          .selectExpr("nprobe", "exact_rank",
            "cast(row_number() OVER (PARTITION BY nprobe ORDER BY sim DESC, vec_id) AS bigint) AS union_rank")
          .selectExpr("nprobe",
            s"CASE WHEN exact_rank <= $K AND union_rank <= $K THEN 1 ELSE 0 END AS hit")
          .groupBy("nprobe")
          .agg(
            expr("cast(sum(hit) AS bigint) AS hits"),
            expr(s"cast(sum(hit) AS double) / $K.0 AS recall_at_$K"))
      },
      Some(s"""
        WITH cent AS (SELECT vec_id AS cent_id, embedding AS cent_emb
                      FROM embeddings WHERE vec_id < 8),
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 10),
        probe AS (
          SELECT cent_id,
                 row_number() OVER (ORDER BY ${dCos("cent_emb", "q_emb")} DESC, cent_id)::BIGINT AS probe_rank
          FROM cent, q),
        assigned AS (
          SELECT vec_id, embedding, cent_id AS cluster_id
          FROM (
            SELECT e.vec_id, e.embedding, c.cent_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY ${dCos("e.embedding", "c.cent_emb")} DESC, c.cent_id) AS rn
            FROM embeddings e, cent c)
          WHERE rn = 1),
        ranked AS (
          SELECT a.vec_id, p.probe_rank, s.sim, s.exact_rank
          FROM assigned a
          JOIN probe p ON a.cluster_id = p.cent_id
          JOIN (SELECT vec_id, ${dCos("embedding", "q_emb")} AS sim,
                       row_number() OVER (ORDER BY ${dCos("embedding", "q_emb")} DESC, vec_id)::BIGINT AS exact_rank
                FROM embeddings, q) s ON a.vec_id = s.vec_id)
        SELECT nprobe, sum(hit)::BIGINT AS hits,
               sum(hit)::DOUBLE / $K.0 AS recall_at_$K
        FROM (
          SELECT nprobe,
                 CASE WHEN exact_rank <= $K AND union_rank <= $K THEN 1 ELSE 0 END AS hit
          FROM (
            SELECT n.nprobe, r.exact_rank,
                   row_number() OVER (PARTITION BY n.nprobe
                                      ORDER BY r.sim DESC, r.vec_id)::BIGINT AS union_rank
            FROM (SELECT unnest(generate_series(1, 8))::BIGINT AS nprobe) n
            JOIN ranked r ON r.probe_rank <= n.nprobe))
        GROUP BY nprobe"""))
  ) ++ Seq(

    // ------------------------------------------ exact radius search
    // Range search — ALL corpus vectors within a cosine radius of each
    // probe, not a fixed top-k: the retrieval shape of near-duplicate
    // audits and "everything similar to this exemplar" curation pulls,
    // where the answer size is data-dependent. Exact range search is
    // irreducibly a corpus scan, and that is its scale story: probes
    // broadcast (bounded set), the native codegen'd cosine_f evaluates
    // inside the scan, only the ≥-θ survivors leave the executor — no
    // shuffle, no sort, no index to go stale. Embarrassingly parallel
    // at any corpus size; the IVF/LSH paths stay the low-latency
    // alternatives when approximate recall is acceptable.
    QueryDef(
      "v11_range",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        val e = Tables.embeddings(spark, dir)
        val q = e.where("vec_id < 4")
          .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))
        e.crossJoin(broadcast(q))
          .where("vec_id != q_vec_id")
          .selectExpr("q_vec_id", "vec_id",
            s"round(${cosExpr("embedding", "q_emb")}, 6) AS similarity")
          .where("similarity >= 0.2")
      },
      Some(s"""
        WITH q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb
                   FROM embeddings WHERE vec_id < 4)
        SELECT q_vec_id, vec_id, similarity
        FROM (SELECT q_vec_id, vec_id,
                     round(${dCos("embedding", "q_emb")}, 6) AS similarity
              FROM embeddings, q
              WHERE vec_id != q_vec_id)
        WHERE similarity >= 0.2""")),

    // ------------------------------- kNN majority-vote classification
    // The evaluation shape every embedding pipeline runs: hold out a
    // deterministic query slice, 5-NN each query against the remaining
    // corpus, predict the majority neighbor label (ties → smallest
    // label), and report the confusion matrix against the true labels.
    //
    // The query slice is BUDGETED, not a corpus fraction: `vec_id % 23
    // = 0 AND vec_id < ClassifyBudget` caps the held-out set at
    // ClassifyBudget/23 ≈ 179 queries no matter how large the corpus
    // grows. An unbudgeted `% 23` slice would broadcast ~4% of a 100 TB
    // corpus (hundreds of MB per executor) and make the exact scoring
    // pass O(n²/23); with the cap the broadcast is a constant few
    // hundred KB and scoring stays one linear corpus scan — the same
    // contract as every other kNN demo's constant probe set. Evaluation
    // on a fixed random-but-deterministic holdout is also what a real
    // pipeline does: confusion matrices converge with a few hundred
    // queries, so scaling the holdout with the corpus buys nothing.
    //
    // Scale shape: queries broadcast (bounded); the corpus is scanned
    // once with the native cosine and reduced through the bounded-heap
    // TopKAggregator (≤ k rows per query cross the wire, never the
    // corpus); the winners' labels come from ONE more broadcast-semi
    // scan keyed by the tiny top set; votes/confusion are O(queries)
    // aggregates.
    QueryDef(
      "v12_knn_classify",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        import spark.implicits._
        val e = Tables.embeddings(spark, dir)
        val q = e.where(s"vec_id % 23 = 0 AND vec_id < $ClassifyBudget")
          .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))
        val scored = e.where("vec_id % 23 != 0")
          .crossJoin(broadcast(q))
          .selectExpr("q_vec_id", "vec_id",
            s"round(${cosExpr("embedding", "q_emb")}, 6) AS similarity")
          .as[(Long, Long, Double)]
        val top = TopK.topKByKey(scored, K)
          .toDF("q_vec_id", "rank", "vec_id", "similarity")
        val votes = e.select(col("vec_id"), col("label"))
          .join(broadcast(top.select("q_vec_id", "vec_id")), Seq("vec_id"))
          .groupBy("q_vec_id", "label")
          .agg(expr("count(*) AS nv"))
          .selectExpr("q_vec_id", "label", "nv",
            """row_number() OVER (PARTITION BY q_vec_id
                                  ORDER BY nv DESC, label) AS vr""")
          .where("vr = 1")
          .selectExpr("q_vec_id", "label AS pred_label")
        val truth = e.where(s"vec_id % 23 = 0 AND vec_id < $ClassifyBudget")
          .selectExpr("vec_id AS q_vec_id", "label AS true_label")
        votes.join(broadcast(truth), "q_vec_id")
          .groupBy("true_label", "pred_label")
          .agg(expr("cast(count(*) AS bigint) AS n_queries"))
          .selectExpr("cast(true_label AS int) AS true_label",
            "cast(pred_label AS int) AS pred_label", "n_queries")
      },
      Some(s"""
        WITH q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb, label AS true_label
                   FROM embeddings WHERE vec_id % 23 = 0 AND vec_id < $ClassifyBudget),
        scored AS (
          SELECT q.q_vec_id, e.vec_id, e.label,
                 round(${dCos("e.embedding", "q.q_emb")}, 6) AS similarity
          FROM embeddings e, q
          WHERE e.vec_id % 23 != 0),
        top AS (
          SELECT q_vec_id, vec_id, label
          FROM (SELECT q_vec_id, vec_id, label,
                       row_number() OVER (PARTITION BY q_vec_id
                                          ORDER BY similarity DESC, vec_id) AS rank
                FROM scored)
          WHERE rank <= $K),
        votes AS (SELECT q_vec_id, label, count(*) AS nv FROM top GROUP BY 1, 2),
        pred AS (
          SELECT q_vec_id, label AS pred_label
          FROM (SELECT q_vec_id, label,
                       row_number() OVER (PARTITION BY q_vec_id
                                          ORDER BY nv DESC, label) AS vr
                FROM votes)
          WHERE vr = 1)
        SELECT q.true_label::INT AS true_label, p.pred_label::INT AS pred_label,
               count(*)::BIGINT AS n_queries
        FROM pred p JOIN q ON p.q_vec_id = q.q_vec_id
        GROUP BY 1, 2""")),

    // ----------------------- metadata-filtered vector search (hybrid)
    // The vector-store feature production retrieval actually needs:
    // top-k similarity UNDER a metadata constraint — here each query
    // searches only ITS OWN label class ("similar items in my
    // category"). The filter is not a post-filter over an unfiltered
    // top-k (which silently under-fills k when the filter is
    // selective): the constraint joins BEFORE scoring, as an equi-join
    // on the label key. That turns the usual broadcast-NLJ scoring
    // shape into a broadcast HASH join — each corpus row scores only
    // against the queries of its own label, so the cosine work drops
    // from |corpus|·|queries| to Σ_label |corpus_label|·|queries_label|
    // (10× less here with 10 balanced labels), and a corpus partitioned
    // by label at rest would prune the scan the way the IVF layout
    // does. Top-k still reduces through the bounded-heap aggregator —
    // ≤ k rows per query cross the wire.
    QueryDef(
      "v13_filtered_knn",
      (spark, dir) => {
        graft.plans.VectorExprs.register(spark)
        import spark.implicits._
        val e = Tables.embeddings(spark, dir)
        val q = e.where("vec_id < 8")
          .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"),
            col("label").as("q_label"))
        val scored = e
          .join(broadcast(q),
            e("label") === q("q_label") && e("vec_id") =!= q("q_vec_id"))
          .selectExpr("q_vec_id", "vec_id",
            s"round(${cosExpr("embedding", "q_emb")}, 6) AS similarity")
          .as[(Long, Long, Double)]
        TopK.topKByKey(scored, K)
          .toDF("q_vec_id", "rank", "vec_id", "similarity")
          .join(broadcast(q.selectExpr("q_vec_id", "cast(q_label AS int) AS q_label")),
            "q_vec_id")
          .select("q_vec_id", "q_label", "vec_id", "similarity", "rank")
      },
      Some(s"""
        WITH q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb, label AS q_label
                   FROM embeddings WHERE vec_id < 8),
        scored AS (
          SELECT q.q_vec_id, q.q_label, e.vec_id,
                 round(${dCos("e.embedding", "q.q_emb")}, 6) AS similarity
          FROM embeddings e JOIN q
            ON e.label = q.q_label AND e.vec_id != q.q_vec_id)
        SELECT q_vec_id, q_label::INT AS q_label, vec_id, similarity, rank
        FROM (SELECT q_vec_id, q_label, vec_id, similarity,
                     row_number() OVER (PARTITION BY q_vec_id
                                        ORDER BY similarity DESC, vec_id)::BIGINT AS rank
              FROM scored)
        WHERE rank <= $K""")),

    // -------------------- int8 quantized scoring (ADC storage path)
    // The memory lever every billion-vector deployment pulls before
    // sharding: store 4× smaller int8 codes (per-vector max-abs
    // symmetric quantization — scale = max|x|, q = round(127·x/scale))
    // and score with INTEGER dot products against the quantized
    // query. Everything after the row-local quantization is exact
    // 64-bit integer arithmetic — no float accumulation order to
    // drift cross-engine — so the gate hash-checks the full scoring
    // path: per-vector saturation accounting plus the top-20 by
    // quantized score. Scale shape: quantization is one scan-local
    // projection (codegen HOFs over the array), the query code is a
    // 1-row broadcast, top-k is TakeOrderedAndProject — zero extra
    // exchanges over a brute-force scan, at a quarter of the bytes.
    QueryDef(
      "v14_int8_dot",
      (spark, dir) => {
        val q = Tables.embeddings(spark, dir)
          .selectExpr("vec_id", "label", "transform(embedding, x -> cast(x AS double)) AS v")
          .selectExpr("vec_id", "label",
            "aggregate(v, cast(0 AS double), (m, x) -> greatest(m, abs(x))) AS scale", "v")
          .selectExpr("vec_id", "label", "scale",
            """CASE WHEN scale = 0D THEN transform(v, x -> 0L)
                    ELSE transform(v, x -> cast(round(x * 127D / scale, 0) AS bigint))
               END AS q""")
        val probe = q.where("vec_id = 0")
          .selectExpr("q AS q0")
        q.where("vec_id != 0")
          .crossJoin(broadcast(probe))
          .selectExpr("vec_id", "cast(label AS int) AS label",
            "round(scale, 6) AS scale6",
            "cast(size(filter(q, x -> abs(x) = 127L)) AS bigint) AS n_saturated",
            "aggregate(zip_with(q, q0, (a, b) -> a * b), 0L, (acc, x) -> acc + x) AS dot8")
          .orderBy(col("dot8").desc, col("vec_id"))
          .limit(20)
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
        scaled AS (
          SELECT vec_id, label, v,
                 list_max(list_transform(v, x -> abs(x))) AS scale
          FROM e),
        codes AS (
          SELECT vec_id, label, scale,
                 CASE WHEN scale = 0 THEN list_transform(v, x -> 0::BIGINT)
                      ELSE list_transform(v, x -> round(x * 127 / scale, 0)::BIGINT)
                 END AS q
          FROM scaled),
        probe AS (SELECT q AS q0 FROM codes WHERE vec_id = 0)
        SELECT vec_id, label::INT AS label, round(scale, 6) AS scale6,
               len(list_filter(q, x -> abs(x) = 127))::BIGINT AS n_saturated,
               list_sum(list_transform(generate_series(1, len(q)),
                                       i -> q[i] * q0[i]))::BIGINT AS dot8
        FROM codes, probe
        WHERE vec_id != 0
        ORDER BY dot8 DESC, vec_id
        LIMIT 20""")),

    // -------------------- binary (1-bit) quantization + exact re-rank
    // The 32× storage lever below v14's int8: each 64-dim vector
    // collapses to its SIGN BITS — packed here as two 32-bit words in
    // bigints (MSB-first fold, so the pack is an exact integer both
    // engines compute identically) — and candidate generation is a
    // Hamming-distance top-M over xor+popcount, the cheapest possible
    // scan (two ^ and two bit_counts per vector, whole-stage codegen,
    // 16 bytes of index per vector). Because sign agreement only
    // APPROXIMATES cosine, the M=64 Hamming survivors are re-ranked
    // EXACTLY (left-to-right double folds, round 6) and the top 10
    // emitted — the standard binary-quantization + refine pipeline
    // (the RaBitQ/BQ shape production vector stores ship). Scale:
    // corpus side is scan → 1-row broadcast → TakeOrderedAndProject
    // (bounded heap, never a global sort); the re-rank touches only M
    // rows. Recall loss vs exact kNN is the measured trade — v9-style
    // calibration applies if a corpus needs it.
    QueryDef(
      "v15_binary_rerank",
      (spark, dir) => {
        // the checkpoint fence makes the top-M selection ITS OWN plan
        // root: Spark rewrites sort+limit into TakeOrderedAndProject
        // (per-partition bounded heap + driver merge) only at the root
        // — left inline under the re-rank projections it planned as a
        // full corpus range-shuffle Sort for 64 rows (the PlanShapeSpec
        // pin caught exactly that). The fenced result is M=64 rows.
        val cand = binaryHammingCandidates(spark, dir).fenced
        cand
          .selectExpr("vec_id", "cast(label AS int) AS label", "hamming",
            "aggregate(zip_with(v, q0, (a, b) -> a * b), cast(0 AS double), (acc, x) -> acc + x) AS dot",
            "sqrt(aggregate(v, cast(0 AS double), (acc, x) -> acc + x * x)) AS na",
            "sqrt(aggregate(q0, cast(0 AS double), (acc, x) -> acc + x * x)) AS nq")
          .selectExpr("vec_id", "label", "hamming",
            "round(CASE WHEN na = 0D OR nq = 0D THEN 0D ELSE dot / (na * nq) END, 6) AS cosine")
          .orderBy(col("cosine").desc, col("vec_id"))
          .limit(10)
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
        packed AS (
          SELECT vec_id, label, v,
                 list_sum(list_transform(generate_series(1, 32),
                   i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (32 - i)) ELSE 0::BIGINT END))::BIGINT AS lo,
                 list_sum(list_transform(generate_series(33, 64),
                   i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (64 - i)) ELSE 0::BIGINT END))::BIGINT AS hi
          FROM e),
        probe AS (SELECT v AS q0, lo AS qlo, hi AS qhi FROM packed WHERE vec_id = 0),
        cand AS (
          SELECT vec_id, label, v, q0,
                 (bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)))::BIGINT AS hamming
          FROM packed, probe
          WHERE vec_id != 0
          ORDER BY hamming, vec_id
          LIMIT 64)
        SELECT vec_id, label::INT AS label, hamming,
               round(CASE WHEN na = 0 OR nq = 0 THEN 0 ELSE dot / (na * nq) END, 6) AS cosine
        FROM (
          SELECT vec_id, label, hamming,
                 list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * q0[i])) AS dot,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS na,
                 sqrt(list_sum(list_transform(q0, x -> x * x))) AS nq
          FROM cand)
        ORDER BY cosine DESC, vec_id
        LIMIT 10""")),

    // ------------- Matryoshka (prefix-dimension) coarse search + refine
    // The MRL serving pattern: embeddings trained so information
    // concentrates in the leading dimensions let the index score a
    // 16-dim PREFIX (4× less arithmetic and bytes in the hot scan, and
    // a prefix index at rest is 4× smaller) and re-rank only the M=64
    // coarse survivors at full 64 dims — the dimension-axis sibling of
    // v14's int8 (precision axis) and v15's sign bits (1-bit axis).
    // Same scale shape: scan → 1-row broadcast probe →
    // TakeOrderedAndProject bounded heap (the coarse top-M fenced as
    // its own plan root, the v15 lesson), re-rank touches M rows only.
    // Both stages use the fixed left-to-right double folds + round-6
    // discipline, so candidate sets and final ranks hash-match.
    QueryDef(
      "v16_matryoshka",
      (spark, dir) => {
        val cand = matryoshkaCandidates(spark, dir).fenced
        cand
          .selectExpr("vec_id", "label", "coarse",
            "aggregate(zip_with(v, q0, (a, b) -> a * b), cast(0 AS double), (acc, x) -> acc + x) AS dot",
            "sqrt(aggregate(v, cast(0 AS double), (acc, x) -> acc + x * x)) AS na",
            "sqrt(aggregate(q0, cast(0 AS double), (acc, x) -> acc + x * x)) AS nq")
          .selectExpr("vec_id", "label", "coarse",
            "round(CASE WHEN na = 0D OR nq = 0D THEN 0D ELSE dot / (na * nq) END, 6) AS cosine")
          .orderBy(col("cosine").desc, col("vec_id"))
          .limit(10)
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
        p AS (SELECT vec_id, label, v, v[1:16] AS pfx FROM e),
        probe AS (SELECT v AS q0, pfx AS qp FROM p WHERE vec_id = 0),
        cand AS (
          SELECT vec_id, label, v, q0, coarse
          FROM (
            SELECT vec_id, label, v, q0,
                   round(CASE WHEN npa = 0 OR npq = 0 THEN 0
                              ELSE pdot / (npa * npq) END, 6) AS coarse
            FROM (
              SELECT vec_id, label, v, q0,
                     list_sum(list_transform(generate_series(1, 16), i -> pfx[i] * qp[i])) AS pdot,
                     sqrt(list_sum(list_transform(pfx, x -> x * x))) AS npa,
                     sqrt(list_sum(list_transform(qp, x -> x * x))) AS npq
              FROM p, probe WHERE vec_id != 0))
          ORDER BY coarse DESC, vec_id
          LIMIT 64)
        SELECT vec_id, label::INT AS label, coarse,
               round(CASE WHEN na = 0 OR nq = 0 THEN 0 ELSE dot / (na * nq) END, 6) AS cosine
        FROM (
          SELECT vec_id, label, coarse,
                 list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * q0[i])) AS dot,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS na,
                 sqrt(list_sum(list_transform(q0, x -> x * x))) AS nq
          FROM cand)
        ORDER BY cosine DESC, vec_id
        LIMIT 10"""))
  )

  /** Matryoshka candidate stage for v16: 16-dim prefix cosine against
    * the 1-row broadcast probe, top-M=64 by (coarse DESC, vec_id), the
    * rounded score computed BEFORE the rank so both engines cut the
    * identical candidate set. Returned UN-fenced with sort+limit at
    * the root (TakeOrderedAndProject); the caller fences before the
    * full-dimension re-rank.
    */
  private[graft] def matryoshkaCandidates(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "cast(label AS int) AS label",
        "transform(embedding, x -> cast(x AS double)) AS v")
      .selectExpr("vec_id", "label", "v", "slice(v, 1, 16) AS pfx")
    val probe = e.where("vec_id = 0").selectExpr("v AS q0", "pfx AS qp")
    e.where("vec_id != 0")
      .crossJoin(broadcast(probe))
      .selectExpr("vec_id", "label", "v", "q0",
        "aggregate(zip_with(pfx, qp, (a, b) -> a * b), cast(0 AS double), (acc, x) -> acc + x) AS pdot",
        "sqrt(aggregate(pfx, cast(0 AS double), (acc, x) -> acc + x * x)) AS npa",
        "sqrt(aggregate(qp, cast(0 AS double), (acc, x) -> acc + x * x)) AS npq")
      .selectExpr("vec_id", "label", "v", "q0",
        "round(CASE WHEN npa = 0D OR npq = 0D THEN 0D ELSE pdot / (npa * npq) END, 6) AS coarse")
      .orderBy(col("coarse").desc, col("vec_id"))
      .limit(64)
  }

  /** Binary-quantization candidate stage for v15: sign-bit pack (two
    * 32-bit words per vector, MSB-first integer fold), 1-row probe
    * broadcast, Hamming = xor+popcount, top-M=64 by (hamming, vec_id).
    * Returned UN-fenced with the sort+limit at the root so it plans as
    * TakeOrderedAndProject — PlanShapeSpec pins that shape here; the
    * caller fences with localCheckpoint before re-ranking.
    */
  private[graft] def binaryHammingCandidates(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "label", "transform(embedding, x -> cast(x AS double)) AS v")
      .selectExpr("vec_id", "label", "v",
        "aggregate(slice(v, 1, 32), 0L, (acc, x) -> acc * 2L + CASE WHEN x > 0D THEN 1L ELSE 0L END) AS lo",
        "aggregate(slice(v, 33, 32), 0L, (acc, x) -> acc * 2L + CASE WHEN x > 0D THEN 1L ELSE 0L END) AS hi")
    val probe = e.where("vec_id = 0")
      .selectExpr("v AS q0", "lo AS qlo", "hi AS qhi")
    e.where("vec_id != 0")
      .crossJoin(broadcast(probe))
      .selectExpr("vec_id", "label", "v", "q0",
        "cast(bit_count(lo ^ qlo) + bit_count(hi ^ qhi) AS bigint) AS hamming")
      .orderBy(col("hamming"), col("vec_id"))
      .limit(64)
  }

  // ----------------------------------------------- IVF index at rest
  // The materialized form of v5_ivf_knn's scale path: vectors assigned
  // to their nearest centroid and written PARTITIONED BY cluster_id.
  // A query then reads ONLY its probe clusters' directories — Spark's
  // partition pruning is the index lookup (`PartitionFilters` in the
  // scan, untouched partitions never opened). With K clusters and
  // nprobe probes, a search scans nprobe/K of the corpus.

  /** Nearest-centroid assignment with NO exchange on the corpus side:
    * the centroid set (small by IVF's definition) folds to a single row
    * holding a cent_id-sorted array of (cent_id, cent_emb); that row is
    * broadcast, and the native `argmax_cos` expression computes the
    * argmin row-locally inside the projection. Cosines use the same
    * fused left-to-right loop as `cosine_f`, and first-max-wins ties
    * match `ORDER BY cs DESC, cent_id` — so this is value-identical to
    * the rank-window formulation the DuckDB oracle still runs (a
    * different formulation on each engine, which makes the cross-check
    * meaningful). Corpus-side plan: scan → broadcast NLJ → project.
    *
    * Empty (or all-null) centroid sets assign NULL, not a runtime error:
    * `argmax_cos` returns -1 there, `nullif` turns that into a null
    * index, and `element_at` with a null index is null — evaluated in
    * ONE pass (a CASE guard would inline the argmax loop twice after
    * projection collapse).
    */
  def assignToCentroids(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    graft.plans.VectorExprs.register(embeddings.sparkSession)
    val cents = broadcast(
      centroids.groupBy().agg(
        expr("sort_array(collect_list(named_struct('cent_id', cent_id, 'cent_emb', cent_emb))) AS cents")))
    embeddings.crossJoin(cents)
      .selectExpr("vec_id", "embedding",
        "element_at(cents.cent_id, nullif(argmax_cos(embedding, cents.cent_emb), -1) + 1) AS cluster_id")
  }

  /** Assign every vector to its nearest centroid (centroids broadcast)
    * and write the corpus partitioned by cluster_id.
    */
  def writeIvfIndex(spark: SparkSession, embeddings: DataFrame, centroids: DataFrame,
                    path: String): Unit = {
    graft.plans.VectorExprs.register(spark)
    assignToCentroids(embeddings, centroids.select(col("cent_id"), col("cent_emb")))
      .write.mode("overwrite").partitionBy("cluster_id").parquet(path)
  }

  /** Top-k cosine over the IVF index, probing only the `nprobe`
    * clusters whose centroids are nearest the query vector. The
    * cluster filter is a partition-column predicate ⇒ pruned scan.
    */
  def ivfSearch(spark: SparkSession, indexPath: String, centroids: DataFrame,
                queryVec: Seq[Float], k: Int = 5, nprobe: Int = 1): DataFrame = {
    graft.plans.VectorExprs.register(spark)
    val qLit = queryVec.map(v => s"cast($v AS float)").mkString("array(", ", ", ")")
    val probes = centroids
      .selectExpr("cent_id", s"cosine_f(cent_emb, $qLit) AS cs")
      .orderBy(desc("cs"), col("cent_id"))
      .limit(nprobe)
      .collect().map(_.getAs[Long]("cent_id"))
    spark.read.parquet(indexPath)
      .where(col("cluster_id").isin(probes: _*))
      .selectExpr("vec_id", "cluster_id", s"round(cosine_f(embedding, $qLit), 6) AS similarity")
      .orderBy(desc("similarity"), col("vec_id"))
      .limit(k)
  }

  // ------------------------------------------------- IVF-PQ at rest
  // The storage half of v8_ivfpq: codes live on disk cluster-partitioned
  // (8 small ints + id per vector instead of a 256-byte embedding), the
  // codebook is a one-row parquet beside them, and search is partition
  // pruning + broadcast ADC — the corpus is never read as vectors again.

  /** (vec_id, cluster_id, rv): coarse assignment + double residual
    * v − c, all row-local over one broadcast centroid row.
    */
  private def residuals(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    graft.plans.VectorExprs.register(embeddings.sparkSession)
    val centRow = broadcast(centroids.groupBy().agg(
      expr("sort_array(collect_list(named_struct('cent_id', cent_id, 'cent_emb', cent_emb))) AS cents")))
    embeddings.crossJoin(centRow)
      .selectExpr("vec_id", "embedding",
        "nullif(argmax_cos(embedding, cents.cent_emb), -1) + 1 AS ci", "cents")
      .selectExpr("vec_id",
        "element_at(cents.cent_id, ci) AS cluster_id",
        "zip_with(embedding, element_at(cents.cent_emb, ci), (x, c) -> cast(x AS double) - cast(c AS double)) AS rv")
  }

  private val PqM = 8 // subspaces
  private val PqD = 8 // dims per subspace

  /** Build the IVF-PQ index at `path`: `codebook/` holds one row of
    * per-subspace codeword lists (residual subvectors of vectors
    * [cbLo, cbHi) in vec_id order — the deterministic stand-in for
    * trained k-means, and NOT the centroid vectors themselves, whose
    * zero residuals would degenerate the quantizer); `codes/` holds
    * (vec_id, codes[8]) partitioned by cluster_id.
    */
  def writeIvfPqIndex(spark: SparkSession, embeddings: DataFrame, centroids: DataFrame,
                      path: String, cbLo: Long = 16, cbHi: Long = 32): Unit = {
    val resid = residuals(embeddings, centroids.select(col("cent_id"), col("cent_emb")))
    val cbAggs = (0 until PqM).map(m => expr(
      s"transform(sort_array(collect_list(named_struct('cid', vec_id, 'cw', slice(rv, ${m * PqD + 1}, $PqD)))), x -> x.cw) AS cb$m"))
    resid.where(s"vec_id >= $cbLo AND vec_id < $cbHi")
      .groupBy().agg(cbAggs.head, cbAggs.tail: _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    val cb = broadcast(spark.read.parquet(s"$path/codebook"))
    val codes = (0 until PqM)
      .map(m => s"argmax_cos(slice(rv, ${m * PqD + 1}, $PqD), cb$m)")
      .mkString("array(", ", ", ")")
    resid.crossJoin(cb)
      .selectExpr("vec_id", "cluster_id", s"$codes AS codes")
      .write.mode("overwrite").partitionBy("cluster_id").parquet(s"$path/codes")
  }

  /** ADC top-k over the at-rest codes: probe the `nprobe` nearest
    * clusters (partition-pruned scan), score approx ⟨q,v⟩ = ⟨q,c⟩ +
    * Σ_m ⟨(q−c)_m, codeword(codes[m])⟩ against the broadcast codebook.
    * The embeddings themselves are never read.
    */
  def ivfPqSearch(spark: SparkSession, indexPath: String, centroids: DataFrame,
                  queryVec: Seq[Float], k: Int = 10, nprobe: Int = 2): DataFrame = {
    graft.plans.VectorExprs.register(spark)
    val qLit = queryVec.map(v => s"cast($v AS float)").mkString("array(", ", ", ")")
    val probes = broadcast(centroids
      .selectExpr("cent_id", "cent_emb", s"cosine_f(cent_emb, $qLit) AS cs")
      .orderBy(desc("cs"), col("cent_id"))
      .limit(nprobe)
      .selectExpr("cent_id AS p_cluster",
        s"dot_f($qLit, cent_emb) AS qc",
        s"zip_with($qLit, cent_emb, (x, c) -> cast(x AS double) - cast(c AS double)) AS qr"))
    val probeIds = probes.select("p_cluster").collect().map(_.getLong(0))
    val cb = broadcast(spark.read.parquet(s"$indexPath/codebook"))
    val terms = (0 until PqM)
      .map(m => s"dot_f(slice(qr, ${m * PqD + 1}, $PqD), element_at(cb$m, element_at(codes, ${m + 1}) + 1))")
      .mkString(" + ")
    spark.read.parquet(s"$indexPath/codes")
      .where(col("cluster_id").isin(probeIds: _*))
      .join(probes, col("cluster_id") === col("p_cluster"))
      .crossJoin(cb)
      .selectExpr("vec_id", "cluster_id", s"round(qc + ($terms), 6) AS approx_sim")
      .orderBy(desc("approx_sim"), col("vec_id"))
      .limit(k)
  }

  /** Corpus embedding pipeline shared by v1_embed / v2_text_knn: hashed
    * token buckets via explode → groupBy → map assembly (codegen'd
    * aggregation, not per-row lambdas), L2-normalized.
    */
  private[operators] def embedDocs(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.VectorExprs.register(spark)
    val par = spark.sessionState.conf.numShufflePartitions
    // ONE row-local codegen'd kernel per document (graft.plans.TextHash
    // .embed64) — replaces the r1–r8 explode → md5 → two-shuffle
    // groupBy/pivot pipeline with a scan-shaped projection that is
    // bit-identical to it (same md5 bucket hash, same bucket-ordered
    // norm fold, same per-element division; TextHashSpec pins kernel ≡
    // lambda parity). The repartition stays: the single-file test scan
    // is one task, and the md5 loops should use every core (row-group
    // splits provide this at real scale).
    Tables.documents(spark, dir)
      .repartition(par, col("doc_id"))
      .selectExpr("doc_id", "regexp_replace(regexp_replace(text, '\\\\s{2,}', ' '), '^\\\\s+|\\\\s+$', '') AS tc")
      .selectExpr("doc_id", "embed64(split(tc, ' ')) AS embedding")
  }

  /** One-row embedding of a SQL text expression (query strings): the
    * per-row lambda formulation is fine at cardinality 1.
    */
  private[operators] def embedLiteralSpark(tcExpr: String): String =
    s"""CASE WHEN sqrt(aggregate(transform(
          transform(sequence(0, 63, 1),
            b -> cast(size(filter(transform(split($tcExpr, ' '),
                   t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint) % 64),
                   x -> x = b)) AS double)),
          x -> x * x), 0D, (acc, v) -> acc + v)) = 0D
        THEN transform(sequence(0, 63, 1),
            b -> cast(size(filter(transform(split($tcExpr, ' '),
                   t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint) % 64),
                   x -> x = b)) AS double))
        ELSE transform(
          transform(sequence(0, 63, 1),
            b -> cast(size(filter(transform(split($tcExpr, ' '),
                   t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint) % 64),
                   x -> x = b)) AS double)),
          x -> x / sqrt(aggregate(transform(
            transform(sequence(0, 63, 1),
              b -> cast(size(filter(transform(split($tcExpr, ' '),
                     t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint) % 64),
                     x -> x = b)) AS double)),
            x -> x * x), 0D, (acc, v) -> acc + v))) END"""

  private[operators] def embedLiteralDuck(tcExpr: String): String =
    s"""(WITH qc AS (
          SELECT list_transform(generate_series(0, 63),
                   b -> len(list_filter(list_transform(string_split($tcExpr, ' '),
                          t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 64),
                          x -> x = b))::DOUBLE) AS counts)
        SELECT CASE WHEN sqrt(list_sum(list_transform(counts, x -> x * x))) = 0
                    THEN counts
                    ELSE list_transform(counts, x -> x / sqrt(list_sum(list_transform(counts, x -> x * x))))
               END FROM qc)"""

  /** DuckDB oracle body for the corpus embedding (kept in the lambda
    * formulation — value-identical to the aggregation pipeline).
    */
  private[operators] val v1EmbedOracle: String = """
        SELECT doc_id,
               CASE WHEN nrm = 0 THEN counts ELSE list_transform(counts, x -> x / nrm) END AS embedding
        FROM (
          SELECT doc_id, counts,
                 sqrt(list_sum(list_transform(counts, x -> x * x))) AS nrm
          FROM (
            SELECT doc_id,
                   list_transform(generate_series(0, 63),
                                  b -> len(list_filter(bks, x -> x = b))::DOUBLE) AS counts
            FROM (
              SELECT doc_id,
                     list_transform(string_split(tc, ' '),
                                    t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 64) AS bks
              FROM (SELECT doc_id, regexp_replace(regexp_replace(text, '\s{2,}', ' ', 'g'), '^\s+|\s+$', '', 'g') AS tc
                    FROM documents))))"""
}
