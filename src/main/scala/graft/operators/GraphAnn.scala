package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Graph ANN — the HNSW-class similarity index re-expressed for Spark's
  * execution model (reference capability: the vector store's HNSW index,
  * `/root/reference/src/vector_store.py:85-88`).
  *
  * A monolithic HNSW is a single mutable in-memory graph — the wrong
  * shape for a 1000-executor cluster. The distributed re-expression is
  * SHARDED NSW (the single-layer navigable-small-world graph HNSW
  * generalizes): the corpus hash-partitions into shards, each shard
  * builds its own graph independently inside `mapPartitions` (no
  * shuffle, no driver state), and a query beam-searches every shard in
  * parallel with the per-shard top-k merged by a global bounded heap.
  * Search cost per shard is O(ef · degree) similarity evaluations
  * instead of a full scan; shards add capacity linearly, exactly like
  * every production sharded-ANN deployment. The hierarchy layers of
  * full HNSW only cheapen the entry-point walk within one giant graph —
  * at shard granularity a medoid entry point serves the same purpose
  * for a fraction of the complexity.
  *
  * Determinism: insertion order is vec_id-sorted within a shard and all
  * ties break on id, so the graph — and therefore search results — are
  * reproducible run to run (what makes an oracle row possible).
  */
object GraphAnn {

  /** One stored graph node: shard, vector, adjacency (ids within the
    * same shard). The parquet layout partitions by `part`, so a shard's
    * graph is one directory — a search job schedules one task per
    * shard and partition pruning skips nothing (all shards probe) but
    * each task reads ONLY its shard.
    */
  final case class Node(part: Int, vec_id: Long, emb: Array[Float], neighbors: Array[Long])

  // ---------------------------------------------------------- similarity

  /** Cosine via the same fused left-to-right double loop as the native
    * `cosine_f` expression — value-identical to the DuckDB oracle's
    * formulation, which is what lets graph-search results hash-match an
    * exact-kNN oracle when coverage is total.
    */
  private[graft] def cos(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      xy += x * y; xx += x * x; yy += y * y
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  /** Total order: higher cosine first, NaN greatest (Double.compare —
    * the same DESC order Spark and DuckDB sort by), ties to lower id.
    */
  private def better(simA: Double, idA: Long, simB: Double, idB: Long): Boolean = {
    val c = java.lang.Double.compare(simA, simB)
    c > 0 || (c == 0 && idA < idB)
  }

  // ------------------------------------------------------------- build

  /** Build one shard's NSW graph: insert points in id order, linking
    * each to its `m` nearest among the already-inserted (found by beam
    * search over the partial graph, `efC` wide), bidirectionally;
    * overflowing adjacency lists prune back to the `m` nearest — the
    * standard NSW construction, deterministic under the id order.
    */
  private[operators] def buildShard(part: Int, points: Seq[(Long, Array[Float])],
                                    m: Int, efC: Int): Seq[Node] = {
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val vecs = scala.collection.mutable.HashMap.empty[Long, Array[Float]]
    val adj = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    def pruneTo(id: Long): Unit = {
      val a = adj(id)
      if (a.length > m) {
        val v = vecs(id)
        val kept = a.map(n => (n, cos(v, vecs(n))))
          .sortWith((x, y) => better(x._2, x._1, y._2, y._1)).take(m).map(_._1)
        adj(id) = scala.collection.mutable.ArrayBuffer(kept.toSeq: _*)
      }
    }
    points.sortBy(_._1).foreach { case (id, v) =>
      vecs(id) = v // registered FIRST: neighbor pruning scores against it
      if (ids.isEmpty) { adj(id) = scala.collection.mutable.ArrayBuffer.empty }
      else {
        val near = searchGraph(v, ids.head, vecs, adj, efC).take(m).map(_._1)
        adj(id) = scala.collection.mutable.ArrayBuffer(near: _*)
        near.foreach { n => adj(n) += id; pruneTo(n) }
      }
      ids += id
    }
    ids.map(id => Node(part, id, vecs(id), adj(id).toArray.sorted)).toSeq
  }

  /** Greedy beam search over one shard's graph: expand the best
    * unexpanded candidate, keep the `ef` best seen; stop when the best
    * candidate cannot improve the worst kept result. Returns the kept
    * set best-first. With `ef` ≥ shard size this visits the whole
    * connected graph — exact by coverage (insertion always links to an
    * existing node, so shards are connected).
    */
  private[operators] def searchGraph(q: Array[Float], entry: Long,
                                     vecs: scala.collection.Map[Long, Array[Float]],
                                     adj: scala.collection.Map[Long, scala.collection.mutable.ArrayBuffer[Long]],
                                     ef: Int): Seq[(Long, Double)] = {
    val ord = Ordering.fromLessThan[(Long, Double)]((a, b) => better(a._2, a._1, b._2, b._1))
    val visited = scala.collection.mutable.HashSet(entry)
    var frontier = scala.collection.immutable.SortedSet(entry -> cos(q, vecs(entry)))(ord)
    var kept = frontier
    while (frontier.nonEmpty) {
      val best = frontier.head
      frontier = frontier.tail
      val worstKept = kept.last
      if (kept.size >= ef && better(worstKept._2, worstKept._1, best._2, best._1)) {
        frontier = frontier.empty // best candidate can't improve the kept set
      } else {
        adj.getOrElse(best._1, Nil).foreach { n =>
          if (visited.add(n)) {
            val c = n -> cos(q, vecs(n))
            kept += c
            if (kept.size > ef) kept = kept.init
            // admit to the frontier only while competitive
            if (kept.size < ef || !better(kept.last._2, kept.last._1, c._2, c._1)) frontier += c
          }
        }
      }
    }
    kept.toSeq
  }

  /** Build the sharded index: hash-partition by id, build each shard's
    * graph inside its partition (zero shuffle beyond the partitioning,
    * zero driver state), write partitioned by shard.
    */
  def buildIndex(embeddings: DataFrame, path: String,
                 numParts: Int = 16, m: Int = 8, efC: Int = 64): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.selectExpr("vec_id", "embedding",
        s"abs(pmod(hash(vec_id), $numParts)) AS part")
      .repartition(numParts, col("part"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        it.toSeq.groupBy(_._3).iterator.flatMap { case (part, rows) =>
          buildShard(part, rows.map(r => (r._1, r._2)), m, efC)
        }
      }
      .write.mode("overwrite").partitionBy("part").parquet(path)
  }

  /** Query the index: every shard beam-searches in parallel (one group
    * per shard), the per-shard results merge through a global
    * TakeOrdered. The portable formulation below groups each shard's
    * nodes to its searcher — one exchange of the index, never the
    * O(n·queries) pair space; a deployment co-locates searchers with
    * the shard files (the partitionBy layout exists for exactly that)
    * and drops the exchange entirely.
    */
  def search(spark: SparkSession, indexPath: String, queryVec: Seq[Float],
             k: Int = 5, ef: Int = 64): DataFrame = {
    import spark.implicits._
    val q = queryVec.toArray
    spark.read.parquet(indexPath).as[Node]
      .groupByKey(_.part)
      .flatMapGroups { (_, nodes) =>
        val ns = nodes.toSeq
        if (ns.isEmpty) Iterator.empty
        else {
          val vecs = ns.map(n => n.vec_id -> n.emb).toMap
          val adj = ns.map(n =>
            n.vec_id -> scala.collection.mutable.ArrayBuffer(n.neighbors.toSeq: _*)).toMap
          val entry = ns.map(_.vec_id).min // deterministic medoid stand-in
          searchGraph(q, entry, vecs, adj, math.max(ef, k)).take(k).iterator
        }
      }
      .toDF("vec_id", "similarity")
      .orderBy(desc("similarity"), col("vec_id"))
      .limit(k)
  }
}
