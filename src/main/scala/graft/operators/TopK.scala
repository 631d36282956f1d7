package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-key top-k via a bounded heap `Aggregator` — the scale
  * alternative to `row_number() OVER (PARTITION BY ...) <= k`:
  * a rank window must SORT every key's full candidate list; the
  * aggregator keeps only k elements per key at every stage and
  * partial-merges map-side, so the shuffle carries ≤ k rows per key
  * instead of all of them. For batch kNN at 100 TB (millions of
  * candidates per probe) that is the difference between shuffling the
  * corpus and shuffling k×queries rows.
  *
  * Ordering: descending by score, ties broken by ascending id — the
  * same deterministic order as the oracle-checked window formulation.
  */
object TopK {

  final case class Scored(id: Long, score: Double)

  /** Keep the k largest (score, -id) pairs. The buffer is a sorted
    * vector (k is small); reduce and merge both truncate to k, so no
    * state ever exceeds k entries.
    */
  final class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    private def insert(buf: Seq[Scored], s: Scored): Seq[Scored] = {
      val (hi, lo) = buf.span(better(_, s))
      (hi ++ (s +: lo)).take(k)
    }

    override def zero: Seq[Scored] = Vector.empty
    override def reduce(buf: Seq[Scored], s: Scored): Seq[Scored] = insert(buf, s)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[Scored]): Seq[Scored] = buf
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Per-key top-k over (key, id, score) rows: returns (key, rank, id,
    * score) with rank 1-based in the deterministic order.
    */
  def topKByKey(rows: Dataset[(Long, Long, Double)], k: Int): Dataset[(Long, Long, Long, Double)] = {
    import rows.sparkSession.implicits._
    val agg = new TopKAggregator(k)
    rows
      .groupByKey(_._1)
      .mapValues { case (_, id, score) => Scored(id, score) }
      .agg(agg.toColumn)
      .flatMap { case (key, top) =>
        top.zipWithIndex.map { case (s, i) => (key, (i + 1).toLong, s.id, s.score) }
      }
  }

  /** String-keyed twin of [[topKByKey]] (e.g. per-source / per-domain
    * caps where the key is a name, not an id).
    */
  def topKByStringKey(rows: Dataset[(String, Long, Double)], k: Int): Dataset[(String, Long, Long, Double)] = {
    import rows.sparkSession.implicits._
    val agg = new TopKAggregator(k)
    rows
      .groupByKey(_._1)
      .mapValues { case (_, id, score) => Scored(id, score) }
      .agg(agg.toColumn)
      .flatMap { case (key, top) =>
        top.zipWithIndex.map { case (s, i) => (key, (i + 1).toLong, s.id, s.score) }
      }
  }
}
