package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Corpus-curation compositions — the end-to-end shapes a training-data
  * pipeline runs over a 100 TB document corpus, built by composing the
  * engine's own operators (quality gate → exact dedup → near-dup
  * removal → deterministic sampling).
  *
  * Scale notes:
  *  - the keep/drop decisions are LEFT SEMI / LEFT ANTI joins on
  *    doc_id — Spark plans them as hash joins with no payload columns
  *    from the filter side, and the near-dup drop set is tiny relative
  *    to the corpus (broadcast in practice);
  *  - sampling is hash-based (md5 of the key), not `TABLESAMPLE` /
  *    `rand()`: deterministic under retries, stable across engines,
  *    and trivially stratifiable by computing the hash per stratum.
  */
object Curation {

  /** Cleaned text + md5 for the gate/dedup stages (shared fragment). */
  private val cleanCols =
    Seq("doc_id", "lang",
      "regexp_replace(regexp_replace(text, '\\\\s{2,}', ' '), '^\\\\s+|\\\\s+$', '') AS tc")

  def queries: Seq[QueryDef] = Seq(
    // ------------------------------------------- deterministic sampling
    // ~1-in-10 hash sample, stratified by lang: the bucket is
    // md5(doc_id) so membership is a pure function of the key —
    // re-runs, retries, and the DuckDB oracle all agree, and at 100 TB
    // the sample needs no shuffle at all (filter in the scan).
    QueryDef(
      "tp_sample_stratified",
      (spark, dir) =>
        Tables.documents(spark, dir)
          .selectExpr("doc_id", "lang", "n_chars")
          .where("pmod(cast(conv(substring(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint), 10) = 0"),
      Some("""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 = 0""")),

    // ------------------------------------------------ corpus curation
    // quality gate (min length) → exact dedup (keep min doc_id per
    // normalized-text hash) → near-dup removal (drop the RIGHT side of
    // every verified MinHash-LSH pair, left side survives). Keep/drop
    // sets apply as semi/anti joins; the pair set reuses the
    // dd_minhash_lsh pipeline (native shingle/minhash kernels).
    QueryDef(
      "tp_curate",
      (spark, dir) => {
        val minhash = Dedup.queries.find(_.name == "dd_minhash_lsh").get
        val cleaned = Tables.documents(spark, dir)
          .selectExpr(cleanCols: _*)
          .selectExpr("doc_id", "lang", "length(tc) AS char_len", "md5(tc) AS th")
        val quality = cleaned.where("char_len >= 50")
        val exactKeep = quality.groupBy("th")
          .agg(expr("min(doc_id) AS doc_id"))
          .select("doc_id")
        val nearDupDrop = minhash.run(spark, dir)
          .select(col("doc_b").as("doc_id")).distinct()
        quality
          .join(exactKeep, Seq("doc_id"), "left_semi")
          .join(nearDupDrop, Seq("doc_id"), "left_anti")
          .selectExpr("doc_id", "lang", "cast(char_len AS bigint) AS char_len")
      },
      Some(s"""
        WITH cleaned AS (
          SELECT doc_id, lang, length(tc) AS char_len, md5(tc) AS th
          FROM (SELECT doc_id, lang, regexp_replace(regexp_replace(text, '\\s{2,}', ' ', 'g'), '^\\s+|\\s+$$', '', 'g') AS tc
                FROM documents)
        ),
        quality AS (SELECT * FROM cleaned WHERE char_len >= 50),
        exact_keep AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY th),
        near_dup_drop AS (
          SELECT DISTINCT doc_b AS doc_id
          FROM (${Dedup.queries.find(_.name == "dd_minhash_lsh").get.oracle.get}) p
        )
        SELECT q.doc_id, q.lang, q.char_len::BIGINT AS char_len
        FROM quality q
        JOIN exact_keep k ON q.doc_id = k.doc_id
        WHERE q.doc_id NOT IN (SELECT doc_id FROM near_dup_drop)"""))
  )
}
