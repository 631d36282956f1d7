package graft.operators

import graft.{QueryDef, Tables}

/** C1/C2 — the reference's core reshaping operator: fixed-size
  * overlapping chunking with metadata enrichment.
  *
  * Reference semantics (`src/pdf_extractor.py:43-55`, params
  * chunk_size=500 / overlap=50 / stride=450 at `:15`):
  *   - text length <= 500  → ONE chunk, `chunk_number` absent (null);
  *   - else windows start at i = 0, 450, 900, … (i < len),
  *     chunk = text[i : i+500], `chunk_number = i/450 + 1`,
  *     trailing chunks shorter than 50 chars are dropped (`:50-51`).
  *
  * Implementation is pure Catalyst SQL — `sequence` → `transform` →
  * `filter` → `explode` — no UDF, fully parallel per row, zero shuffle:
  * the plan is a single narrow map over the parquet scan, which is
  * exactly what you want when the input is 100 TB of documents.
  * Upstream: E4 clean + E5 min-length filter (pushed to the scan).
  */
object Chunker {
  val ChunkSize = 500
  val Overlap = 50
  val Stride: Int = ChunkSize - Overlap // 450
  val MinChunk = 50
  val MinParagraph = 10

  /** SQL fragment producing array<struct<chunk_number int, chunk_text string>>
    * from a cleaned text column named `tc`.
    */
  private val chunksExpr: String =
    s"""CASE WHEN length(tc) <= $ChunkSize
       |     THEN array(named_struct('chunk_number', cast(null AS int), 'chunk_text', tc))
       |     ELSE filter(
       |            transform(sequence(0, length(tc) - 1, $Stride),
       |                      i -> named_struct('chunk_number', cast(i div $Stride + 1 AS int),
       |                                        'chunk_text', substring(tc, i + 1, $ChunkSize))),
       |            s -> length(s.chunk_text) >= $MinChunk)
       |END AS chunks""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- C1
    QueryDef(
      "c1_chunk",
      (spark, dir) =>
        Tables.documents(spark, dir)
          .selectExpr("doc_id", "regexp_replace(regexp_replace(text, '\\\\s{2,}', ' '), '^\\\\s+|\\\\s+$', '') AS tc")
          .where(s"length(tc) >= $MinParagraph")
          .selectExpr("doc_id", chunksExpr)
          .selectExpr("doc_id", "explode(chunks) AS c")
          .selectExpr("doc_id", "c.chunk_number AS chunk_number", "c.chunk_text AS chunk_text"),
      Some(s"""
        WITH ok AS (
          SELECT doc_id, regexp_replace(regexp_replace(text, '\\s{2,}', ' ', 'g'), '^\\s+|\\s+$$', '', 'g') AS tc
          FROM documents
          WHERE length(regexp_replace(regexp_replace(text, '\\s{2,}', ' ', 'g'), '^\\s+|\\s+$$', '', 'g')) >= $MinParagraph
        )
        SELECT doc_id, NULL::INT AS chunk_number, tc AS chunk_text
        FROM ok WHERE length(tc) <= $ChunkSize
        UNION ALL
        SELECT doc_id, (i // $Stride + 1)::INT AS chunk_number,
               substring(tc, i + 1, $ChunkSize) AS chunk_text
        FROM ok, LATERAL (SELECT unnest(generate_series(0, length(tc) - 1, $Stride)) AS i) g
        WHERE length(tc) > $ChunkSize
          AND length(substring(tc, i + 1, $ChunkSize)) >= $MinChunk"""),
      bench = true),

    // ---------------------------------------------------------------- C2
    // Metadata enrichment + per-document fan-out accounting: source /
    // n_chars carried through, total_chunks via a window keyed by the
    // chunk's own document (narrow after the chunk explode; the window
    // shuffles on doc_id — at scale this stays balanced because doc_id
    // is unique and high-cardinality).
    QueryDef(
      "c2_chunk_meta",
      (spark, dir) =>
        Tables.documents(spark, dir)
          .selectExpr("doc_id", "source", "regexp_replace(regexp_replace(text, '\\\\s{2,}', ' '), '^\\\\s+|\\\\s+$', '') AS tc")
          .where(s"length(tc) >= $MinParagraph")
          .selectExpr("doc_id", "source", "cast(length(tc) AS bigint) AS char_len", chunksExpr)
          .selectExpr("doc_id", "source", "char_len", "explode(chunks) AS c")
          .selectExpr(
            "doc_id", "source", "char_len",
            "c.chunk_number AS chunk_number",
            "cast(length(c.chunk_text) AS bigint) AS chunk_len")
          .withColumn(
            "total_chunks",
            org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))
              .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id"))),
      Some(s"""
        WITH ok AS (
          SELECT doc_id, source, regexp_replace(regexp_replace(text, '\\s{2,}', ' ', 'g'), '^\\s+|\\s+$$', '', 'g') AS tc
          FROM documents
          WHERE length(regexp_replace(regexp_replace(text, '\\s{2,}', ' ', 'g'), '^\\s+|\\s+$$', '', 'g')) >= $MinParagraph
        ), chunks AS (
          SELECT doc_id, source, length(tc)::BIGINT AS char_len,
                 NULL::INT AS chunk_number, length(tc)::BIGINT AS chunk_len
          FROM ok WHERE length(tc) <= $ChunkSize
          UNION ALL
          SELECT doc_id, source, length(tc)::BIGINT AS char_len,
                 (i // $Stride + 1)::INT AS chunk_number,
                 length(substring(tc, i + 1, $ChunkSize))::BIGINT AS chunk_len
          FROM ok, LATERAL (SELECT unnest(generate_series(0, length(tc) - 1, $Stride)) AS i) g
          WHERE length(tc) > $ChunkSize
            AND length(substring(tc, i + 1, $ChunkSize)) >= $MinChunk
        )
        SELECT doc_id, source, char_len, chunk_number, chunk_len,
               count(*) OVER (PARTITION BY doc_id) AS total_chunks
        FROM chunks"""))
  )
}
