package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite — the training-data-pipeline extension family:
  * exact dedup, MinHash+LSH, SimHash, n-gram Jaccard verification, and
  * embedding-cosine near-dup.
  *
  * Everything is built on [[graft.Fns.hash60]] (md5-derived 60-bit
  * integers) so Spark results and the DuckDB oracle agree bit-for-bit —
  * no engine-private hash functions (Spark's `hash`/`xxhash64` have no
  * DuckDB twin).
  *
  * Scale design: no operator here ever forms the full O(n²) pair set.
  * Candidates come from LSH band buckets (minhash), band-blocked
  * fingerprints (simhash), or cluster blocking (embeddings); the
  * verification join only touches candidate pairs. That is exactly the
  * 100 TB shape — the band/bucket join is a plain shuffle join on a
  * high-cardinality key.
  */
object Dedup {

  private val P = 1000000007L
  private val NumHashes = 16
  private val Bands = 4
  private val Rows = 4 // NumHashes / Bands
  private val JaccardThreshold = 0.5
  private val CosineThreshold = 0.35
  private val HammingMax = 6

  /** Deterministic minhash coefficients, inlined as literals into BOTH
    * engines' SQL so they cannot diverge.
    */
  private val A: Seq[Long] = (0 until NumHashes).map(j => ((2L * j + 1) * 2654435761L) % P)
  private val B: Seq[Long] = (0 until NumHashes).map(j => ((j + 1) * 40503L * 65537L) % P)

  private def sparkArr(xs: Seq[Long]) = xs.mkString("array(", "L, ", "L)")
  private def duckArr(xs: Seq[Long]) = xs.mkString("[", ", ", "]")

  /** Cleaned text + distinct word-3-gram shingle set (guarded for short
    * docs: < 3 tokens → the whole text is the single shingle).
    */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "regexp_replace(regexp_replace(text, '\\\\s{2,}', ' '), '^\\\\s+|\\\\s+$', '') AS tc")
      .selectExpr("doc_id", "split(tc, ' ') AS toks", "tc")
      .selectExpr(
        "doc_id",
        """CASE WHEN size(toks) < 3 THEN array(tc)
                ELSE array_distinct(transform(sequence(1, size(toks) - 2, 1),
                                              i -> concat_ws(' ', slice(toks, i, 3))))
           END AS shingles""")

  private val shingledSql: String =
    """SELECT doc_id,
       |       CASE WHEN len(toks) < 3 THEN [tc]
       |            ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
       |                                              i -> array_to_string(toks[i:i+2], ' ')))
       |       END AS shingles
       |FROM (SELECT doc_id, string_split(tc, ' ') AS toks, tc
       |      FROM (SELECT doc_id, regexp_replace(regexp_replace(text, '\s{2,}', ' ', 'g'), '^\s+|\s+$', '', 'g') AS tc
       |            FROM documents))""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------- exact dedup
    // Hash-groupBy on normalized text; output is the keep-set
    // (representative = min doc_id) with copy counts. One shuffle on
    // md5(text) — uniformly distributed ⇒ no skew at 100 TB.
    QueryDef(
      "dd_exact",
      (spark, dir) =>
        Tables.documents(spark, dir)
          .selectExpr("doc_id", "md5(regexp_replace(regexp_replace(text, '\\\\s{2,}', ' '), '^\\\\s+|\\\\s+$', '')) AS text_hash")
          .groupBy("text_hash")
          .agg(expr("min(doc_id) AS keep_doc_id"), expr("count(*) AS n_copies")),
      Some("""
        SELECT md5(regexp_replace(regexp_replace(text, '\s{2,}', ' ', 'g'), '^\s+|\s+$', '', 'g')) AS text_hash,
               min(doc_id) AS keep_doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY 1""")),

    // ------------------------------------------------------ MinHash + LSH
    // shingle → 16 minhashes → 4 bands × 4 rows → bucket self-join →
    // distinct candidate pairs → exact-Jaccard verification ≥ 0.5.
    QueryDef(
      "dd_minhash_lsh",
      (spark, dir) => {
        val sh = shingled(spark, dir)
        val sig = sh.selectExpr(
            "doc_id", "shingles",
            s"transform(shingles, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) AS bigint) % $P) AS hv")
          .selectExpr(
            "doc_id", "shingles",
            s"""transform(sequence(0, ${NumHashes - 1}, 1),
                          j -> array_min(transform(hv,
                                 h -> (element_at(${sparkArr(A)}, j + 1) * h
                                       + element_at(${sparkArr(B)}, j + 1)) % $P))) AS mh""")
        val bands = sig.selectExpr(
            "doc_id", "shingles",
            s"""explode(transform(sequence(0, ${Bands - 1}, 1),
                        b -> named_struct('band_id', b,
                                          'band_key', array_join(transform(slice(mh, b * $Rows + 1, $Rows),
                                                                           x -> cast(x AS string)), '_')))) AS bk""")
          .selectExpr("doc_id", "shingles", "bk.band_id AS band_id", "bk.band_key AS band_key")
        val l = bands.select(col("band_id"), col("band_key"),
          col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
        val r = bands.select(col("band_id").as("band_id_r"), col("band_key").as("band_key_r"),
          col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
        l.join(r,
            l("band_id") === r("band_id_r") && l("band_key") === r("band_key_r") &&
              l("doc_a") < r("doc_b"))
          .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
          .dropDuplicates("doc_a", "doc_b")
          .selectExpr(
            "doc_a", "doc_b",
            """cast(size(array_intersect(sh_a, sh_b)) AS double)
               / cast(size(array_union(sh_a, sh_b)) AS double) AS jaccard""")
          .where(s"jaccard >= $JaccardThreshold")
          .selectExpr("doc_a", "doc_b", "round(jaccard, 6) AS jaccard")
      },
      Some(s"""
        WITH sh AS ($shingledSql),
        sig AS (
          SELECT doc_id, shingles,
                 list_transform(generate_series(0, ${NumHashes - 1}),
                   j -> list_min(list_transform(
                          list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % $P),
                          h -> (${duckArr(A)}[j + 1] * h + ${duckArr(B)}[j + 1]) % $P))) AS mh
          FROM sh
        ),
        bands AS (
          SELECT doc_id, shingles, bb.band_id,
                 array_to_string(mh[bb.band_id * $Rows + 1 : bb.band_id * $Rows + $Rows], '_') AS band_key
          FROM sig, (SELECT unnest(generate_series(0, ${Bands - 1})) AS band_id) bb
        ),
        cand AS (
          SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
          FROM bands l JOIN bands r
            ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
        )
        SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
        FROM (
          SELECT c.doc_a, c.doc_b,
                 len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(a.shingles || b.shingles))::DOUBLE AS jaccard
          FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id)
        WHERE jaccard >= $JaccardThreshold""")),

    // ---------------------------------------------------------- SimHash
    // 32-bit simhash over term-frequency-weighted token hashes.
    QueryDef(
      "dd_simhash",
      (spark, dir) => simhashDf(spark, dir),
      Some(simhashSql)),

    // SimHash near-dup pairs: 4 × 8-bit band blocking, then Hamming ≤ 6.
    QueryDef(
      "dd_simhash_pairs",
      (spark, dir) => {
        val s = simhashDf(spark, dir)
        val bands = s.selectExpr(
            "doc_id", "simhash",
            """explode(transform(sequence(0, 3, 1),
                       b -> named_struct('band_id', b,
                                         'band_val', (simhash div shiftleft(cast(1 AS bigint), b * 8)) % 256))) AS bk""")
          .selectExpr("doc_id", "simhash", "bk.band_id AS band_id", "bk.band_val AS band_val")
        val l = bands.select(col("band_id"), col("band_val"),
          col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
        val r = bands.select(col("band_id").as("band_id_r"), col("band_val").as("band_val_r"),
          col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
        l.join(r,
            l("band_id") === r("band_id_r") && l("band_val") === r("band_val_r") &&
              l("doc_a") < r("doc_b"))
          .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
          .dropDuplicates("doc_a", "doc_b")
          .selectExpr("doc_a", "doc_b", "cast(bit_count(sim_a ^ sim_b) AS bigint) AS hamming")
          .where(s"hamming <= $HammingMax")
      },
      Some(s"""
        WITH s AS ($simhashSql),
        bands AS (
          SELECT doc_id, simhash, b.band_id, (simhash // (1::BIGINT << (b.band_id * 8))) % 256 AS band_val
          FROM s, LATERAL (SELECT unnest(generate_series(0, 3)) AS band_id) b
        ),
        cand AS (
          SELECT DISTINCT l.doc_id AS doc_a, l.simhash AS sim_a, r.doc_id AS doc_b, r.simhash AS sim_b
          FROM bands l JOIN bands r
            ON l.band_id = r.band_id AND l.band_val = r.band_val AND l.doc_id < r.doc_id
        )
        SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b))::BIGINT AS hamming
        FROM cand
        WHERE bit_count(xor(sim_a, sim_b)) <= $HammingMax""")),

    // ------------------------------------------- n-gram Jaccard (blocked)
    // Direct shingle-Jaccard verification with cheap blocking on (lang,
    // token-count band) — the honest "no silent O(n²)" variant when no
    // LSH index exists. Emits pairs ≥ 0.5.
    QueryDef(
      "dd_ngram_jaccard",
      (spark, dir) => {
        val d = Tables.documents(spark, dir)
          .selectExpr("doc_id", "lang", "regexp_replace(regexp_replace(text, '\\\\s{2,}', ' '), '^\\\\s+|\\\\s+$', '') AS tc")
          .selectExpr("doc_id", "lang", "split(tc, ' ') AS toks", "tc")
          .selectExpr(
            "doc_id", "lang", "size(toks) div 10 AS len_band",
            """CASE WHEN size(toks) < 3 THEN array(tc)
                    ELSE array_distinct(transform(sequence(1, size(toks) - 2, 1),
                                                  i -> concat_ws(' ', slice(toks, i, 3))))
               END AS shingles""")
        val l = d.select(col("lang"), col("len_band"),
          col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
        val r = d.select(col("lang").as("lang_r"), col("len_band").as("len_band_r"),
          col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
        l.join(r,
            l("lang") === r("lang_r") && l("len_band") === r("len_band_r") &&
              l("doc_a") < r("doc_b"))
          .selectExpr(
            "doc_a", "doc_b",
            """cast(size(array_intersect(sh_a, sh_b)) AS double)
               / cast(size(array_union(sh_a, sh_b)) AS double) AS jaccard""")
          .where(s"jaccard >= $JaccardThreshold")
          .selectExpr("doc_a", "doc_b", "round(jaccard, 6) AS jaccard")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, lang, len(toks) // 10 AS len_band,
                 CASE WHEN len(toks) < 3 THEN [tc]
                      ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                                        i -> array_to_string(toks[i:i+2], ' ')))
                 END AS shingles
          FROM (SELECT doc_id, lang, string_split(tc, ' ') AS toks, tc
                FROM (SELECT doc_id, lang, regexp_replace(regexp_replace(text, '\\s{2,}', ' ', 'g'), '^\\s+|\\s+$$', '', 'g') AS tc
                      FROM documents))
        )
        SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
        FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(a.shingles || b.shingles))::DOUBLE AS jaccard
          FROM d a JOIN d b
            ON a.lang = b.lang AND a.len_band = b.len_band AND a.doc_id < b.doc_id)
        WHERE jaccard >= $JaccardThreshold""")),

    // ------------------------------------- embedding-cosine near-dup
    // Cluster-blocked (label) pairwise cosine with left-to-right double
    // accumulation (Fns.dotD discipline) — identical in both engines.
    // At 100 TB the label column is the partition key ⇒ partition-local
    // join, no global shuffle of the vector corpus.
    QueryDef(
      "dd_embed_neardup",
      (spark, dir) => {
        val e = Tables.embeddings(spark, dir)
        val l = e.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
        val r = e.select(col("label").as("label_r"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
        l.join(r, l("label") === r("label_r") && l("vec_a") < r("vec_b"))
          .selectExpr(
            "label", "vec_a", "vec_b",
            """aggregate(zip_with(emb_a, emb_b, (x, y) -> cast(x AS double) * cast(y AS double)), 0D, (acc, v) -> acc + v)
               / (sqrt(aggregate(transform(emb_a, x -> cast(x AS double) * cast(x AS double)), 0D, (acc, v) -> acc + v))
                  * sqrt(aggregate(transform(emb_b, x -> cast(x AS double) * cast(x AS double)), 0D, (acc, v) -> acc + v))) AS cos""")
          .where(s"cos >= $CosineThreshold")
          .selectExpr("label", "vec_a", "vec_b", "round(cos, 6) AS cosine")
      },
      Some(s"""
        WITH e AS (
          SELECT label, vec_id,
                 list_transform(embedding, x -> x::DOUBLE) AS emb
          FROM embeddings
        )
        SELECT label, vec_a, vec_b, round(cos, 6) AS cosine
        FROM (
          SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
                 list_sum(list_transform(generate_series(1, len(a.emb)), i -> a.emb[i] * b.emb[i]))
                 / (sqrt(list_sum(list_transform(a.emb, x -> x * x)))
                    * sqrt(list_sum(list_transform(b.emb, x -> x * x)))) AS cos
          FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        WHERE cos >= $CosineThreshold"""))
  )

  // ---------------------------------------------------------------------
  private def simhashDf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "regexp_replace(regexp_replace(text, '\\\\s{2,}', ' '), '^\\\\s+|\\\\s+$', '') AS tc")
      .selectExpr(
        "doc_id",
        "transform(split(tc, ' '), t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint)) AS hv")
      .selectExpr(
        "doc_id",
        """aggregate(
             transform(sequence(0, 31, 1),
               j -> CASE WHEN aggregate(hv, 0L,
                            (acc, h) -> acc + CASE WHEN (h div shiftleft(cast(1 AS bigint), j)) % 2 = 1
                                              THEN 1L ELSE -1L END) > 0
                         THEN shiftleft(cast(1 AS bigint), j) ELSE 0L END),
             0L, (acc, v) -> acc + v) AS simhash""")

  private val simhashSql: String =
    """SELECT doc_id,
      |       list_sum(list_transform(generate_series(0, 31),
      |         j -> CASE WHEN list_sum(list_transform(hv,
      |                        h -> CASE WHEN (h // (1::BIGINT << j)) % 2 = 1 THEN 1 ELSE -1 END)) > 0
      |                   THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS simhash
      |FROM (SELECT doc_id,
      |             list_transform(string_split(tc, ' '),
      |                            t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hv
      |      FROM (SELECT doc_id, regexp_replace(regexp_replace(text, '\s{2,}', ' ', 'g'), '^\s+|\s+$', '', 'g') AS tc
      |            FROM documents))""".stripMargin
}
