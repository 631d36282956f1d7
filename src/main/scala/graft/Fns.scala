package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level building blocks (all Catalyst-native — no UDFs,
  * so everything stays inside whole-stage codegen / native evaluation
  * and is usable verbatim at 100 TB).
  */
object Fns {

  /** E4 whitespace normalization — reference `src/pdf_extractor.py:30`:
    * `re.sub(r'\s{2,}', ' ', paragraph).strip()`. NOT `trim()`: Python
    * strip removes tabs/newlines too, Spark/DuckDB trim only spaces —
    * the regex strip matches Python for all ASCII whitespace.
    */
  def cleanText(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\s{2,}", " "), "^\\s+|\\s+$", "")

  /** Deterministic 60-bit hash of a string: the first 15 hex digits of
    * md5, parsed base-16. Chosen because BOTH Spark and DuckDB compute
    * identical md5 over UTF-8, making every hash-derived operator
    * (minhash, simhash, fingerprints, hashed embeddings) exactly
    * oracle-checkable. 60 bits fits a signed int64 without overflow
    * under ANSI arithmetic.
    *
    * DuckDB equivalent: `('0x' || substr(md5(s), 1, 15))::BIGINT`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Whitespace word tokens of already-cleaned (single-spaced) text. */
  def tokens(cleaned: Column): Column = split(cleaned, " ")

  /** Dot product with explicit left-to-right double accumulation —
    * bit-identical to the DuckDB oracle's
    * `list_sum(list_transform(generate_series(1, n), i -> a[i]::DOUBLE * b[i]::DOUBLE))`.
    */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity in [-1, 1] (reference `src/vector_store.py:172`:
    * similarity = 1 - cosine_distance, i.e. plain cosine).
    */
  def cosine(a: Column, b: Column): Column = dotD(a, b) / (normD(a) * normD(b))

  /** V1 — deterministic hashed-token embedding (64-dim, L2-normalized):
    * the store-side embedding function (reference computes embeddings
    * inside the store, `src/vector_store.py:143-147`). Same bucket
    * counts as the scalable explode/groupBy pipeline in Knn.embedDocs —
    * this per-row form is for low-cardinality uses (store writes, query
    * strings).
    */
  def embedText(c: Column): Column = {
    val bks = transform(tokens(cleanText(c)), t => pmod(hash60(t), lit(64L)))
    val counts = transform(sequence(lit(0), lit(63), lit(1)),
      b => size(filter(bks, x => x === b)).cast("double"))
    val nrm = sqrt(aggregate(transform(counts, x => x * x), lit(0.0), (acc, v) => acc + v))
    when(nrm === 0.0, counts).otherwise(transform(counts, x => x / nrm))
  }

  /** Exact decimal(18,2) sum surfaced as double: order-independent
    * (decimal addition is associative), so Spark's partial/shuffle
    * aggregation order vs DuckDB's single-threaded order cannot cause
    * hash mismatches — unlike a raw double sum.
    */
  def moneySum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Same idea at 6 fractional digits for already-multiplied amounts. */
  def moneySum6(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")
}
