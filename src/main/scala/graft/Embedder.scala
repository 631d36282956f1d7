package graft

import org.apache.spark.sql.Column

/** V1 seam — the store's embedding function as a pluggable strategy,
  * mirroring the Q3 answerer seam (`Qa.answer(generate)`): the reference
  * embeds model-side inside the store (`src/vector_store.py:13,92-94`,
  * its SentenceTransformer), so a user swapping models must only swap
  * this object. The contract is COLUMN to COLUMN: an embedder is a
  * Catalyst expression builder, not a per-row closure — whatever it
  * returns participates in codegen/pushdown like any built-in, and a
  * model-backed implementation would wrap its batch inference in
  * `mapPartitions` behind the same signature.
  *
  * Invariant the store relies on: the SAME embedder instance must be
  * used at ingest ([[sources.ChunkStore.addDocuments]]) and at query
  * ([[sources.ChunkStore.similaritySearch]]) — cosine geometry is only
  * meaningful within one embedding space.
  */
trait Embedder extends Serializable {
  /** text column → array<double> vector column. */
  def embed(text: Column): Column
  /** Dimensionality of the produced vectors. */
  def dim: Int
}

/** Default embedder: the deterministic hashed-token embedding (64-dim,
  * L2-normalized, md5-derived buckets — reproducible in the DuckDB
  * oracle). Runs the codegen'd `embed64` kernel (graft.plans.TextHash);
  * [[Fns.embedText]] is the lambda-form reference implementation it is
  * spec-pinned against. Callers must have run
  * `graft.plans.VectorExprs.register(spark)` on the session (the
  * ChunkStore entry points do).
  */
object HashedTokenEmbedder extends Embedder {
  override def embed(text: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "embed64", Fns.tokens(Fns.cleanText(text)))
  override val dim: Int = 64
}
