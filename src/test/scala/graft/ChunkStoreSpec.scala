package graft

import graft.sources.ChunkStore
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

/** S3–S8 quirk-ledger tests (SURVEY.md §2.1): CSV round-trip drops
  * chunk_number, add is idempotent, positional ids are deterministic.
  */
class ChunkStoreSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_store").toString

  private def sampleChunks() = {
    import spark.implicits._
    Seq(
      ("alpha chunk text", "a.pdf", 1, 1, 3, Some(1)),
      ("beta chunk text", "a.pdf", 1, 1, 3, Some(2)),
      ("gamma chunk text", "a.pdf", 2, 1, 3, None: Option[Int]),
      ("delta chunk text", "b.pdf", 1, 1, 1, None: Option[Int]))
      .toDF("text", "source", "page_number", "paragraph_number", "total_pages", "chunk_number")
  }

  test("S1/S2: binaryFile scan keeps only .pdf (case-insensitive), exposes name+bytes") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.pdf"), "AAA".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "B.PDF"), "BBBB".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "notes.txt"), "no".getBytes)
    val got = ChunkStore.scanPdfDir(spark, dir).collect()
      .map(r => (r.getAs[String]("file_name"), r.getAs[Long]("n_bytes"),
        new String(r.getAs[Array[Byte]]("content")))).toSet
    assert(got == Set(("a.pdf", 3L, "AAA"), ("B.PDF", 4L, "BBBB")))
  }

  test("S3/S4: CSV round-trip preserves the 4 metadata fields and DROPS chunk_number") {
    val dir = tmp() + "/csv"
    ChunkStore.writeCsv(sampleChunks(), dir)
    val back = ChunkStore.readCsv(spark, dir)
    assert(back.columns.toSeq ==
      Seq("text", "source", "page_number", "paragraph_number", "total_pages"))
    assert(back.count() == 4)
    val row = back.where("text = 'alpha chunk text'").collect().head
    assert(row.getAs[String]("source") == "a.pdf")
    assert(row.getAs[Int]("page_number") == 1) // 1-based, preserved
  }

  test("S3/S4: embedded newlines and quotes survive the CSV round-trip intact") {
    import spark.implicits._
    val dir = tmp() + "/csv_nl"
    val tricky = Seq(
      ("line one\nline two", "a.pdf", 1, 1, 1, None: Option[Int]),
      ("says \"quoted\" and, commas", "a.pdf", 2, 1, 1, None: Option[Int]))
      .toDF("text", "source", "page_number", "paragraph_number", "total_pages", "chunk_number")
    ChunkStore.writeCsv(tricky, dir)
    val back = ChunkStore.readCsv(spark, dir)
    assert(back.count() == 2, "newline in a quoted field split a row")
    val texts = back.select("text").collect().map(_.getString(0)).toSet
    assert(texts == Set("line one\nline two", "says \"quoted\" and, commas"))
  }

  test("S3/S4: leading/trailing cell whitespace survives verbatim (Python-csv fidelity)") {
    import spark.implicits._
    val dir = tmp() + "/csv_ws"
    val ws = Seq(("  padded on both ends  ", "a.pdf", 1, 1, 1, None: Option[Int]))
      .toDF("text", "source", "page_number", "paragraph_number", "total_pages", "chunk_number")
    ChunkStore.writeCsv(ws, dir)
    val back = ChunkStore.readCsv(spark, dir).collect().head.getAs[String]("text")
    assert(back == "  padded on both ends  ",
      "CSV sink/source must not trim cell whitespace (the writer trims by default!)")
  }

  test("S5: positional ids chunk_{i} follow the given ordering from 0") {
    val withIds = ChunkStore.withPositionalIds(sampleChunks(), Seq("source", "page_number", "chunk_number"))
    val ids = withIds.orderBy("source", "page_number", "chunk_number")
      .select("id").collect().map(_.getString(0))
    assert(ids.toSet == Set("chunk_0", "chunk_1", "chunk_2", "chunk_3"))
    // ordering: a.pdf/1/1, a.pdf/1/2, a.pdf/2/null?  — nulls first in asc
    val first = withIds.where("text = 'beta chunk text'").collect().head.getAs[String]("id")
    assert(first.startsWith("chunk_"))
  }

  test("S5: positional ids are stable across re-materializations even with order ties") {
    import spark.implicits._
    // 60 rows, only 3 distinct orderCols values → heavy ties; the
    // persisted sort must hand out the same ids on every evaluation
    val ties = (0 until 60).map(i => (s"text_$i", s"src_${i % 3}", 1, 1, 1))
      .toDF("text", "source", "page_number", "paragraph_number", "total_pages")
    val withIds = ChunkStore.withPositionalIds(ties, Seq("source"))
    val first = withIds.select("text", "id").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val second = withIds.select("text", "id").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(first == second, "ids changed between materializations")
    assert(first.values.toSet == (0 until 60).map(i => s"chunk_$i").toSet)
  }

  test("S5: addDocuments is a NO-OP when the store is non-empty (reference guard)") {
    val store = tmp() + "/store"
    assert(ChunkStore.addDocuments(spark, sampleChunks(), store, Seq("source", "text")))
    val n1 = spark.read.parquet(store).count()
    // second add must be refused and leave the store untouched
    assert(!ChunkStore.addDocuments(spark, sampleChunks(), store, Seq("source", "text")))
    assert(spark.read.parquet(store).count() == n1)
  }

  test("S6: reset empties the store; a subsequent add succeeds again") {
    val store = tmp() + "/store"
    assert(ChunkStore.addDocuments(spark, sampleChunks(), store, Seq("source", "text")))
    val schema = spark.read.parquet(store).schema
    ChunkStore.reset(spark, store, schema)
    assert(spark.read.parquet(store).count() == 0)
    assert(ChunkStore.addDocuments(spark, sampleChunks(), store, Seq("source", "text")))
    assert(spark.read.parquet(store).count() == 4)
  }

  test("S5: store entries have stringified metadata + store-side embeddings (FIXTURES §1.2)") {
    val store = tmp() + "/store"
    ChunkStore.addDocuments(spark, sampleChunks(), store, Seq("source", "page_number", "text"))
    val df = spark.read.parquet(store)
    assert(df.columns.toSet == Set("id", "text", "metadata", "embedding"))
    val row = df.where("text = 'alpha chunk text'").collect().head
    val meta = row.getAs[Map[String, String]]("metadata")
    assert(meta("page_number") == "1") // stringified, "1" not 1
    assert(meta("source") == "a.pdf")
    assert(meta("chunk_number") == "1")
    val emb = row.getAs[scala.collection.Seq[Double]]("embedding")
    assert(emb.size == 64)
    assert(math.abs(emb.map(x => x * x).sum - 1.0) < 1e-9) // L2-normalized
  }

  test("V3/V4: similaritySearch returns the reference's result shape, ranked") {
    val store = tmp() + "/store"
    ChunkStore.addDocuments(spark, sampleChunks(), store, Seq("source", "page_number", "text"))
    val hits = ChunkStore.similaritySearch(spark, store, "alpha chunk text", topK = 2).collect()
    assert(hits.length == 2)
    assert(hits.head.getAs[String]("text") == "alpha chunk text") // exact match ranks first
    assert(hits.head.getAs[Double]("similarity") > 0.99)
    hits.foreach { h =>
      val s = h.getAs[Double]("similarity")
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
    }
  }

  test("V1 seam: a custom Embedder round-trips ingest → search") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    // toy embedding space: ASCII codes of the first 4 characters,
    // L2-normalized — nothing like the default hashed tokens (and a
    // space where the sample texts are pairwise distinct), so a pass
    // proves the seam carries the custom space end to end
    object PrefixCodeEmbedder extends Embedder {
      override val dim: Int = 4
      override def embed(text: Column): Column = {
        val counts = array((1 to dim).map(i => ascii(substring(text, i, 1))): _*)
          .cast("array<double>")
        val nrm = sqrt(aggregate(transform(counts, x => x * x), lit(0.0), (acc, v) => acc + v))
        when(nrm === 0.0, counts).otherwise(transform(counts, x => x / nrm))
      }
    }
    val store = tmp() + "/store"
    ChunkStore.addDocuments(spark, sampleChunks(), store, Seq("source", "text"),
      embedder = PrefixCodeEmbedder)
    val stored = spark.read.parquet(store)
    // ingest wrote 4-dim vectors from the CUSTOM space, not 64-dim
    val emb = stored.where("text = 'delta chunk text'").collect().head
      .getAs[scala.collection.Seq[Double]]("embedding")
    assert(emb.size == 4)
    assert(math.abs(emb.map(x => x * x).sum - 1.0) < 1e-9)
    // search with the SAME embedder finds the identical text at sim 1
    val hits = ChunkStore.similaritySearch(spark, store, "delta chunk text",
      topK = 1, embedder = PrefixCodeEmbedder).collect()
    assert(hits.head.getAs[String]("text") == "delta chunk text")
    assert(math.abs(hits.head.getAs[Double]("similarity") - 1.0) < 1e-9)
  }

  test("Q4: answerWithSources composes retrieval, citations, and the stub answer") {
    val store = tmp() + "/store"
    ChunkStore.addDocuments(spark, sampleChunks(), store, Seq("source", "page_number", "text"))
    // NOTE: "delta", not "gamma" — alpha/gamma md5-hash into the same
    // 64-bucket, making their embeddings identical (a legitimate
    // hashed-embedding collision; the tie then breaks by id)
    val resp = graft.operators.Qa.answerWithSources(spark, store, "delta chunk text", topK = 3)
    assert(resp.query == "delta chunk text")
    assert(resp.sources.length == 3)
    assert(resp.sources.head.text == "delta chunk text")
    assert(resp.answer.startsWith("根据资料, delta chunk text"))
    val ctx = graft.operators.Qa.formatContext(resp.sources)
    assert(ctx.contains("[来源1: 文档《b.pdf》第1页第1段]")) // delta is b.pdf page 1
  }

  test("S7/S8: JSON dump writes id/text rows; stats counts them") {
    val store = tmp() + "/store"
    ChunkStore.addDocuments(spark, sampleChunks(), store, Seq("source", "text"))
    val df = spark.read.parquet(store)
    val out = tmp() + "/dump"
    ChunkStore.dumpJson(df.select("id", "text"), out)
    assert(spark.read.json(out).count() == 4)
    assert(ChunkStore.stats(df, "graft_vectors") == (4L, "graft_vectors"))
  }

  test("S10: compaction shrinks the file count, keeps every row byte-identical") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "lang", "text")
    val base = tmp()
    docs.repartition(64).write.parquet(s"$base/small")
    spark.read.parquet(s"$base/small")
      .repartition(4).write.parquet(s"$base/compact")
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts(s"$base/small") == 64)
    assert(parts(s"$base/compact") == 4)
    // identical multiset of rows either side of the rewrite
    val a = spark.read.parquet(s"$base/small").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val b = spark.read.parquet(s"$base/compact").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}
