package graft

import java.nio.file.Files

/** End-to-end pipeline orchestration tests: the reference's three-stage
  * setup with P1/P2 skip guards, P3 force rebuild, and the P4
  * CSV-handoff quirk (chunk_number never reaches the store).
  */
class PipelineSpec extends SparkSpec {

  private def docs() = {
    import spark.implicits._
    Seq(
      (1L, "a readable document with enough characters to survive", "s1"),
      (2L, "x" * 950, "s2"), // splits into 3 chunks
      (3L, "tiny", "s3")) // dropped by E5
      .toDF("doc_id", "text", "source")
  }

  test("cold run extracts + indexes; warm run skips both (P1/P2)") {
    val work = Files.createTempDirectory("graft_pipe").toString
    val first = Pipeline.setupKnowledgeBase(spark, docs(), work)
    assert(first.extracted && first.indexed)
    assert(first.chunkCount == 4) // 1 + 3

    val second = Pipeline.setupKnowledgeBase(spark, docs(), work)
    assert(!second.extracted && !second.indexed) // both guards fire
    assert(second.chunkCount == 4)
  }

  test("force rebuild resets and reprocesses (P3)") {
    val work = Files.createTempDirectory("graft_pipe").toString
    Pipeline.setupKnowledgeBase(spark, docs(), work)
    val rebuilt = Pipeline.setupKnowledgeBase(spark, docs(), work, forceRebuild = true)
    assert(rebuilt.extracted && rebuilt.indexed)
    assert(rebuilt.chunkCount == 4)
  }

  test("store rows carry positional ids and NO chunk_number (P4/S4 quirk)") {
    val work = Files.createTempDirectory("graft_pipe").toString
    Pipeline.setupKnowledgeBase(spark, docs(), work)
    val store = spark.read.parquet(s"$work/vector_store")
    assert(!store.columns.contains("chunk_number"))
    val ids = store.select("id").collect().map(_.getString(0)).toSet
    assert(ids == Set("chunk_0", "chunk_1", "chunk_2", "chunk_3"))
  }
}
