package graft

import graft.sources.Lake

/** Versioned-store semantics: manifest-gated commits (write-audit-
  * publish), snapshot isolation across upserts, and merge behavior for
  * the three MERGE cases (update / insert / carry-over).
  */
class LakeSpec extends SparkSpec {

  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_lake_spec").toString + "/t"

  test("a data directory without a manifest entry is not a committed version") {
    val root = freshRoot()
    val v0 = Lake.commitVersion(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    assert(v0 == 0 && Lake.versions(root) == Seq(0))
    // simulate a writer crash AFTER data files, BEFORE the manifest
    // append: the orphan directory must be invisible to readers
    Seq((9L, "orphan")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$root/v=1")
    assert(Lake.versions(root) == Seq(0))
    assert(Lake.readVersion(spark, root).count() == 2)
    // the next real commit publishes over the orphan slot
    val v1 = Lake.commitVersion(spark, Seq((3L, "c")).toDF("k", "v"), root)
    assert(v1 == 1 && Lake.versions(root) == Seq(0, 1))
    assert(Lake.readVersion(spark, root).count() == 1)
  }

  test("upsert merges all three MERGE cases and old snapshots stay pristine") {
    val root = freshRoot()
    Lake.commitVersion(spark,
      Seq((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L)).toDF("k", "name", "x"),
      root)
    Lake.upsert(spark,
      Seq((2L, "TWO", 200L), (4L, "four", 40L)).toDF("k", "name", "x"),
      root, "k")
    val v1 = Lake.readVersion(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(v1 == Set(
      (1L, "one", 10L),    // carry-over
      (2L, "TWO", 200L),   // update wins
      (3L, "three", 30L),  // carry-over
      (4L, "four", 40L)))  // insert
    // time travel: the pre-upsert snapshot is byte-for-byte the base
    val v0 = Lake.readVersion(spark, root, Some(0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(v0 == Set((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L)))
  }

  test("merge-on-read: later delta wins per key, and compaction changes nothing") {
    val root = freshRoot()
    Lake.commitVersion(spark,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "x"), root)
    Lake.appendDelta(spark, Seq((2L, 200L), (4L, 40L)).toDF("k", "x"), root)
    Lake.appendDelta(spark, Seq((2L, 2000L)).toDF("k", "x"), root)
    def resolved() = Lake.readResolved(spark, root, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = resolved()
    assert(before == Set((1L, 10L), (2L, 2000L), (3L, 30L), (4L, 40L)))
    // an orphan delta directory without a manifest line is invisible
    Seq((9L, 999L)).toDF("k", "x").write.mode("overwrite").parquet(s"$root/d=3")
    assert(resolved() == before)
    // compaction folds the deltas into a fresh base: content identical,
    // delta list reset, and the pre-compaction version still readable
    Lake.compact(spark, root, "k")
    assert(resolved() == before)
    assert(Lake.readVersion(spark, root, Some(0)).count() == 3)
  }

  test("randomized operation sequences match an in-memory reference model") {
    // model-based check: a random interleaving of COW upserts, COW
    // deletes, MOR delta appends, and compactions must leave the
    // RESOLVED table equal to a plain Map fold of the same operations
    // — the whole-store invariant no single-path test pins
    val rng = new scala.util.Random(20260814)
    for (trial <- 1 to 3) {
      val root = freshRoot() + s"_t$trial"
      var model = (0L until 20L).map(k => k -> (k * 10L)).toMap
      Lake.commitVersion(spark, model.toSeq.toDF("k", "x"), root)
      for (step <- 1 to 8) {
        rng.nextInt(4) match {
          case 0 => // COW upsert of a random batch (updates + fresh keys)
            val upd = Seq.fill(rng.nextInt(5) + 1)(
              rng.nextInt(30).toLong -> (step * 1000L + rng.nextInt(100))).toMap
            // MOR deltas must see the same base: fold pending deltas
            // first is NOT modeled — so compact before any COW op
            Lake.compact(spark, root, "k")
            Lake.upsert(spark, upd.toSeq.toDF("k", "x"), root, "k")
            model = model ++ upd
          case 1 => // COW delete of a random predicate
            val cut = rng.nextInt(30).toLong
            Lake.compact(spark, root, "k")
            Lake.deleteWhere(spark, root, s"k % 30 = $cut")
            model = model.filter { case (k, _) => k % 30 != cut }
          case 2 => // MOR delta append (latest wins per key)
            val upd = Seq.fill(rng.nextInt(5) + 1)(
              rng.nextInt(30).toLong -> (step * 1000L + 500L + rng.nextInt(100))).toMap
            Lake.appendDelta(spark, upd.toSeq.toDF("k", "x"), root)
            model = model ++ upd
          case 3 =>
            Lake.compact(spark, root, "k")
        }
        val got = Lake.readResolved(spark, root, "k")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == model, s"trial $trial diverged at step $step")
      }
    }
  }

  test("readVersion rejects uncommitted version numbers") {
    val root = freshRoot()
    Lake.commitVersion(spark, Seq((1L, "a")).toDF("k", "v"), root)
    intercept[IllegalArgumentException] {
      Lake.readVersion(spark, root, Some(7))
    }
    intercept[IllegalArgumentException] {
      Lake.readVersion(spark, root + "_missing")
    }
  }
}
