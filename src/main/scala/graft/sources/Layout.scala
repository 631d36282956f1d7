package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: multi-dimensional (z-order) clustering for
  * min-max data skipping — the scan-avoidance half of the 100 TB story
  * that compaction (s10_compact) leaves open.
  *
  * Parquet keeps per-column min/max statistics per row group, and
  * Spark's pushed filters skip row groups whose range excludes the
  * predicate. A layout sorted by ONE column only skips for predicates
  * on that column; a z-ordered (Morton-interleaved) layout makes every
  * row group a small rectangle in two-dimensional key space, so
  * selective predicates on EITHER dimension skip most of the corpus.
  * At 100 TB the difference is reading a few hundred GB instead of the
  * full table for a point-ish query — no index structure, no metadata
  * service, just file statistics the format already stores.
  *
  * The z-value itself never reaches the output (it is dropped before
  * the write); only the ROW ORDER changes, which is why the gate row's
  * oracle can ignore the layout entirely and aggregate the raw table.
  * PlanShapeSpec pins the part the oracle cannot see: the scan-level
  * row counts under selective predicates on both dimensions, against a
  * single-column-sorted control layout.
  */
object Layout {

  /** Spread the low 16 bits of `c` so a bit lands at every even
    * position — the classic Morton bit-interleave stages, each mask
    * halving the gap (0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555).
    * Pure codegen'd int arithmetic: no UDF in the write path.
    */
  private def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFF))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FF))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0F))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555))
  }

  /** Morton z-value of two dimensions (low 16 bits each): x on even bit
    * positions, y on odd. Contiguous z ranges are near-square cells in
    * (x, y) space — the property min/max skipping needs.
    */
  private[graft] def zValue(x: Column, y: Column): Column =
    spread16(x.cast("int")).bitwiseOR(shiftleft(spread16(y.cast("int")), 1))

  /** Rewrite `df` as `nFiles` z-clustered parquet files at `path`:
    * scale both dimensions to the full 16-bit range, range-partition on
    * the interleaved z-value (so files cover disjoint z ranges), sort
    * within each file (so row groups inside a file are rectangles too),
    * then drop the helper column — the layout is carried entirely by
    * row order and file statistics.
    *
    * The min/max scaling is what makes the interleave fair: raw
    * interleaving gives the dimension with more significant bits the
    * top z positions (events' 8-bit user ids vs 5-bit days made the
    * order user-major and day predicates barely pruned — measured
    * before the fix). Scaling costs one bounded stats row (4 values,
    * broadcast); the rewrite itself is one shuffle of the table, the
    * same cost class as any compaction, paid once to accelerate every
    * later selective scan.
    */
  private[graft] def zOrderWrite(df: DataFrame, path: String, nFiles: Int,
                                 x: Column, y: Column): Unit = {
    val stats = df.agg(
      min(x).cast("double").as("xlo"), max(x).cast("double").as("xhi"),
      min(y).cast("double").as("ylo"), max(y).cast("double").as("yhi"))
    def scaled(c: Column, lo: Column, hi: Column): Column =
      when(hi > lo, ((c.cast("double") - lo) * 65535.0 / (hi - lo)).cast("int"))
        .otherwise(lit(0))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(
        scaled(x, col("xlo"), col("xhi")), scaled(y, col("ylo"), col("yhi"))))
      .drop("xlo", "xhi", "ylo", "yhi")
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  private val bandAgg = Seq(
    "cast(count(*) AS bigint) AS n_events",
    "cast(count(DISTINCT user_id) AS bigint) AS n_users",
    "cast(sum(cast(value AS decimal(18,6))) AS double) AS sum_value",
    "cast(sum(event_id) AS bigint) AS id_fold")

  private val bandAggSql =
    """count(*)::BIGINT AS n_events,
               count(DISTINCT user_id)::BIGINT AS n_users,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
               sum(event_id)::BIGINT AS id_fold"""

  val queries: Seq[QueryDef] = Seq(
    // S11 — z-order layout round trip: rewrite events z-clustered on
    // (user_id, day), then answer one selective band per dimension from
    // the rewritten files. The oracle aggregates the raw table — any
    // row the rewrite lost, duplicated, or reordered into the wrong
    // band breaks count/id_fold/sum_value. The skipping itself (scan
    // row counts vs a single-column-sorted control) is pinned in
    // PlanShapeSpec; user band 3–5 and day band 10–12 are non-empty at
    // every test SF (user ids scale with SF, days always span 1–30).
    QueryDef(
      "s11_zorder_scan",
      (spark, dir) => {
        val ev = Tables.events(spark, dir).selectExpr(
          "event_id", "user_id", "event_type", "value",
          "cast(day(ts) AS int) AS d")
        val base = graft.TmpDirs.create("graft_s11").toString
        zOrderWrite(ev, s"$base/z", 16, col("user_id"), col("d"))
        val zr = spark.read.parquet(s"$base/z")
        val userBand = zr.where("user_id BETWEEN 3 AND 5")
          .groupBy("event_type")
          .agg(expr(bandAgg.head), bandAgg.tail.map(expr): _*)
          .selectExpr(Seq("'user_band' AS band", "event_type") ++
            Seq("n_events", "n_users", "sum_value", "id_fold"): _*)
        val dayBand = zr.where("d BETWEEN 10 AND 12")
          .groupBy("event_type")
          .agg(expr(bandAgg.head), bandAgg.tail.map(expr): _*)
          .selectExpr(Seq("'day_band' AS band", "event_type") ++
            Seq("n_events", "n_users", "sum_value", "id_fold"): _*)
        userBand.unionByName(dayBand)
      },
      Some(s"""
        WITH e AS (SELECT event_id, user_id, event_type, value, day(ts)::INT AS d
                   FROM events)
        SELECT 'user_band' AS band, event_type,
               $bandAggSql
        FROM e WHERE user_id BETWEEN 3 AND 5 GROUP BY event_type
        UNION ALL
        SELECT 'day_band' AS band, event_type,
               $bandAggSql
        FROM e WHERE d BETWEEN 10 AND 12 GROUP BY event_type"""),
      bench = false, sinkBench = true)
  )
}
