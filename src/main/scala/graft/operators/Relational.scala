package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Relational extensions over the TPC-H-ish driver tables.
  *
  * The reference has no joins/group-bys (SURVEY.md §2.7) — these queries
  * are the engine-extension surface that proves the scale design:
  * broadcast joins for dimension tables, partial aggregation for
  * group-bys, decimal accumulation for order-independent money sums,
  * TakeOrderedAndProject for top-k, window functions over properly
  * partitioned keys.
  */
object Relational {

  def queries: Seq[QueryDef] = Seq(
    // TPC-H Q1 flavor: single scan + partial agg; the shuffle moves only
    // (flag, status) × partial states — negligible at any scale. Sums use
    // decimal accumulation (associative ⇒ order-independent ⇒ identical
    // to the single-threaded DuckDB oracle), surfaced as double.
    QueryDef(
      "q1_agg",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .where("l_shipdate <= timestamp'1998-09-02 00:00:00'")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            expr("cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty"),
            expr("cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_base_price"),
            expr("cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,6))) AS double) AS sum_disc_price"),
            expr("cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS decimal(18,6))) AS double) AS sum_charge"),
            expr("count(*) AS count_order")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")),

    // TPC-H Q3 flavor: customer (small dim) is broadcast — no shuffle of
    // the fact table for that join; orders⋈lineitem shuffles on orderkey
    // (the natural co-partition key). Top-10 goes through
    // TakeOrderedAndProject (no global sort). Tie-break on o_orderkey
    // keeps the LIMIT set deterministic across engines.
    QueryDef(
      "q3_top_orders",
      (spark, dir) => {
        val cust = Tables.customer(spark, dir).where("c_mktsegment = 'BUILDING'")
        val ord = Tables.orders(spark, dir)
        val li = Tables.lineitem(spark, dir)
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy(col("l_orderkey"), expr("cast(cast(o_orderdate AS timestamp) AS long)").as("o_orderdate_epoch"))
          .agg(expr("cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,6))) AS double) AS revenue"))
          .orderBy(desc("revenue"), col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, epoch(o_orderdate)::BIGINT AS o_orderdate_epoch,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY 1, 2
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")),

    // TPC-H Q5 flavor: star join where region/nation/supplier/customer are
    // all broadcast (each ≪ the 10 MB default threshold even at sf100);
    // only the orders⋈lineitem edge shuffles.
    QueryDef(
      "q5_nation_revenue",
      (spark, dir) => {
        val li = Tables.lineitem(spark, dir)
        val ord = Tables.orders(spark, dir)
        val cust = Tables.customer(spark, dir)
        val nat = Tables.nation(spark, dir)
        val reg = Tables.region(spark, dir)
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            expr("cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,6))) AS double) AS revenue"),
            expr("count(*) AS n_lineitems"))
      },
      Some("""
        SELECT r_name, n_name,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")),

    // Window function: running spend per customer. Partitioned by
    // custkey (high-cardinality ⇒ balanced shuffle), ordered by
    // (orderdate, orderkey) for a deterministic frame. Running sums in
    // decimal: a prefix sum is order-FIXED, so decimal keeps every
    // prefix exact and cross-engine identical.
    QueryDef(
      "w1_running_spend",
      (spark, dir) =>
        Tables.orders(spark, dir)
          .selectExpr(
            "o_custkey", "o_orderkey",
            "cast(cast(o_orderdate AS timestamp) AS long) AS o_orderdate_epoch",
            "cast(o_totalprice AS decimal(18,2)) AS price_d")
          .selectExpr(
            "o_custkey", "o_orderkey", "o_orderdate_epoch",
            """cast(sum(price_d) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate_epoch, o_orderkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS double) AS running_spend""",
            """cast(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate_epoch, o_orderkey) AS bigint) AS order_seq"""),
      Some("""
        SELECT o_custkey, o_orderkey, epoch(o_orderdate)::BIGINT AS o_orderdate_epoch,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY epoch(o_orderdate)::BIGINT, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY epoch(o_orderdate)::BIGINT, o_orderkey) AS order_seq
        FROM orders""")),

    // Bounded-frame window: 4-order trailing moving average per
    // customer (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) — the sliding
    // frame complements w1's unbounded running sum. A bounded ROWS
    // frame evaluates incrementally per partition (no re-scan per row);
    // decimal accumulation keeps the fixed-order prefix arithmetic
    // identical across engines, surfaced as a rounded double.
    QueryDef(
      "w2_moving_avg",
      (spark, dir) =>
        Tables.orders(spark, dir)
          .selectExpr(
            "o_custkey", "o_orderkey",
            "cast(cast(o_orderdate AS timestamp) AS long) AS o_orderdate_epoch",
            "cast(o_totalprice AS decimal(18,2)) AS price_d")
          .selectExpr(
            "o_custkey", "o_orderkey", "o_orderdate_epoch",
            """round(cast(avg(price_d) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate_epoch, o_orderkey
                                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                     AS double), 6) AS moving_avg_4"""),
      Some("""
        SELECT o_custkey, o_orderkey, epoch(o_orderdate)::BIGINT AS o_orderdate_epoch,
               round(CAST(avg(CAST(o_totalprice AS DECIMAL(18,2)))
                          OVER (PARTITION BY o_custkey
                                ORDER BY epoch(o_orderdate)::BIGINT, o_orderkey
                                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS moving_avg_4
        FROM orders""")),

    // Time-based RANGE frame — the window shape w2's ROWS frame cannot
    // express: each order sums the customer's spend over the PRECEDING
    // 30 DAYS of wall-clock, however many orders that is (RANGE frames
    // also include same-timestamp peers, which both engines define
    // identically over the integer epoch key). Same scale story as
    // every w-row: partition-bounded sort on a high-cardinality key,
    // never a global ORDER BY; money folds as exact decimal inside the
    // frame.
    QueryDef(
      "w4_range_spend",
      (spark, dir) =>
        Tables.orders(spark, dir)
          .selectExpr(
            "o_custkey", "o_orderkey",
            "cast(cast(o_orderdate AS timestamp) AS long) AS o_orderdate_epoch",
            "cast(o_totalprice AS decimal(18,2)) AS price_d")
          .selectExpr(
            "o_custkey", "o_orderkey", "o_orderdate_epoch",
            """cast(sum(price_d) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate_epoch
                                       RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
                    AS double) AS spend_30d"""),
      Some("""
        SELECT o_custkey, o_orderkey, epoch(o_orderdate)::BIGINT AS o_orderdate_epoch,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY epoch(o_orderdate)::BIGINT
                          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
        FROM orders""")),

    // Set operations — the reference only unions (C3); intersect/except
    // complete the family. Spark plans these as aggregate-based
    // semi/anti joins on the hashed key — shuffle on custkey, no
    // broadcast needed, skew-free for a key that IS the row identity.
    QueryDef(
      "set_ops",
      (spark, dir) => {
        val building = Tables.customer(spark, dir)
          .where("c_mktsegment = 'BUILDING'").select("c_custkey")
        val bigSpenders = Tables.orders(spark, dir)
          .where("o_totalprice > 200000").select(col("o_custkey").as("c_custkey")).distinct()
        building.intersect(bigSpenders).selectExpr("'both' AS op", "c_custkey")
          .unionByName(building.except(bigSpenders).selectExpr("'building_only' AS op", "c_custkey"))
          .unionByName(bigSpenders.except(building).selectExpr("'big_spender_only' AS op", "c_custkey"))
      },
      Some("""
        WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000)
        SELECT 'both' AS op, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM big)
        UNION ALL
        SELECT 'building_only' AS op, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM big)
        UNION ALL
        SELECT 'big_spender_only' AS op, c_custkey FROM (SELECT * FROM big EXCEPT SELECT * FROM building)""")),

    // Grouping sets / rollup — absent from the reference (SURVEY §2.7),
    // included as engine surface: per (returnflag, linestatus) with
    // subtotals. grouping_id disambiguates NULL-as-subtotal from data
    // NULLs in both engines.
    QueryDef(
      "q6_rollup",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            expr("count(*) AS n_rows"),
            expr("cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty"),
            expr("cast(grouping_id(l_returnflag, l_linestatus) AS bigint) AS gid")),
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               grouping_id(l_returnflag, l_linestatus)::BIGINT AS gid
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // Cube — all 2^n grouping combinations (rollup's sibling; same
    // Expand-based plan, one extra grouping set). Completes the
    // grouping-sets family from SURVEY §2.7's absence list.
    QueryDef(
      "q6_cube",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            expr("count(*) AS n_rows"),
            expr("cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty"),
            expr("cast(grouping_id(l_returnflag, l_linestatus) AS bigint) AS gid")),
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               grouping_id(l_returnflag, l_linestatus)::BIGINT AS gid
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    // Arbitrary GROUPING SETS — the non-hierarchical case rollup/cube
    // cannot express: region totals, nation totals, and the grand total
    // WITHOUT the (region, nation) detail level. Uses the Spark 4
    // Dataset.groupingSets API; the plan is the same single-scan Expand
    // as rollup (one row multiplied per set, partial-aggregated before
    // the exchange) — n sets cost n× map output, never n scans.
    QueryDef(
      "q7_grouping_sets",
      (spark, dir) => {
        val joined = Tables.orders(spark, dir)
          .join(Tables.customer(spark, dir),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(spark, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(spark, dir)),
            col("n_regionkey") === col("r_regionkey"))
        joined.groupingSets(
            Seq(Seq(col("r_name")), Seq(col("n_name")), Seq.empty),
            col("r_name"), col("n_name"))
          .agg(
            expr("count(*) AS n_orders"),
            expr("cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS revenue"),
            expr("cast(grouping_id(r_name, n_name) AS bigint) AS gid"))
      },
      Some("""
        SELECT r_name, n_name, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               grouping_id(r_name, n_name)::BIGINT AS gid
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())""")),

    // Distribution window functions — ntile / percent_rank / cume_dist
    // complete the window family (w1 prefix frame, w2 sliding frame,
    // rank windows inside kNN). Customer lifetime spend ranks into
    // deciles WITHIN market segment: the partition key bounds the sort
    // (5 segments here; at 100 TB the pattern is the same — partition
    // by a real key, never a global ORDER BY; a truly global ranking
    // would use range partitioning + per-range offsets instead).
    // Deterministic: total tie-break (spend DESC, custkey), and the
    // rank-derived ratios are exact-integer divisions.
    QueryDef(
      "w3_spend_deciles",
      (spark, dir) => {
        val spend = Tables.orders(spark, dir)
          .groupBy("o_custkey")
          .agg(expr("cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS spend"))
        Tables.customer(spark, dir)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .selectExpr("c_custkey", "c_mktsegment", "spend")
          .selectExpr("c_custkey", "c_mktsegment", "spend",
            """cast(ntile(10) OVER (PARTITION BY c_mktsegment
                                    ORDER BY spend DESC, c_custkey) AS bigint) AS decile""",
            """round(percent_rank() OVER (PARTITION BY c_mktsegment
                                          ORDER BY spend DESC, c_custkey), 6) AS pct_rank""",
            """round(cume_dist() OVER (PARTITION BY c_mktsegment
                                       ORDER BY spend DESC, c_custkey), 6) AS cume""")
      },
      Some("""
        WITH spend AS (
          SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
          FROM orders GROUP BY o_custkey)
        SELECT c_custkey, c_mktsegment, spend,
               ntile(10) OVER (PARTITION BY c_mktsegment
                               ORDER BY spend DESC, c_custkey)::BIGINT AS decile,
               round(percent_rank() OVER (PARTITION BY c_mktsegment
                                          ORDER BY spend DESC, c_custkey), 6) AS pct_rank,
               round(cume_dist() OVER (PARTITION BY c_mktsegment
                                       ORDER BY spend DESC, c_custkey), 6) AS cume
        FROM customer
        JOIN spend ON c_custkey = o_custkey""")),

    // Bloom-filter runtime semi-join — the pre-filter a 100 TB join
    // plans before shuffling the probe side (Spark's own runtime
    // filters do exactly this, but their hash is engine-private and
    // invisible to an oracle). This one is engineered for the gate:
    // k = 4 md5-derived bit positions over an m = 8192-bit bitmap held
    // as 131 bigint words (63 usable bits each — DuckDB's << raises on
    // a 63-bit shift, so bit 63 is never used); the build side ORs word masks (bit_or is
    // order-independent, so the bitmap is deterministic across engines
    // and partitionings), folds to ONE broadcast row, and the probe
    // side evaluates all four membership bits inside its scan — no
    // shuffle, no explode. Output: probe/pass/true counts and the
    // measured false-positive rate. n_pass ≥ n_true is the no-false-
    // negative guarantee (spec-pinned; a hash mismatch here means the
    // filter dropped a real match).
    QueryDef(
      "q8_bloom_semijoin",
      (spark, dir) => {
        val M = 8192L
        val W = 131 // 63 usable bits per word: DuckDB raises on 1 << 63
        def posS(col: String, j: Int) =
          s"pmod(cast(conv(substring(md5(concat(cast($col AS string), '_$j')), 1, 15), 16, 10) AS bigint), $M)"
        val build = Tables.customer(spark, dir)
          .where("c_mktsegment = 'BUILDING'")
          .selectExpr((0 until 4).map(j => s"${posS("c_custkey", j)} AS p$j"): _*)
          .selectExpr("stack(4, p0, p1, p2, p3) AS p")
          .selectExpr("p div 63 AS w", "shiftleft(1L, cast(p % 63 AS int)) AS m")
          .groupBy("w").agg(expr("bit_or(m) AS bits"))
        val bm = broadcast(
          spark.range(0, W)
            .selectExpr("cast(id AS bigint) AS w")
            .join(build, Seq("w"), "left")
            .selectExpr("w", "coalesce(bits, 0L) AS bits")
            .groupBy()
            .agg(expr("transform(sort_array(collect_list(named_struct('w', w, 'b', bits))), x -> x.b) AS bm")))
        val probeOk = (0 until 4).map { j =>
          s"(element_at(bm, cast(${posS("o_custkey", j)} div 63 AS int) + 1) & shiftleft(1L, cast(${posS("o_custkey", j)} % 63 AS int))) != 0"
        }.mkString(" AND ")
        val probed = Tables.orders(spark, dir)
          .crossJoin(bm)
          .selectExpr("o_custkey", s"CASE WHEN $probeOk THEN 1L ELSE 0L END AS pass")
        val trueKeys = Tables.customer(spark, dir)
          .where("c_mktsegment = 'BUILDING'").select("c_custkey")
        val nTrue = Tables.orders(spark, dir)
          .join(trueKeys, col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy().agg(expr("count(*) AS n_true"))
        probed.groupBy()
          .agg(expr("count(*) AS n_probe"), expr("sum(pass) AS n_pass"))
          .crossJoin(broadcast(nTrue))
          .selectExpr("n_probe", "n_pass", "n_true",
            "n_pass - n_true AS n_false_pos",
            "round(cast(n_pass - n_true AS double) / cast(n_probe - n_true AS double), 6) AS fp_rate")
      },
      Some(s"""
        WITH pos AS (
          SELECT c_custkey, j,
                 ('0x' || substr(md5(c_custkey::VARCHAR || '_' || j::VARCHAR), 1, 15))::BIGINT % 8192 AS p
          FROM customer, (SELECT unnest(generate_series(0, 3)) AS j) js
          WHERE c_mktsegment = 'BUILDING'),
        words AS (
          SELECT p // 63 AS w, bit_or(1::BIGINT << (p % 63)::INT) AS bits
          FROM pos GROUP BY 1),
        bm AS (
          SELECT list(coalesce(words.bits, 0) ORDER BY gs.w) AS bm
          FROM (SELECT unnest(generate_series(0, 130)) AS w) gs
          LEFT JOIN words ON gs.w = words.w),
        probed AS (
          SELECT o_custkey,
                 CASE WHEN ${(0 until 4).map(j =>
                   s"(bm.bm[(('0x' || substr(md5(o_custkey::VARCHAR || '_$j'), 1, 15))::BIGINT % 8192) // 63 + 1] & (1::BIGINT << ((('0x' || substr(md5(o_custkey::VARCHAR || '_$j'), 1, 15))::BIGINT % 8192) % 63)::INT)) != 0").mkString(" AND ")}
                      THEN 1 ELSE 0 END AS pass
          FROM orders, bm),
        t AS (
          SELECT count(*) AS n_true FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
        SELECT count(*) AS n_probe, sum(pass)::BIGINT AS n_pass, min(t.n_true) AS n_true,
               sum(pass)::BIGINT - min(t.n_true) AS n_false_pos,
               round((sum(pass)::BIGINT - min(t.n_true))::DOUBLE / (count(*) - min(t.n_true))::DOUBLE, 6) AS fp_rate
        FROM probed, t""")),

    // Salted skew join through the gate — Skew.saltedJoin was spec-only
    // (SkewSpec pins the partition spreading); this row proves its
    // RESULT through the oracle: segment revenue computed via the
    // salted orders⋈customer join must equal the plain-join aggregate
    // DuckDB runs. The salt is pmod(o_orderkey, 8) — deterministic, so
    // retries and both engines see the same rows; the customer side
    // replicates 8× (fine: it is the small input). This is the manual
    // fallback when AQE's skew splitting cannot see a hot key (e.g.
    // pre-shuffle aggregation hides it).
    QueryDef(
      "q9_skew_salted_join",
      (spark, dir) => {
        val joined = Skew.saltedJoin(
          Tables.orders(spark, dir),
          Tables.customer(spark, dir).selectExpr("c_custkey AS o_custkey", "c_mktsegment"),
          key = "o_custkey",
          saltSource = col("o_orderkey"),
          saltFactor = 8)
        joined.groupBy("c_mktsegment")
          .agg(
            expr("count(*) AS n_orders"),
            expr("cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS revenue"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")),

    // ------------------------------------- EXISTS decorrelation (Q4 shape)
    // TPC-H Q4's plan shape: an EXISTS subquery that Catalyst
    // decorrelates into a LEFT SEMI hash join — the probe side carries
    // no payload from the filter side, and the semi join deduplicates
    // matches for free (a plain join + distinct would shuffle the
    // multiplicity). Priority counts over orders that have at least one
    // discounted line item.
    QueryDef(
      "q10_exists_semi",
      (spark, dir) =>
        Tables.orders(spark, dir)
          .where("o_orderstatus != 'F'")
          .join(Tables.lineitem(spark, dir).where("l_discount > 0.05")
              .select(col("l_orderkey").as("o_orderkey")),
            Seq("o_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(expr("cast(count(*) AS bigint) AS n_orders")),
      Some("""
        SELECT o_orderpriority, count(*)::BIGINT AS n_orders
        FROM orders o
        WHERE o_orderstatus != 'F'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
        GROUP BY o_orderpriority""")),

    // ---------------------------- zero-inclusive distribution (Q13 shape)
    // TPC-H Q13: how many customers placed k orders, INCLUDING k = 0 —
    // the left outer join whose unmatched side must survive into the
    // aggregate (an inner join silently erases the zero bucket, the
    // classic Q13 bug). Two aggregations: per-customer count, then the
    // count-of-counts histogram; both partial-aggregate before their
    // exchange.
    QueryDef(
      "q11_cust_order_dist",
      (spark, dir) =>
        Tables.customer(spark, dir).select("c_custkey")
          .join(Tables.orders(spark, dir)
              .selectExpr("o_custkey AS c_custkey", "o_orderkey"),
            Seq("c_custkey"), "left")
          .groupBy("c_custkey")
          .agg(expr("cast(count(o_orderkey) AS bigint) AS n_orders"))
          .groupBy("n_orders")
          .agg(expr("cast(count(*) AS bigint) AS n_customers")),
      Some("""
        SELECT n_orders, count(*)::BIGINT AS n_customers
        FROM (
          SELECT c_custkey, count(o_orderkey)::BIGINT AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
        GROUP BY n_orders""")),

    // ------------------------------- HAVING-IN semi join (Q18 shape)
    // TPC-H Q18 (large-volume customers): orders whose line items sum
    // past a quantity threshold, joined back to customer detail. The
    // IN (SELECT ... GROUP BY ... HAVING) subquery becomes an
    // aggregate-then-semi-join: the HAVING aggregate reduces lineitem
    // to the qualifying key set FIRST (tiny — broadcasts), so the
    // orders⋈customer side never sees disqualified keys. Top-20 by
    // (totalprice, orderkey) plans as TakeOrderedAndProject.
    QueryDef(
      "q12_big_orders",
      (spark, dir) => {
        // The threshold must see the SAME value on both engines: an
        // exact decimal sum (order-independent across partitions), with
        // the > 220 applied to it un-truncated. A bigint cast here
        // would truncate in Spark but round in DuckDB, diverging for
        // fractional quantity sums (e.g. 220.5).
        val bigKeys = Tables.lineitem(spark, dir)
          .groupBy("l_orderkey")
          .agg(expr(
            "cast(sum(cast(l_quantity AS decimal(18,6))) AS double) AS total_qty"))
          .where("total_qty > 220")
        Tables.orders(spark, dir)
          .join(bigKeys.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
          .join(Tables.customer(spark, dir)
              .selectExpr("c_custkey AS o_custkey", "c_name", "c_mktsegment"),
            Seq("o_custkey"))
          .selectExpr("o_orderkey", "o_custkey", "c_mktsegment", "total_qty",
            "cast(o_totalprice AS double) AS total_price")
          .orderBy(desc("total_price"), col("o_orderkey"))
          .limit(20)
      },
      Some("""
        SELECT o_orderkey, o_custkey, c_mktsegment, total_qty,
               o_totalprice::DOUBLE AS total_price
        FROM orders
        JOIN (SELECT l_orderkey,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 220) b
          ON o_orderkey = b.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_price DESC, o_orderkey
        LIMIT 20""")),

    // ------------------------------- promo revenue share (TPC-H Q14)
    // Per ship-month: what fraction of revenue came from promotional
    // parts. The classic conditional-aggregation-over-a-join shape:
    // part is the broadcast dimension, the promo flag evaluates
    // row-local, and both legs of the ratio come out of ONE aggregate
    // pass. Money folds as exact decimal micros (bigint after ×1e6),
    // and the share is integer ppm — promo_micros div (total div 1e6)
    // applies the SAME truncation order in both engines, so no float
    // division ever reaches the hash.
    QueryDef(
      "q14_promo_share",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .selectExpr("l_partkey", "l_extendedprice", "l_discount",
            "date_format(l_shipdate, 'yyyy-MM') AS ship_month")
          .join(broadcast(Tables.part(spark, dir).selectExpr("p_partkey", "p_type")),
            expr("l_partkey = p_partkey"))
          .groupBy("ship_month")
          .agg(
            expr("""cast(sum(CASE WHEN p_type = 'PROMO'
                                  THEN cast(l_extendedprice * (1 - l_discount) AS decimal(18,6))
                                  ELSE cast(0 AS decimal(18,6)) END) * 1000000 AS bigint)
                    AS promo_micros"""),
            expr("""cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,6)))
                         * 1000000 AS bigint) AS total_micros"""))
          .selectExpr("ship_month", "promo_micros", "total_micros",
            "promo_micros div (total_micros div 1000000) AS promo_ppm"),
      Some("""
        SELECT ship_month, promo_micros, total_micros,
               (promo_micros // (total_micros // 1000000))::BIGINT AS promo_ppm
        FROM (
          SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                 CAST(sum(CASE WHEN p_type = 'PROMO'
                               THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                               ELSE CAST(0 AS DECIMAL(18,6)) END) * 1000000 AS BIGINT) AS promo_micros,
                 CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                      * 1000000 AS BIGINT) AS total_micros
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1)""")),

    // -------------------------------- top supplier by view (TPC-H Q15)
    // Suppliers tied for the maximum quarterly revenue — the
    // WHERE-rev-=-(SELECT-max) view shape. The per-supplier aggregate
    // reduces the quarter's lineitems once; its max folds to a single
    // broadcast scalar row that filters the same aggregate — two
    // passes over the REDUCED table, one over the corpus. Revenue in
    // exact decimal micros; equality against the max is integer, so
    // the tie set is identical in both engines.
    QueryDef(
      "q15_top_supplier",
      (spark, dir) => {
        val rev = Tables.lineitem(spark, dir)
          .where("l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'")
          .groupBy("l_suppkey")
          .agg(expr(
            """cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,6)))
                    * 1000000 AS bigint) AS revenue_micros"""))
        val top = rev.agg(expr("max(revenue_micros) AS max_micros"))
        rev.crossJoin(broadcast(top))
          .where("revenue_micros = max_micros")
          .join(broadcast(Tables.supplier(spark, dir).selectExpr("s_suppkey", "s_name")),
            expr("l_suppkey = s_suppkey"))
          .selectExpr("s_suppkey", "s_name", "revenue_micros")
      },
      Some("""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                      * 1000000 AS BIGINT) AS revenue_micros
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, revenue_micros
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE revenue_micros = (SELECT max(revenue_micros) FROM rev)""")),

    // ------------------------- disjunctive predicate join (TPC-H Q19)
    // Revenue from three OR-ed (brand, size-band, quantity-band)
    // conjunct groups — the disjunction that breaks naive pushdown.
    // The per-side halves of each conjunct still prune: the part scan
    // keeps only the three brands (an IN filter Catalyst derives from
    // the OR), the kept dimension broadcasts, and the cross-conjunct
    // residual evaluates row-local post-join. Grouped by brand so the
    // gate hashes each conjunct family's contribution separately.
    QueryDef(
      "q19_disjunctive",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .selectExpr("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
          .join(broadcast(Tables.part(spark, dir).selectExpr("p_partkey", "p_brand", "p_size")),
            expr("l_partkey = p_partkey"))
          .where("""(p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
                 OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
                 OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""")
          .groupBy("p_brand")
          .agg(
            expr("cast(count(*) AS bigint) AS n_items"),
            expr("""cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,6)))
                         * 1000000 AS bigint) AS revenue_micros""")),
      Some("""
        SELECT p_brand, count(*)::BIGINT AS n_items,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                    * 1000000 AS BIGINT) AS revenue_micros
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
        GROUP BY p_brand""")),

    // ------------------------ small-quantity outlier revenue (TPC-H Q17)
    // Lineitems whose quantity is below 20% of their part's own average
    // — the correlated-aggregate-subquery shape, decorrelated to a
    // per-part aggregate joined back to the fact table (a fact⋈fact
    // self-join co-partitioned on l_partkey — the aggregate reuses the
    // fact's shuffle key, so one exchange feeds both sides). The
    // threshold stays all-integer: qty < 0.2·(sum/cnt) rewritten as
    // 5·qmicros·cnt < sum_qmicros — no float division, no rounding
    // fence needed, identical truncation-free arithmetic both engines.
    QueryDef(
      "q17_small_qty",
      (spark, dir) => {
        val li = Tables.lineitem(spark, dir).selectExpr(
          "l_partkey", "l_extendedprice",
          "cast(cast(l_quantity AS decimal(18,6)) * 1000000 AS bigint) AS qmicros")
        val stats = li.groupBy("l_partkey").agg(
          expr("cast(count(*) AS bigint) AS cnt"),
          expr("cast(sum(qmicros) AS bigint) AS sum_qmicros"))
        li.join(stats, "l_partkey")
          .where("5 * qmicros * cnt < sum_qmicros")
          .join(broadcast(Tables.part(spark, dir).selectExpr("p_partkey", "p_brand")),
            expr("l_partkey = p_partkey"))
          .groupBy("p_brand")
          .agg(
            expr("cast(count(*) AS bigint) AS n_items"),
            expr("""cast(sum(cast(l_extendedprice AS decimal(18,2))) * 100
                    AS bigint) AS revenue_cents"""))
      },
      Some("""
        WITH li AS (
          SELECT l_partkey, l_extendedprice,
                 CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS qmicros
          FROM lineitem),
        stats AS (
          SELECT l_partkey, count(*)::BIGINT AS cnt, sum(qmicros)::BIGINT AS sum_qmicros
          FROM li GROUP BY l_partkey)
        SELECT p_brand, count(*)::BIGINT AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_cents
        FROM li
        JOIN stats USING (l_partkey)
        JOIN part ON l_partkey = p_partkey
        WHERE 5 * qmicros * cnt < sum_qmicros
        GROUP BY p_brand""")),

    // ----------------- supplier diversity per part class (TPC-H Q16)
    // How many distinct suppliers can deliver each (type, size-band)
    // part class, excluding suppliers with a late-shipment record — the
    // NOT-IN-subquery + grouped count-distinct shape. The exclusion
    // list reduces FIRST (distinct late suppliers — a key set, tiny
    // against the fact table) and excludes via LEFT ANTI before the
    // distinct count; part is the broadcast dim. The naive NOT IN
    // re-evaluates its subquery per row — the anti join pays it once.
    QueryDef(
      "q16_supplier_diversity",
      (spark, dir) => {
        val withOrd = Tables.lineitem(spark, dir)
          .selectExpr("l_orderkey", "l_partkey", "l_suppkey", "l_shipdate")
          .join(Tables.orders(spark, dir).selectExpr("o_orderkey", "o_orderdate"),
            expr("l_orderkey = o_orderkey"))
        val lateSupp = withOrd
          .where("l_shipdate > o_orderdate + INTERVAL 120 DAYS")
          .selectExpr("l_suppkey").distinct()
        withOrd
          .join(lateSupp, Seq("l_suppkey"), "left_anti")
          .join(broadcast(Tables.part(spark, dir)
            .selectExpr("p_partkey", "p_type", "(p_size - 1) div 10 AS size_band")),
            expr("l_partkey = p_partkey"))
          .groupBy("p_type", "size_band")
          .agg(expr("cast(count(DISTINCT l_suppkey) AS bigint) AS supplier_cnt"))
          .selectExpr("p_type", "cast(size_band AS bigint) AS size_band", "supplier_cnt")
      },
      Some("""
        WITH wo AS (
          SELECT l_partkey, l_suppkey, l_shipdate, o_orderdate
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        late AS (
          SELECT DISTINCT l_suppkey FROM wo
          WHERE l_shipdate > o_orderdate + INTERVAL 120 DAY)
        SELECT p_type, ((p_size - 1) // 10)::BIGINT AS size_band,
               count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        FROM wo JOIN part ON l_partkey = p_partkey
        WHERE l_suppkey NOT IN (SELECT l_suppkey FROM late)
        GROUP BY 1, 2""")),

    // ---------------------- dominant part suppliers (TPC-H Q20 shape)
    // Suppliers who shipped more than half of some part's 1996 volume —
    // the nested-aggregate-threshold shape (Q20's "excess stock"
    // against a correlated sum). Both aggregates reduce the SAME
    // filtered fact slice on l_partkey — the per-(part, supplier) sums
    // and the per-part totals share one shuffle key, so the threshold
    // join is co-partitioned; 2·sq > qt keeps the comparison integer.
    QueryDef(
      "q20_dominant_supplier",
      (spark, dir) => {
        val f = Tables.lineitem(spark, dir)
          .where("l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'")
          .selectExpr("l_partkey", "l_suppkey",
            "cast(cast(l_quantity AS decimal(18,6)) * 1000000 AS bigint) AS q")
        val perSupp = f.groupBy("l_partkey", "l_suppkey")
          .agg(expr("cast(sum(q) AS bigint) AS sq"))
        val perPart = f.groupBy("l_partkey")
          .agg(expr("cast(sum(q) AS bigint) AS qt"))
        perSupp.join(perPart, "l_partkey")
          .where("2 * sq > qt")
          .groupBy("l_suppkey")
          .agg(expr("cast(count(*) AS bigint) AS n_dominant_parts"))
          .join(broadcast(Tables.supplier(spark, dir).selectExpr("s_suppkey", "s_name")),
            expr("l_suppkey = s_suppkey"))
          .selectExpr("s_suppkey", "s_name", "n_dominant_parts")
          .orderBy(desc("n_dominant_parts"), col("s_suppkey"))
          .limit(20)
      },
      Some("""
        WITH f AS (
          SELECT l_partkey, l_suppkey,
                 CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS q
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'),
        ps AS (SELECT l_partkey, l_suppkey, sum(q)::BIGINT AS sq FROM f GROUP BY 1, 2),
        pt AS (SELECT l_partkey, sum(q)::BIGINT AS qt FROM f GROUP BY 1)
        SELECT s_suppkey, s_name, count(*)::BIGINT AS n_dominant_parts
        FROM ps JOIN pt USING (l_partkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE 2 * sq > qt
        GROUP BY 1, 2
        ORDER BY n_dominant_parts DESC, s_suppkey
        LIMIT 20""")),

    // ---------------------- sole-blame late suppliers (TPC-H Q21 shape)
    // Suppliers who were the ONLY late shipper (> 120 days after the
    // order date) on a multi-supplier order — the double-correlated
    // EXISTS/NOT-EXISTS query, decorrelated to ONE per-order aggregate:
    // count distinct suppliers and distinct LATE suppliers per order,
    // then keep late rows where (ns ≥ 2, nl = 1). Both the aggregate
    // and the join-back ride the l_orderkey shuffle the lineitem⋈orders
    // join already established — the naive form re-scans lineitem per
    // outer row twice. Top-20 by blame count via TakeOrderedAndProject.
    QueryDef(
      "q21_late_supplier",
      (spark, dir) => {
        val l = Tables.lineitem(spark, dir)
          .selectExpr("l_orderkey", "l_suppkey", "l_shipdate")
          .join(Tables.orders(spark, dir).selectExpr("o_orderkey", "o_orderdate"),
            expr("l_orderkey = o_orderkey"))
          .selectExpr("l_orderkey", "l_suppkey",
            "CASE WHEN l_shipdate > o_orderdate + INTERVAL 120 DAYS THEN 1 ELSE 0 END AS late")
        // per-order supplier counts as WINDOW collect_sets, not a
        // groupBy + join-back: the join-back formulation scans (and
        // shuffles) the joined fact twice; one order's lineitems are a
        // bounded group, so the set buffers are safe and the whole
        // qualification runs inside the single l_orderkey exchange
        l.selectExpr("l_orderkey", "l_suppkey", "late",
            "size(collect_set(l_suppkey) OVER (PARTITION BY l_orderkey)) AS ns",
            """size(collect_set(CASE WHEN late = 1 THEN l_suppkey END)
                      OVER (PARTITION BY l_orderkey)) AS nl""")
          .where("late = 1 AND ns >= 2 AND nl = 1")
          .selectExpr("l_orderkey", "l_suppkey").distinct()
          .groupBy("l_suppkey")
          .agg(expr("cast(count(*) AS bigint) AS numwait"))
          .join(broadcast(Tables.supplier(spark, dir).selectExpr("s_suppkey", "s_name")),
            expr("l_suppkey = s_suppkey"))
          .selectExpr("s_suppkey", "s_name", "numwait")
          .orderBy(desc("numwait"), col("s_suppkey"))
          .limit(20)
      },
      Some("""
        WITH l AS (
          SELECT l_orderkey, l_suppkey,
                 CASE WHEN l_shipdate > o_orderdate + INTERVAL 120 DAY THEN 1 ELSE 0 END AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        stats AS (
          SELECT l_orderkey, count(DISTINCT l_suppkey) AS ns,
                 count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS nl
          FROM l GROUP BY 1)
        SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait
        FROM (SELECT DISTINCT l.l_orderkey, l.l_suppkey
              FROM l JOIN stats USING (l_orderkey)
              WHERE late = 1 AND ns >= 2 AND nl = 1)
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2
        ORDER BY numwait DESC, s_suppkey
        LIMIT 20""")),

    // --------------------------- idle high-balance accounts (TPC-H Q22)
    // Customers with above-average positive balances and no order in
    // the corpus's final two years ("lapsed rich"), rolled up by
    // nation — the anti-join + scalar-subquery shape. (The date bound
    // keeps the anti join non-vacuous: this synthetic corpus gives
    // every customer at least one lifetime order.) The threshold is the positive-balance mean computed in
    // integer micros (sum div count — one truncation, same order both
    // engines) folded to a broadcast scalar; the order check is a
    // LEFT ANTI against the DISTINCT custkey projection of orders.
    // Balances convert to micros through decimal(18,6), never a
    // double→bigint cast (Spark truncates, DuckDB rounds).
    QueryDef(
      "q22_idle_rich",
      (spark, dir) => {
        val cust = Tables.customer(spark, dir).selectExpr(
          "c_custkey", "c_nationkey",
          "cast(cast(c_acctbal AS decimal(18,6)) * 1000000 AS bigint) AS bal_micros")
        val thr = cust.where("bal_micros > 0")
          .agg(expr("cast(sum(bal_micros) AS bigint) div cast(count(*) AS bigint) AS thr_micros"))
        cust.crossJoin(broadcast(thr))
          .where("bal_micros > thr_micros")
          .join(Tables.orders(spark, dir)
              .where("o_orderdate >= '2000-01-01'")
              .selectExpr("o_custkey").distinct(),
            expr("c_custkey = o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(
            expr("cast(count(*) AS bigint) AS n_cust"),
            expr("cast(sum(bal_micros) AS bigint) AS bal_micros_total"))
          .selectExpr("cast(c_nationkey AS bigint) AS nationkey", "n_cust", "bal_micros_total")
      },
      Some("""
        WITH cust AS (
          SELECT c_custkey, c_nationkey,
                 CAST(CAST(c_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS bal_micros
          FROM customer),
        thr AS (
          SELECT (sum(bal_micros) // count(*))::BIGINT AS thr_micros
          FROM cust WHERE bal_micros > 0)
        SELECT c_nationkey::BIGINT AS nationkey, count(*)::BIGINT AS n_cust,
               sum(bal_micros)::BIGINT AS bal_micros_total
        FROM cust, thr
        WHERE bal_micros > thr_micros
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01')
        GROUP BY c_nationkey""")),

    // TPC-H Q4 (order-priority checking), adapted to this schema's
    // lateness proxy: the driver's lineitem has no commit/receipt
    // dates, so "late" = some line shipped > 60 days after the order
    // date (the q21 convention). One quarter of orders, EXISTS as a
    // LEFT SEMI join — the date window prunes the orders scan, the
    // join carries only (orderkey, orderdate) against lineitem keyed
    // on the natural co-partition key, and no lineitem payload ever
    // reaches the aggregate. O(priorities) output.
    QueryDef(
      "q4_order_priority",
      (spark, dir) => {
        val ord = Tables.orders(spark, dir)
          .where("o_orderdate >= timestamp'1995-01-01 00:00:00' AND " +
            "o_orderdate < timestamp'1995-04-01 00:00:00'")
          .selectExpr("o_orderkey", "o_orderpriority",
            "cast(cast(o_orderdate AS timestamp) AS long) AS od_s")
        val li = Tables.lineitem(spark, dir)
          .selectExpr("l_orderkey", "cast(cast(l_shipdate AS timestamp) AS long) AS sd_s")
        ord.join(li,
            expr(s"o_orderkey = l_orderkey AND sd_s > od_s + ${60L * 86400}L"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(expr("cast(count(*) AS bigint) AS order_count"))
      },
      Some("""
        SELECT o_orderpriority, count(*)::BIGINT AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND epoch(l.l_shipdate) > epoch(o.o_orderdate) + 60 * 86400)
        GROUP BY o_orderpriority""")),

    // TPC-H Q7 (volume shipping between two nations, adapted names):
    // revenue flowing supplier-nation → customer-nation for the
    // (NATION_1, NATION_2) pair in either direction, by ship year.
    // Scale shape: supplier/customer/nation are broadcast dims pruned
    // to the two nations BEFORE the joins (the filter cuts the build
    // sides ~12.5×); only orders⋈lineitem shuffles, on the natural
    // orderkey. Money folds as exact decimal.
    QueryDef(
      "q7_nation_trade",
      (spark, dir) => {
        val n = Tables.nation(spark, dir)
          .where("n_name IN ('NATION_1', 'NATION_2')")
        val sup = Tables.supplier(spark, dir)
          .join(broadcast(n.selectExpr("n_nationkey AS s_nk", "n_name AS supp_nation")),
            expr("s_nationkey = s_nk"))
          .select("s_suppkey", "supp_nation")
        val cust = Tables.customer(spark, dir)
          .join(broadcast(n.selectExpr("n_nationkey AS c_nk", "n_name AS cust_nation")),
            expr("c_nationkey = c_nk"))
          .select("c_custkey", "cust_nation")
        Tables.lineitem(spark, dir)
          .where("l_shipdate >= timestamp'1995-01-01 00:00:00' AND " +
            "l_shipdate < timestamp'1997-01-01 00:00:00'")
          .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
            expr("l_orderkey = o_orderkey"))
          .join(broadcast(sup), expr("l_suppkey = s_suppkey"))
          .join(broadcast(cust), expr("o_custkey = c_custkey"))
          .where("supp_nation <> cust_nation")
          .groupBy(col("supp_nation"), col("cust_nation"),
            expr("year(l_shipdate)").as("l_year"))
          .agg(expr("cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,6))) AS double) AS revenue"))
          .selectExpr("supp_nation", "cust_nation", "cast(l_year AS int) AS l_year", "revenue")
      },
      Some("""
        SELECT supp_nation, cust_nation, l_year::INT AS l_year,
               CAST(sum(volume) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l_shipdate) AS l_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE n1.n_name IN ('NATION_1', 'NATION_2')
            AND n2.n_name IN ('NATION_1', 'NATION_2')
            AND n1.n_name <> n2.n_name
            AND l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01')
        GROUP BY supp_nation, cust_nation, l_year""")),

    // TPC-H Q8 (national market share, adapted names): NATION_3
    // suppliers' share of PROMO-part revenue sold to AMERICA-region
    // customers, by order year. Every dimension (region→nation→
    // customer, part, supplier+nation flag) broadcasts; the fact edge
    // shuffles once on orderkey. Both ratio legs fold in ONE decimal
    // aggregate pass; the share is a single end double division
    // rounded to 6 — the only float op, identical cross-engine on
    // identical decimal operands.
    QueryDef(
      "q8_market_share",
      (spark, dir) => {
        val amNations = Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir).where("r_name = 'AMERICA'")),
            expr("n_regionkey = r_regionkey"))
          .select("n_nationkey")
        val cust = Tables.customer(spark, dir)
          .join(broadcast(amNations), expr("c_nationkey = n_nationkey"))
          .select("c_custkey")
        val promo = Tables.part(spark, dir).where("p_type = 'PROMO'").select("p_partkey")
        val sup = Tables.supplier(spark, dir)
          .join(broadcast(Tables.nation(spark, dir)
              .selectExpr("n_nationkey AS s_nk", "n_name = 'NATION_3' AS is_target")),
            expr("s_nationkey = s_nk"))
          .select("s_suppkey", "is_target")
        Tables.lineitem(spark, dir)
          .join(broadcast(promo), expr("l_partkey = p_partkey"))
          .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
            expr("l_orderkey = o_orderkey"))
          .join(broadcast(cust), expr("o_custkey = c_custkey"))
          .join(broadcast(sup), expr("l_suppkey = s_suppkey"))
          .groupBy(expr("year(o_orderdate)").as("o_year"))
          .agg(
            expr("""cast(sum(CASE WHEN is_target
                                  THEN cast(l_extendedprice * (1 - l_discount) AS decimal(18,6))
                                  ELSE cast(0 AS decimal(18,6)) END) AS double) AS target_volume"""),
            expr("cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,6))) AS double) AS total_volume"))
          .selectExpr("cast(o_year AS int) AS o_year", "target_volume", "total_volume",
            "round(target_volume / total_volume, 6) AS mkt_share")
      },
      Some("""
        SELECT o_year::INT AS o_year,
               CAST(target_volume AS DOUBLE) AS target_volume,
               CAST(total_volume AS DOUBLE) AS total_volume,
               round(CAST(target_volume AS DOUBLE) / CAST(total_volume AS DOUBLE), 6) AS mkt_share
        FROM (
          SELECT year(o_orderdate) AS o_year,
                 sum(CASE WHEN n1.n_name = 'NATION_3'
                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS target_volume,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_volume
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region ON n2.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
          GROUP BY 1)""")),

    // TPC-H Q6 verbatim (forecasting revenue change): the canonical
    // single-scan predicate aggregate. All three predicates reach the
    // parquet scan as pushed filters (PlanShapeSpec pins shipdate +
    // quantity); the aggregate is one decimal partial-combine to a
    // single row — the minimal possible shuffle.
    QueryDef(
      "q6_forecast_revenue",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .where("l_shipdate >= timestamp'1995-01-01 00:00:00' AND " +
            "l_shipdate < timestamp'1996-01-01 00:00:00' AND " +
            "l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24")
          .agg(expr(
            "cast(sum(cast(l_extendedprice * l_discount AS decimal(18,6))) AS double) AS revenue")),
      Some("""
        SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""")),

    // ---------------- market-basket pair mining (a-priori pruned)
    // Frequent co-purchased part pairs with confidence and lift — the
    // association-rule primitive behind "customers also bought". Orders
    // are baskets, distinct parts are items. The plan is the a-priori
    // downward-closure argument made physical: items below MinItemSup
    // orders cannot participate in a frequent pair, so the per-order
    // self-join runs AFTER a frequent-item semi-join prunes the basket
    // rows — the pair space is Σ basket'² over PRUNED baskets, never
    // items². Thresholds are ABSOLUTE counts on purpose: relative
    // (ppm-of-orders) support would self-destruct on sharded corpora
    // where every item's count is per-shard-bounded while the
    // denominator grows with shards (the ScaleUp decollision makes
    // this concrete at sf3). Lift's cross-product widens through
    // DECIMAL(38,0) before its single division. Scale shape: one
    // distinct (order, part) reduction; frequent-item counts are a
    // parts-bounded aggregate joined back as a broadcast-able dim; the
    // pair explode shuffles on order key (high-cardinality, no skew:
    // basket size ≤ tens); the pair aggregate partial-combines
    // map-side.
    QueryDef(
      "q23_basket_pairs",
      (spark, dir) => {
        // fenced: the distinct (order, part) reduction is consumed
        // THREE times (item counts, the prune join's probe side, the
        // order total) — unfenced, each consumer re-ran the lineitem
        // scan + distinct exchange (r17 profile: two separate ~1 s
        // distinct stages). One materialization serves all three.
        import org.apache.spark.sql.graft.CheckpointOps.FenceSyntax
        val baskets = Tables.lineitem(spark, dir)
          .selectExpr("l_orderkey AS o", "l_partkey AS p").distinct()
          .fenced
        val itemCnt = baskets.groupBy("p")
          .agg(expr("cast(count(*) AS bigint) AS item_cnt"))
          .where(s"item_cnt >= $MinItemSup")
        val pruned = baskets
          .join(broadcast(itemCnt), "p")
          .selectExpr("o", "p", "item_cnt")
        val nOrders = baskets.selectExpr("o").distinct()
          .groupBy().agg(expr("cast(count(*) AS bigint) AS n_orders"))
        pruned.selectExpr("o", "p AS p1", "item_cnt AS cnt1")
          .join(pruned.selectExpr("o", "p AS p2", "item_cnt AS cnt2"), "o")
          .where("p1 < p2")
          .groupBy("p1", "p2")
          .agg(
            expr("cast(count(*) AS bigint) AS pair_cnt"),
            expr("any_value(cnt1) AS cnt1"),
            expr("any_value(cnt2) AS cnt2"))
          .where(s"pair_cnt >= $MinPairSup")
          .crossJoin(broadcast(nOrders))
          .selectExpr("p1", "p2", "pair_cnt", "cnt1", "cnt2",
            "pair_cnt * 1000000L div cnt1 AS conf12_ppm",
            "pair_cnt * 1000000L div cnt2 AS conf21_ppm",
            """cast(cast(pair_cnt AS decimal(38,0)) * n_orders * 1000000
                    div (cast(cnt1 AS decimal(38,0)) * cnt2) AS bigint) AS lift_ppm""")
      },
      Some(s"""
        WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        item AS (
          SELECT p, count(*)::BIGINT AS item_cnt FROM b GROUP BY 1
          HAVING count(*) >= $MinItemSup),
        pruned AS (SELECT b.o, b.p, item.item_cnt FROM b JOIN item USING (p)),
        tot AS (SELECT count(DISTINCT o)::BIGINT AS n_orders FROM b),
        pairs AS (
          SELECT a.p AS p1, c.p AS p2, count(*)::BIGINT AS pair_cnt,
                 any_value(a.item_cnt) AS cnt1, any_value(c.item_cnt) AS cnt2
          FROM pruned a JOIN pruned c ON a.o = c.o AND a.p < c.p
          GROUP BY 1, 2
          HAVING count(*) >= $MinPairSup)
        SELECT p1, p2, pair_cnt, cnt1, cnt2,
               (pair_cnt * 1000000 // cnt1)::BIGINT AS conf12_ppm,
               (pair_cnt * 1000000 // cnt2)::BIGINT AS conf21_ppm,
               (pair_cnt::HUGEINT * n_orders * 1000000
                // (cnt1::HUGEINT * cnt2))::BIGINT AS lift_ppm
        FROM pairs, tot"""))
  )

  /** q23_basket_pairs: minimum orders an ITEM must appear in (a-priori
    * item prune) and minimum orders a PAIR must co-occur in. Absolute
    * counts — see the QueryDef comment for why relative support breaks
    * on sharded corpora.
    */
  private val MinItemSup = 20L
  private val MinPairSup = 2L
}
