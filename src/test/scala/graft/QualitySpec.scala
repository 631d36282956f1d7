package graft

import graft.operators.Quality

/** Robust outlier flagging: the flagged set must agree with a
  * single-threaded median/MAD reimplementation — both the membership
  * (soundness + completeness) and the robust-z values.
  */
class QualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dq_outliers matches a sequential median/MAD oracle") {
    val events = Tables.events(spark, sf)
      .selectExpr("event_id", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      // lower + frac * (higher - lower): quantile_cont / percentile
      val pos = 0.5 * (n - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val expected = events.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val med = median(es.map(_._3).toSeq)
      val ads = es.toSeq.map(e => (e._1, e._3, math.abs(e._3 - med)))
      val mad = median(ads.map(_._3))
      ads.collect {
        case (id, _, ad) if ad > 3 * 1.4826 * mad =>
          id -> BigDecimal(ad / (1.4826 * mad)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
    }.toMap

    val got = Quality.queries.find(_.name == "dq_outliers").get.run(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> BigDecimal(r.getAs[Double]("robust_z")))
      .toMap
    assert(got.nonEmpty, "gate corpus must flag a non-trivial tail")
    assert(got.keySet == expected.keySet,
      s"membership drift: only-got=${(got.keySet -- expected.keySet).take(3)} " +
        s"only-expected=${(expected.keySet -- got.keySet).take(3)}")
    expected.foreach { case (id, z) => assert((got(id) - z).abs <= BigDecimal("0.000001")) }
  }

  test("dq_ks_drift equals a brute-force sequential KS recompute") {
    val rows = Registry.byName("dq_ks_drift").run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "cast(value AS decimal(18,6)) AS v",
        "CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS is_ref")
      .collect()
      .map(r => (r.getString(0), r.getDecimal(1), r.getInt(2)))
    ev.groupBy(_._1).foreach { case (et, xs) =>
      val ref = xs.filter(_._3 == 1).map(_._2).sorted(Ordering.by((d: java.math.BigDecimal) => BigDecimal(d)))
      val cur = xs.filter(_._3 == 0).map(_._2).sorted(Ordering.by((d: java.math.BigDecimal) => BigDecimal(d)))
      val (nr, nc) = (ref.length.toLong, cur.length.toLong)
      // sequential two-pointer sup over the merged distinct points
      val points = (ref ++ cur).distinct.sorted(Ordering.by((d: java.math.BigDecimal) => BigDecimal(d)))
      var best = 0L
      points.foreach { x =>
        val cr = ref.count(_.compareTo(x) <= 0).toLong
        val cc = cur.count(_.compareTo(x) <= 0).toLong
        best = math.max(best, math.abs(cr * nc - cc * nr))
      }
      val (gnr, gnc, dnum, dppm) = rows(et)
      assert(gnr == nr && gnc == nc, s"$et: counts")
      assert(dnum == best, s"$et: D numerator $dnum != brute $best")
      assert(dppm == best * 1000000L / (nr * nc), s"$et: ppm")
    }
  }
  test("dq_referential: orphan counts equal brute-force key-set differences") {
    val sf = "/root/testdata/sf0.001"
    val rows = Registry.byName("dq_referential").run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.size == 9)
    def keys(t: String, c: String): Array[Long] =
      spark.read.parquet(s"$sf/$t.parquet").selectExpr(s"cast($c AS bigint) AS k")
        .collect().map(_.getLong(0))
    val rels = Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
      ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
      ("orders.o_orderkey->lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"))
    rels.foreach { case (rel, ct, ck, pt, pk) =>
      val child = keys(ct, ck)
      val parents = keys(pt, pk).toSet
      val orphan = child.count(k => !parents.contains(k)).toLong
      val (nc, no, ppm) = rows(rel)
      assert(nc == child.length.toLong && no == orphan, s"$rel: counts")
      assert(ppm == orphan * 1000000L / child.length, s"$rel: ppm")
    }
    // the relational FKs are intact; the childless-parent census fires
    assert(rows("orders.o_orderkey->lineitem")._2 > 0,
      "childless-order census should exercise the nonzero path")
    assert(rows("lineitem.l_orderkey->orders")._2 == 0)
  }

  test("dq_selectivity: estimates and actuals replay from a collected stats row") {
    val sf = "/root/testdata/sf0.001"
    val rows = Registry.byName("dq_selectivity").run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.size == 4)
    val o = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint) AS pc",
        "cast(cast(o_orderdate AS timestamp) AS long) AS od")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = o.length.toLong
    val ndv = o.map(_._1).distinct.length.toLong
    val (mnP, mxP) = (o.map(_._2).min, o.map(_._2).max)
    val (mnD, mxD) = (o.map(_._3).min, o.map(_._3).max)
    val p70 = mnP + (mxP - mnP) * 7 / 10
    val d30 = mnD + (mxD - mnD) * 3 / 10
    val eEq = n / ndv
    val eGt = n * (mxP - p70) / (mxP - mnP)
    val eLt = n * (d30 - mnD) / (mxD - mnD)
    val eConj = eGt * eLt / n
    val aEq = o.count(_._1 == 42L).toLong
    val aGt = o.count(_._2 > p70).toLong
    val aLt = o.count(_._3 < d30).toLong
    val aConj = o.count(r => r._2 > p70 && r._3 < d30).toLong
    def row(e: Long, a: Long) = (e, a, math.abs(e - a) * 1000000L / math.max(a, 1L))
    assert(rows("eq_custkey") == row(eEq, aEq), "eq")
    assert(rows("gt_price_p70") == row(eGt, aGt), "gt")
    assert(rows("lt_date_p30") == row(eLt, aLt), "lt")
    assert(rows("conj_price_date") == row(eConj, aConj), "conj")
    // the audit must measure something live on both sides
    assert(aGt > 0 && aLt > 0, "range predicates should select nonzero rows")
  }

}
