package graft

/** Value-level pins for the batch event-series recurrences. The DuckDB
  * oracle is the primary cross-check (an independent recursive-CTE
  * replay); these tests pin invariants the oracle comparison cannot
  * localize — here, the Holt-Winters seasonal RING indexing, whose
  * off-by-one failures (consuming s_{t−23} or s_{t−25} instead of
  * s_{t−m}) would shift every number plausibly rather than obviously.
  */
class EventsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("ev_holt_winters: every step satisfies the three recurrences against its own t−24 row") {
    val rows = Registry.byName("ev_holt_winters").run(spark, sf)
      .collect()
      .map { r =>
        (r.getString(0), r.getLong(2)) -> // (event_type, rn)
          (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      }
      .toMap
    assert(rows.nonEmpty)
    // columns: vb, level, trend, season, forecast
    var checkedDeep = 0
    rows.foreach { case ((et, rn), (vb, l, b, s, f)) =>
      if (rn >= 2L) {
        val (_, lPrev, bPrev, _, _) = rows((et, rn - 1L))
        // s_{t−m}: the season written 24 steps ago, 0 inside the first day
        val sOld = rows.get((et, rn - 24L)).map(_._4).getOrElse(0L)
        val lExp = (300L * (vb - sOld) + 700L * (lPrev + bPrev)) / 1000L
        val bExp = (200L * (lExp - lPrev) + 800L * bPrev) / 1000L
        val sExp = (100L * (vb - lExp) + 900L * sOld) / 1000L
        assert(l == lExp && b == bExp && s == sExp,
          s"$et rn=$rn: got (l=$l,b=$b,s=$s) expected (l=$lExp,b=$bExp,s=$sExp)")
        // one-step-ahead forecast consumes the NEXT ring slot: s_{t+1−m}
        val sNext = rows.get((et, rn - 23L)).map(_._4).getOrElse(0L)
        assert(f == l + b + sNext, s"$et rn=$rn: forecast $f != $l+$b+$sNext")
        if (rn > 24L) checkedDeep += 1
      } else {
        assert(l == vb && b == 0L && s == 0L && f == vb, s"$et cold start broken")
      }
    }
    // the fixture must actually exercise the wrapped ring, not just day one
    assert(checkedDeep > 100, s"only $checkedDeep steps beyond the first day")
  }

  test("ev_ab_chisq: integer products equal the textbook chi-square on the raw table") {
    val rows = Registry.byName("ev_ab_chisq").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, sa, sb) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val milli = r.getLong(5)
      // num/den stay internal to the kernel (gate outputs carry no
      // DecimalType) — replay them here from the emitted cells
      val d = BigInt(sa) * (nb - sb) - BigInt(sb) * (na - sa)
      val num = BigInt(na + nb) * d * d
      val den = BigInt(sa + sb) * ((na - sa) + (nb - sb)) * BigInt(na) * nb
      if (den != 0) {
        assert(milli == (num * 1000 / den).toLong, s"${r.getString(0)}: scaled quotient")
        // and it IS Pearson's chi-square: compare against the float textbook form
        val (a, b, c2, dd) = (sa.toDouble, (na - sa).toDouble, sb.toDouble, (nb - sb).toDouble)
        val n = (na + nb).toDouble
        val chi = n * math.pow(a * dd - c2 * b, 2) /
          ((a + b) * (c2 + dd) * (a + c2) * (b + dd))
        assert(math.abs(milli / 1000.0 - chi) <= 0.001 + chi * 1e-9,
          s"${r.getString(0)}: $milli vs textbook $chi")
      } else assert(milli == 0L)
    }
  }

  test("ev_ab_mannwhitney: doubled rank sums equal a brute-force midrank computation") {
    val rows = Registry.byName("ev_ab_mannwhitney").run(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent third derivation: collect the raw table, assign
    // midranks with a naive sort, and compare every output column
    val events = Tables.events(spark, sf)
      .selectExpr("event_type",
        "cast(cast(value AS decimal(18,6)) * 1000000 AS bigint) AS v",
        "user_id % 2 AS variant")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val et = r.getString(0)
      val sample = events.filter(_._1 == et)
      val sorted = sample.sortBy(_._2)
      // 2×midrank per element: group ties, avg rank = (first + last)/2
      val ranks2 = scala.collection.mutable.Map.empty[Long, Long]
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
        ranks2(sorted(i)._2) = (i + 1).toLong + j.toLong // 2×avg of ranks i+1..j
        i = j
      }
      val a = sample.filter(_._3 == 0L)
      val nA = a.length.toLong
      val nB = sample.length.toLong - nA
      val r2A = a.map(x => ranks2(x._2)).sum
      val u2A = r2A - nA * (nA + 1)
      assert(r.getLong(1) == nA && r.getLong(2) == nB, s"$et: counts")
      assert(r.getLong(3) == r2A, s"$et: doubled rank sum ${r.getLong(3)} vs $r2A")
      assert(r.getLong(4) == u2A && r.getLong(5) == 2 * nA * nB - u2A, s"$et: U")
      assert(r.getLong(6) == (BigInt(u2A) * 1000000 / (2 * BigInt(nA) * nB)).toLong,
        s"$et: auc_ppm")
      assert(r.getLong(6) >= 0L && r.getLong(6) <= 1000000L, s"$et: AUC in [0,1]")
    }
  }

  test("ev_survival: life table and KM curve equal a brute-force per-user replay") {
    val out = Registry.byName("ev_survival").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.nonEmpty)
    val perUser = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .groupBy(_._1)
      .toSeq // BEFORE the map: Map.map would dedupe users sharing (t, dead)
      .map { case (_, es) =>
        val first = es.map(_._2).min
        val conv = es.filter(e => e._3 == "purchase" && e._4 > 150.0).map(_._2)
        if (conv.nonEmpty) ((conv.min - first) / 3600000000L, true)
        else ((es.map(_._2).max - first) / 3600000000L, false)
      }
    val total = perUser.size.toLong
    var s = 1000000L
    var left = 0L
    val expected = perUser.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, us) =>
      val d = us.count(_._2).toLong
      val c = us.size.toLong - d
      val nRisk = total - left
      left += d + c
      s = s * (nRisk - d) / nRisk
      (t, nRisk, d, c, s)
    }
    assert(out.toSeq == expected, s"life table mismatch:\n$out\nvs\n$expected")
    // KM curve is non-increasing and ends ≥ 0
    assert(out.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // the fixture must exercise BOTH branches
    assert(out.map(_._3).sum > 0L, "no conversions — fixture degenerate")
    assert(out.map(_._4).sum > 0L, "no censoring — fixture degenerate")
  }

  test("ev_ab_cuped: theta and adjusted delta equal a BigInt per-user replay") {
    val rows = Registry.byName("ev_ab_cuped").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val split = java.time.Instant.parse("2024-01-16T00:00:00Z").toEpochMilli * 1000L
    val raw = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "unix_micros(ts) AS us",
        "cast(cast(value AS decimal(18,6)) * 1000000 AS bigint) AS v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { r =>
      val et = r.getString(0)
      val perUser = raw.filter(_._1 == et).groupBy(_._2).map { case (u, es) =>
        (u, es.filter(_._3 < split).map(_._4).sum, es.filter(_._3 >= split).map(_._4).sum)
      }.toSeq
      val n = BigInt(perUser.size)
      val sx = perUser.map(p => BigInt(p._2)).sum
      val sy = perUser.map(p => BigInt(p._3)).sum
      val sxx = perUser.map(p => BigInt(p._2) * p._2).sum
      val sxy = perUser.map(p => BigInt(p._2) * p._3).sum
      val (num, den) = (n * sxy - sx * sy, n * sxx - sx * sx)
      val theta = if (den == 0) 0L else (num * 1000000 / den).toLong
      assert(r.getLong(4) == theta, s"$et: theta ${r.getLong(4)} vs $theta")
      val a = perUser.filter(_._1 % 2 == 0)
      val b = perUser.filter(_._1 % 2 == 1)
      val (mxa, mxb) = (a.map(_._2).sum / a.size, b.map(_._2).sum / b.size)
      val (mya, myb) = (a.map(_._3).sum / a.size, b.map(_._3).sum / b.size)
      assert((r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)) ==
        ((mxa, mxb, mya, myb)), s"$et: means")
      assert(r.getLong(9) == mya - myb, s"$et: raw delta")
      assert(r.getLong(10) == (mya - myb) - theta * (mxa - mxb) / 1000000L,
        s"$et: adjusted delta")
      // CUPED must REDUCE something: theta is non-trivial on this fixture
      assert(theta != 0L, s"$et: zero theta — pre/post uncorrelated, fixture degenerate")
    }
  }
  test("ev_did: group-period means and the DiD delta equal a per-user replay") {
    val rows = Registry.byName("ev_did").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val split = java.time.Instant.parse("2024-01-16T00:00:00Z").toEpochMilli * 1000L
    val raw = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "unix_micros(ts) AS us",
        "cast(cast(value AS decimal(18,6)) * 1000000 AS bigint) AS v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { r =>
      val et = r.getString(0)
      val perUser = raw.filter(_._1 == et).groupBy(_._2).map { case (u, es) =>
        (u, es.filter(_._3 < split).map(_._4).sum, es.filter(_._3 >= split).map(_._4).sum)
      }.toSeq
      val c = perUser.filter(_._1 % 2 == 0)
      val t = perUser.filter(_._1 % 2 == 1)
      assert((r.getLong(1), r.getLong(2)) == ((c.size.toLong, t.size.toLong)), s"$et: arm sizes")
      val mPreC = c.map(_._2).sum / c.size
      val mPreT = t.map(_._2).sum / t.size
      val mPostC = c.map(_._3).sum / c.size
      val mPostT = t.map(_._3).sum / t.size
      assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
        ((mPreC, mPreT, mPostC, mPostT)), s"$et: cell means")
      assert(r.getLong(7) == (mPostT - mPreT) - (mPostC - mPreC), s"$et: DiD")
    }
  }

  test("ev_scd2: versions tile each user's history and replay the change scan") {
    val rows = Registry.byName("ev_scd2").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
    assert(rows.nonEmpty)
    val raw = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = raw.groupBy(_._1)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val ordered = byUser(u).sortBy(e => (e._4, e._2))
      // sequential run compression
      val changes = ordered.zipWithIndex.filter { case (e, i) =>
        i == 0 || ordered(i - 1)._3 != e._3
      }.map(_._1)
      val got = vs.sortBy(_._5)
      assert(got.length == changes.length, s"user $u: version count")
      got.zip(changes).zipWithIndex.foreach { case (((_, tpe, from, to, ver), ch), i) =>
        assert(ver == i + 1, s"user $u: dense version ordinal")
        assert(tpe == ch._3 && from == ch._4, s"user $u v$ver: open row")
        // contiguity: this version closes exactly where the next opens
        if (i + 1 < changes.length) assert(to.contains(changes(i + 1)._4), s"user $u v$ver: close")
        else assert(to.isEmpty, s"user $u v$ver: last version must stay open")
      }
      // consecutive versions always change the attribute
      got.sliding(2).foreach {
        case Array(a, b) => assert(a._2 != b._2, s"user $u: no-op version")
        case _ =>
      }
    }
  }

}
