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
      val (num, den) = (BigInt(r.getDecimal(5).toBigInteger), BigInt(r.getDecimal(6).toBigInteger))
      val milli = r.getLong(7)
      val d = BigInt(sa) * (nb - sb) - BigInt(sb) * (na - sa)
      assert(num == BigInt(na + nb) * d * d, s"${r.getString(0)}: numerator")
      assert(den == BigInt(sa + sb) * ((na - sa) + (nb - sb)) * BigInt(na) * nb,
        s"${r.getString(0)}: denominator")
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
}
