package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DateType, DecimalType, MapType, StructType, TimestampNTZType, TimestampType}

/** Registry-wide output-contract guards.
  *
  * The r14 lesson: four gate queries emitted decimal128(38,0) columns
  * whose VALUES matched DuckDB exactly, yet the driver's typed
  * row-hash rejected them — decimal outputs are hash-unstable at the
  * gate even when arithmetic is right. The engine's standing
  * discipline (widen to DECIMAL internally for exactness, emit
  * hash-stable BIGINT surrogates — ppm scaling or hi/lo halves) is
  * enforced HERE for every QueryDef, so that class of red can never
  * ship again.
  */
class RegistrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def bannedIn(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path:decimal")
    // raw temporal outputs are the OTHER hash-unstable class: Spark's
    // tz-adorned timestamps never canonicalize identically to DuckDB's
    // — the standing rule is "emit epoch bigints", enforced here
    case TimestampType | TimestampNTZType | DateType => Seq(s"$path:temporal")
    case s: StructType =>
      s.fields.toSeq.flatMap(f => bannedIn(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => bannedIn(a.elementType, s"$path[]")
    case m: MapType =>
      bannedIn(m.keyType, s"$path<key>") ++ bannedIn(m.valueType, s"$path<val>")
    case _ => Nil
  }

  test("no gate query emits a DecimalType or raw temporal column (driver-hash-unstable)") {
    val offending = Registry.all.flatMap { q =>
      val df = q.run(spark, sf)
      bannedIn(df.schema, q.name)
    }
    assert(offending.isEmpty,
      s"gate outputs must be decimal- and temporal-free (emit ppm/hi-lo/epoch BIGINTs): " +
        offending.mkString(", "))
  }

  test("registry names are unique and every oracle is non-empty SQL") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length,
      "duplicate QueryDef names would silently shadow gate rows")
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty && sql.toLowerCase.contains("select"), n)
    }
  }
}
