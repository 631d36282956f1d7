package graft

/** Front-door API tests: temp views + native functions reachable from
  * plain `spark.sql`, and the named-query runner.
  */
class GraftApiSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("initSql registers every table as a view and the native functions") {
    Graft.initSql(spark, sf)
    Graft.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").collect().length == 1, t)
    }
    val r = spark.sql(
      """SELECT doc_id,
                simhash60(hash_tokens(split(text, ' '))) AS sh,
                size(word_shingles(split(text, ' '), 4)) AS n_sh
         FROM documents ORDER BY doc_id LIMIT 3""").collect()
    assert(r.length == 3)
    assert(r.forall(_.getLong(1) >= 0L))
    assert(r.forall(_.getInt(2) > 0))
    // events view carries the micros-rewrapped timestamp
    val ts = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType)
  }

  test("query runs a registered operator by name") {
    assert(Graft.query(spark, "ta_stats", sf).collect().nonEmpty)
  }
}
