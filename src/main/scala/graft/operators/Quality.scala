package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Data-quality constraint audit — the Deequ-style validation pass a
  * production pipeline runs before promoting a batch: uniqueness,
  * completeness, derived-column consistency, referential integrity,
  * value ranges, and fixed-shape checks, each reported as one row with
  * its violation count.
  *
  * Scale shape: every check is an independent partial-aggregated scan
  * (count / count distinct / anti-join count) unioned into a tiny
  * report — no check ever materializes violating ROWS (at 100 TB the
  * report must stay O(checks), with row-level drill-down as a separate
  * targeted query). Referential checks are anti joins that broadcast
  * the smaller key side.
  */
object Quality {

  def queries: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_constraints",
      (spark, dir) => {
        val docs = Tables.documents(spark, dir)
        val orders = Tables.orders(spark, dir)
        val cust = Tables.customer(spark, dir)
        val li = Tables.lineitem(spark, dir)
        val emb = Tables.embeddings(spark, dir)
        val ev = Tables.events(spark, dir)
        def check(name: String, df: org.apache.spark.sql.DataFrame) =
          df.selectExpr(s"'$name' AS check_name", "total", "violations")
        val uniq = check("documents.doc_id unique",
          docs.groupBy().agg(expr("count(*) AS total"),
            expr("count(*) - count(DISTINCT doc_id) AS violations")))
        val nn = check("documents.text not null",
          docs.groupBy().agg(expr("count(*) AS total"),
            expr("sum(CASE WHEN text IS NULL THEN 1L ELSE 0L END) AS violations")))
        val derived = check("documents.n_chars = length(text)",
          docs.groupBy().agg(expr("count(*) AS total"),
            expr("sum(CASE WHEN n_chars != length(text) THEN 1L ELSE 0L END) AS violations")))
        val refOrders = check("orders.o_custkey in customer",
          orders.join(broadcast(cust.select("c_custkey")),
              col("o_custkey") === col("c_custkey"), "left")
            .groupBy().agg(expr("count(*) AS total"),
              expr("sum(CASE WHEN c_custkey IS NULL THEN 1L ELSE 0L END) AS violations")))
        val refLi = check("lineitem.l_orderkey in orders",
          li.join(orders.select("o_orderkey"),
              col("l_orderkey") === col("o_orderkey"), "left")
            .groupBy().agg(expr("count(*) AS total"),
              expr("sum(CASE WHEN o_orderkey IS NULL THEN 1L ELSE 0L END) AS violations")))
        val range = check("events.value in [0, 1e6]",
          ev.groupBy().agg(expr("count(*) AS total"),
            expr("sum(CASE WHEN value < 0D OR value > 1000000D THEN 1L ELSE 0L END) AS violations")))
        val dim = check("embeddings dim = 64",
          emb.groupBy().agg(expr("count(*) AS total"),
            expr("sum(CASE WHEN size(embedding) != 64 THEN 1L ELSE 0L END) AS violations")))
        uniq.unionByName(nn).unionByName(derived).unionByName(refOrders)
          .unionByName(refLi).unionByName(range).unionByName(dim)
          .selectExpr("check_name", "total", "violations",
            "CASE WHEN violations = 0 THEN 1L ELSE 0L END AS pass")
      },
      Some("""
        SELECT check_name, total, violations,
               (CASE WHEN violations = 0 THEN 1 ELSE 0 END)::BIGINT AS pass
        FROM (
          SELECT 'documents.doc_id unique' AS check_name, count(*) AS total,
                 count(*) - count(DISTINCT doc_id) AS violations FROM documents
          UNION ALL
          SELECT 'documents.text not null', count(*),
                 sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT FROM documents
          UNION ALL
          SELECT 'documents.n_chars = length(text)', count(*),
                 sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END)::BIGINT FROM documents
          UNION ALL
          SELECT 'orders.o_custkey in customer', count(*),
                 sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
          FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          UNION ALL
          SELECT 'lineitem.l_orderkey in orders', count(*),
                 sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
          FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          UNION ALL
          SELECT 'events.value in [0, 1e6]', count(*),
                 sum(CASE WHEN value < 0 OR value > 1000000 THEN 1 ELSE 0 END)::BIGINT FROM events
          UNION ALL
          SELECT 'embeddings dim = 64', count(*),
                 sum(CASE WHEN len(embedding) != 64 THEN 1 ELSE 0 END)::BIGINT FROM embeddings)"""))
  )
}
