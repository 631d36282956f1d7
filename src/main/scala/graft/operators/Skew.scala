package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers — the manual counterpart to AQE's
  * skew-join splitting, for when a handful of hot keys would otherwise
  * send one reducer 1000× the median partition.
  *
  * Pattern: SALT the skewed (large) side with a random-free,
  * deterministic salt derived from a row-unique column, REPLICATE the
  * other side across all salt values, join on (key, salt). The hot
  * key's rows spread over `saltFactor` reducers; the replicated side
  * grows by `saltFactor`× (fine when it is the smaller input).
  */
object Skew {

  /** Inner-join `large` (skewed on `key`) with `small`, spreading each
    * key over `saltFactor` partitions. `saltSource` must be a
    * roughly-uniform column on the large side (an id, a hash) — the
    * salt is `pmod(saltSource, saltFactor)`, deterministic so the same
    * input always produces the same plan and result.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, saltFactor: Int): DataFrame = {
    val salted = large.withColumn("__salt", pmod(saltSource, lit(saltFactor)))
    val replicated = small.withColumn(
      "__salt", explode(expr(s"sequence(0, ${saltFactor - 1}, 1)")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
