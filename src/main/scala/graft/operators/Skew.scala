package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is lopsided.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; salting
  * is the plan-level tool when one key dominates a co-shuffled join:
  * the big side's rows are spread across `salts` sub-keys (derived
  * deterministically from the whole row, so identical hot keys land on
  * different reducers), and the small side is replicated once per
  * salt. Join semantics are unchanged — only the shuffle distribution
  * widens by the salt factor.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
