package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join by key salting: the fact side derives a
  * deterministic salt in [0, salts) from its full row hash, the dim
  * side replicates each row `salts` times, and the join key becomes
  * (key, salt) — a hot key's rows now spread over `salts` reducers
  * instead of one. Result set is identical to the plain join
  * (oracle-checked by c_join_salted_skew).
  *
  * This is the manual fallback for skew AQE can't fix (e.g. a
  * broadcast-ineligible dim with one pathological key at 100 TB);
  * `spark.sql.adaptive.skewJoin` stays on as the first line of
  * defense.
  */
object SaltedJoin {

  def apply(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val factCols = fact.columns
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(factCols.map(col): _*), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
