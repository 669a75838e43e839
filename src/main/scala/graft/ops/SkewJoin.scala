package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-salting for equi-joins (SURVEY §4 / brief "salting for
  * skew"). First resort is AQE's runtime skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) — it
  * needs no code change and handles skew it can SEE in shuffle stats.
  * Salting is the fallback for the cases AQE can't fix: a skewed
  * broadcast-build side, aggregation hotspots feeding the join, or a
  * single key so hot one task's build side won't fit.
  *
  * Mechanics: each big-side row gets one of `salts` sub-keys; the small
  * side is replicated ×`salts`, so every (key, salt) bucket holds
  * 1/salts of the hot key's rows. Result is row-identical to the plain
  * join: a big row joins exactly the one replica carrying its salt.
  */
object SkewJoin {

  def saltedInner(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    // The salt must be DETERMINISTIC IN ROW CONTENT: partition-id or
    // row-position salts change when a map task is recomputed after a
    // fetch failure, duplicating/losing rows once some reducers already
    // consumed the original output (the SPARK-23207 class of bug —
    // exactly the large-cluster scenario salting targets). hash() over
    // every column gives the same salt on every recompute. Caveat: rows
    // that are full duplicates share a salt; dedup first (or include a
    // unique key column) if the hot key's rows are literally identical.
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
