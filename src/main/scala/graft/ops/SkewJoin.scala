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

  /** Columns whose type `hash()` accepts: Spark rejects MapType (and
    * anything nesting one) in hash expressions by default — salting on
    * "every column" would throw on such schemas (r3 review), where the
    * old partition-id salt at least ran. Dropping unhashable columns
    * from the SALT only narrows dispersion for rows identical across
    * all hashable columns; correctness never depends on which salt a
    * row gets.
    */
  private def hashableCols(df: DataFrame): Seq[String] = {
    def ok(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => false
      case org.apache.spark.sql.types.ArrayType(e, _) => ok(e)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => ok(f.dataType))
      case _ => true
    }
    df.schema.fields.filter(f => ok(f.dataType)).map(_.name).toSeq
  }

  private def salt(big: DataFrame, key: String, salts: Int) = {
    // The salt must be DETERMINISTIC IN ROW CONTENT: partition-id or
    // row-position salts change when a map task is recomputed after a
    // fetch failure, duplicating/losing rows once some reducers already
    // consumed the original output (the SPARK-23207 class of bug —
    // exactly the large-cluster scenario salting targets). hash() over
    // the hashable columns gives the same salt on every recompute.
    // Caveat: rows identical across those columns share a salt; dedup
    // first (or add a unique id column) if the hot key's rows are
    // literally identical.
    val cols = hashableCols(big) match {
      case Seq() => Seq(key) // join key is always hashable in an equi-join
      case cs => cs
    }
    big.withColumn("__salt",
      pmod(hash(cols.map(col): _*), lit(salts)).cast("int"))
  }

  private def replicate(small: DataFrame, salts: Int) =
    small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))

  def saltedInner(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    salt(big, key, salts)
      .join(replicate(small, salts), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** LEFT variant — what a skewed ENRICHMENT join needs: keep every
    * big-side row, enrich where the dim matches. Row-identical to the
    * plain left join: the small side is replicated across all `salts`
    * sub-keys, so a big row's (key, salt) bucket contains its dim row
    * iff the key exists in `small` at all — unmatched rows null-pad
    * exactly as in the unsalted join.
    */
  def saltedLeft(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    salt(big, key, salts)
      .join(replicate(small, salts), Seq(key, "__salt"), "left")
      .drop("__salt")
  }
}
