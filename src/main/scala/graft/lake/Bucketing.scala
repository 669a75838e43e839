package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located joins (SURVEY §4; r2 verdict "What's
  * missing" #2): the 100 TB answer to the fact-fact shuffle join in j4.
  * Write both facts bucketed (and sorted) on the join key once, and
  * every subsequent equi-join on that key consumes bucket-aligned files
  * with NO Exchange at read time — the recurring lineitem⋈orders
  * shuffle (the single largest data movement in the star-join plan at
  * 1000 executors) becomes a one-time write-side cost amortized over
  * every downstream join/aggregation on the key.
  *
  * Mechanics: the bucket function is Spark's HashPartitioning on the
  * key, recorded in the catalog; scans of a bucketed table report that
  * output partitioning, so EnsureRequirements inserts no shuffle when
  * both sides hash the same key into the same (or a dividing) bucket
  * count. `sortBy` additionally pre-sorts within buckets — with one
  * file per bucket the merge join's Sort disappears too.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table. bucketBy requires
    * `saveAsTable`: the bucket spec lives in the metastore (Glue
    * Catalog ≙ Hive metastore here), which is what lets OTHER sessions'
    * plans see and exploit the co-location.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket keys — plans with
    * the bucketed scans feeding the join directly, no Exchange on
    * either side (asserted in BucketingSpec).
    */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
