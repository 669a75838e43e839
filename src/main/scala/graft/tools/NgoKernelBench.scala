package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the `ngo` occurrence builder's digest stage: the
  * native `graft_ngram_md5` kernel vs the SQL
  * transform/slice/concat_ws/md5 chain it replaced, alternated inside
  * ONE JVM (shared scan cache, shared JIT) so the comparison is the
  * expression, not the session. Each form is materialized through the
  * same noop write; two interleaved passes, min reported.
  *
  *   sbt "runMain graft.tools.NgoKernelBench /tmp/graft_sf10"
  */
object NgoKernelBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    val n = graft.text.SubstringDedup.N
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.lake.Tables.documents(spark, d).select("doc_id", "text")

    def sqlForm: DataFrame = docs
      .withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(t) - $n),
           |  i -> concat_ws(' ', slice(t, i + 1, $n)))""".stripMargin)))
      .withColumnRenamed("pos", "s")
      .select(col("doc_id"), col("s"), unhex(md5(col("col"))).as("ngh"))

    def nativeForm: DataFrame =
      graft.text.SubstringDedup.occurrencesOf(docs)

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both plans once
    time(nativeForm); time(sqlForm)
    val samples = (1 to 2).map(_ => (time(nativeForm), time(sqlForm)))
    val nat = samples.map(_._1).min
    val sql = samples.map(_._2).min
    println(f"""{"metric":"ngo_kernel","tier":"$d","native_sec":$nat%.3f,"sql_chain_sec":$sql%.3f,"speedup":${sql / nat}%.2f,"samples_native":[${samples.map(s => f"${s._1}%.2f").mkString(",")}],"samples_sql":[${samples.map(s => f"${s._2}%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
