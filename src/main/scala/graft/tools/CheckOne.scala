package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool: the Verify dump restricted to NAMED queries — fast
  * inner-loop oracle checking for a query under construction, fed to the
  * same compare script as the full gate:
  *
  *   sbt "runMain graft.tools.CheckOne s5_kmeans_assign s6_semdedup"
  *   python3 scripts/check.py /root/testdata/sf0.001 /tmp/check_one
  *
  * SPARK_GRAFT_SF_DIR overrides the sf dir (default sf0.001);
  * output dir is /tmp/check_one.
  */
object CheckOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CheckOne <query name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = "/tmp/check_one"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(outDir))
    new java.io.File(outDir).mkdirs()
    args.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter { case (k, _) => args.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"dumped ${args.length} queries to $outDir")
    spark.stop()
  }
}
