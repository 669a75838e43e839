package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.lake.Tables._
import graft.functions.Hashing

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: array<float>, label) — the brief's ANN extension.
  *
  * Cross-engine determinism: every floating-point reduction is a
  * SEQUENTIAL left fold over the array (Spark `aggregate`, DuckDB
  * `list_reduce`), with every element cast to double BEFORE arithmetic.
  * Same operand order + same widths ⇒ bit-identical doubles in both
  * engines, so ranking (which compares exact doubles) agrees and the
  * rounded cosine in the output hashes identically.
  *
  * Scale notes (100 TB):
  *   - s1 is the exact baseline: the query side is a small bounded set,
  *     so the "cross" join is a broadcast nested loop over 10 rows —
  *     linear in the corpus, embarrassingly parallel, no shuffle of the
  *     big side.
  *   - s2 is the scale path: random-hyperplane LSH assigns every vector
  *     a bucket in a narrow projection; candidates meet in a bucket-key
  *     equi-join (shuffle on an 8-bit key — at real scale use 16-24 bits
  *     so buckets stay executor-sized), never an n² crossJoin.
  */
object Similarity {

  /** Sequential-fold dot product of two array<float> columns (SQL
    * fragment; arrays are 1-indexed in element_at).
    */
  private def dotSql(a: String, b: String): String =
    s"""aggregate(sequence(1, size($a)), cast(0.0 as double),
       |  (acc, i) -> acc + cast(element_at($a, i) as double)
       |                  * cast(element_at($b, i) as double))""".stripMargin

  private def normSql(a: String): String =
    s"sqrt(${dotSql(a, a)})"

  /** Exact cosine between two embedding columns. */
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** s1: brute-force exact top-5 cosine neighbors for a bounded query
    * set (vec_id < 10) against the whole corpus.
    */
  def s1CosineTopk(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos_exact", expr(cosSql("qv", "nv")))
    val w = Window.partitionBy("q_id")
      .orderBy(desc("cos_exact"), asc("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("n_id"),
        round(col("cos_exact"), 4).as("cos"),
        col("rank"))
      .orderBy("q_id", "rank")
  }

  /** 8-bit random-hyperplane LSH bucket of the `embedding` column.
    * Hyperplane component (p, j) is derived deterministically from the
    * portable hash — uniform in [-1, 1) — so Spark and DuckDB build the
    * SAME hyperplanes with no shipped state.
    */
  private val bucketSql: String = {
    val hp = Hashing.h32Sql("concat(cast(p as string), '_', cast(j as string))")
    s"""aggregate(sequence(0, 7), 0, (acc, p) ->
       |  acc + IF(aggregate(sequence(0, size(embedding)-1), cast(0.0 as double),
       |             (a2, j) -> a2 + cast(element_at(embedding, j+1) as double)
       |               * (($hp / 2147483648.0) - 1.0)) > 0,
       |           shiftleft(1, p), 0))""".stripMargin
  }

  /** s2: LSH-bucketed approximate top-3 neighbors for EVERY vector —
    * the shape that survives 100× scale-up (bucket equi-join; exact
    * cosine only within buckets).
    */
  def s2AnnLsh(s: SparkSession, d: String): DataFrame = {
    val b = embeddings(s, d)
      .select(col("vec_id"), col("embedding"), expr(bucketSql).as("bucket"))
    val a = b.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
      col("bucket"))
    val c = b.select(col("vec_id").as("n_id"), col("embedding").as("nv"),
      col("bucket").as("bucket2"))
    val w = Window.partitionBy("q_id")
      .orderBy(desc("cos_exact"), asc("n_id"))
    a.join(c, col("bucket") === col("bucket2") && col("q_id") =!= col("n_id"))
      .withColumn("cos_exact", expr(cosSql("qv", "nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("n_id"),
        round(col("cos_exact"), 4).as("cos"),
        col("rank"))
      .orderBy("q_id", "rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_cosine_topk" -> (s1CosineTopk _),
    "s2_ann_lsh"     -> (s2AnnLsh _),
  )

  // --- DuckDB oracles --------------------------------------------------
  // list_reduce is DuckDB's sequential fold; prepending Spark's 0.0 seed
  // is exact (0.0 + x == x), so both folds produce identical doubles.

  private def dotDuck(a: String, b: String): String =
    s"""list_reduce(list_transform(range(len($a)),
       |  i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)),
       |  (x, y) -> x + y)""".stripMargin

  private def cosDuck(a: String, b: String): String =
    s"(${dotDuck(a, b)} / (sqrt(${dotDuck(a, a)}) * sqrt(${dotDuck(b, b)})))"

  private val bucketDuck: String = {
    val hp = Hashing.h32Duck(
      "CAST(p AS VARCHAR) || '_' || CAST(j AS VARCHAR)")
    s"""CAST(list_sum(list_transform(range(8), p ->
       |  CASE WHEN list_reduce(list_transform(range(len(embedding)),
       |         j -> CAST(embedding[j+1] AS DOUBLE)
       |              * (($hp / 2147483648.0) - 1.0)),
       |         (x, y) -> x + y) > 0
       |       THEN (1 << p) ELSE 0 END)) AS INTEGER)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "s1_cosine_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 10
         |), c AS (
         |  SELECT vec_id AS n_id, embedding AS nv FROM embeddings
         |), scored AS (
         |  SELECT q_id, n_id, ${cosDuck("qv", "nv")} AS cos_exact
         |  FROM q, c WHERE q_id <> n_id
         |), ranked AS (
         |  SELECT q_id, n_id, cos_exact,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_exact DESC, n_id) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT q_id, n_id, round(cos_exact, 4) AS cos, rank
         |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "s2_ann_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, $bucketDuck AS bucket FROM embeddings
         |), scored AS (
         |  SELECT a.vec_id AS q_id, c.vec_id AS n_id,
         |    ${cosDuck("a.embedding", "c.embedding")} AS cos_exact
         |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
         |), ranked AS (
         |  SELECT q_id, n_id, cos_exact,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_exact DESC, n_id) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT q_id, n_id, round(cos_exact, 4) AS cos, rank
         |FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
  )
}
