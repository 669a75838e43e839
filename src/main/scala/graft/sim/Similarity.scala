package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.lake.Tables._
import graft.functions.{Hashing, VectorExpressions}

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

  /** Dot product via the native [[graft.functions.DotProduct]]
    * expression (`graft_dot`): a doGenCode loop with the same
    * sequential summation order as DuckDB's list_reduce, staying inside
    * whole-stage codegen at any dimensionality (an unrolled chain
    * overflows janino's method limit at 8×64 terms; a higher-order
    * `aggregate` is interpreted).
    */
  private def dotSql(a: String, b: String): String =
    s"graft_dot($a, $b)"

  private def normSql(a: String): String =
    s"sqrt(${dotSql(a, a)})"

  /** Exact cosine between two embedding columns. */
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** s1: brute-force exact top-5 cosine neighbors for a bounded query
    * set (vec_id < 10) against the whole corpus.
    */
  def s1CosineTopk(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.ensureRegistered(s)
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

  /** Embedding dimensionality of the testdata corpus. The hyperplane
    * matrix is precomputed for this width; [[bucketSql]] guards with a
    * size check so a drifted corpus fails loudly, not wrongly.
    */
  private val Dims = 64

  /** 8-bit random-hyperplane LSH bucket of the `embedding` column.
    * Hyperplane component (p, j) is `h32(p + "_" + j)/2^31 − 1`
    * (uniform in [-1, 1)) — derived deterministically from the portable
    * hash, so DuckDB rebuilds the SAME hyperplanes in SQL with no
    * shipped state. Spark-side the 512 components are evaluated ONCE on
    * the driver ([[Hashing.h32Host]], bit-identical arithmetic) and
    * shipped as literal arrays into `graft_dot` — the md5-per-row-per-
    * component SQL form cost 10+ s at sf0.1, this form is sub-second
    * and the sign test stays bit-identical to the oracle.
    */
  private val bucketSql: String = {
    val dots = (0 until 8).map { p =>
      val plane = (0 until Dims)
        .map(j => s"${Hashing.h32Host(s"${p}_$j") / 2147483648.0 - 1.0}D")
        .mkString("array(", ", ", ")")
      s"graft_dot(embedding, $plane)"
    }
    dots.zipWithIndex
      .map { case (dot, p) => s"IF($dot > 0, ${1 << p}, 0)" }
      .mkString("IF(size(embedding) = 64, ", " + ", ", raise_error('unexpected embedding dims'))")
  }

  /** s2: LSH-bucketed approximate top-3 neighbors for EVERY vector —
    * the shape that survives 100× scale-up (bucket equi-join; exact
    * cosine only within buckets).
    */
  def s2AnnLsh(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.ensureRegistered(s)
    val b = embeddings(s, d)
      .select(col("vec_id"), col("embedding"), expr(bucketSql).as("bucket"))
    val a = b.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
      col("bucket"))
    val c = b.select(col("vec_id").as("n_id"), col("embedding").as("nv"),
      col("bucket").as("bucket2"))
    val w = Window.partitionBy("q_id")
      .orderBy(desc("cos_exact"), asc("n_id"))
    // shuffle_hash on both sides -> identical exchanges -> ReuseExchange
    // computes the bucket projection once (broadcast is impossible at
    // corpus scale anyway)
    a.join(c.hint("shuffle_hash"),
        col("bucket") === col("bucket2") && col("q_id") =!= col("n_id"))
      .withColumn("cos_exact", expr(cosSql("qv", "nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("n_id"),
        round(col("cos_exact"), 4).as("cos"),
        col("rank"))
      .orderBy("q_id", "rank")
  }

  /** s3 / d5: embedding-cosine near-duplicate pairs — the fifth dedup
    * mode of the brief. Same bucketed candidate generation as s2, but
    * symmetric pairs (a < b) kept above a cosine threshold: the
    * "these two documents are semantically the same" signal an
    * embedding-based dedup stage feeds into the keep-one policy.
    * Threshold 0.30 is calibrated to this synthetic corpus (max pair
    * cosine 0.51, no planted embedding dups); real embedding dedup runs
    * the same plan at ~0.9+.
    */
  def s3EmbeddingNeardup(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.ensureRegistered(s)
    val b = embeddings(s, d)
      .select(col("vec_id"), col("embedding"), expr(bucketSql).as("bucket"))
    val a = b.select(col("vec_id").as("vec_a"), col("embedding").as("qv"),
      col("bucket"))
    val c = b.select(col("vec_id").as("vec_b"), col("embedding").as("nv"),
      col("bucket").as("bucket2"))
    a.join(c.hint("shuffle_hash"), // ReuseExchange, see s2
        col("bucket") === col("bucket2") && col("vec_a") < col("vec_b"))
      .withColumn("cos", round(expr(cosSql("qv", "nv")), 4))
      .filter(col("cos") >= 0.30)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  /** s4: IVF-style ANN — the other standard index shape the brief
    * names. Coarse quantizer: every 25th vector is a centroid
    * (deterministic, no trained state to ship); every vector is
    * assigned to its nearest centroid (inverted lists); a query probes
    * its nprobe=2 nearest centroids and scores exact cosine only inside
    * those lists.
    *
    * Scale shape: the centroid set is small → broadcast to both the
    * assignment and the probe joins (the corpus never shuffles for
    * assignment); candidates meet in an equi-join on cent_id. At real
    * scale the centroids come from k-means and nlist ~ sqrt(n), but the
    * plan is identical.
    */
  def s4IvfTopk(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.ensureRegistered(s)
    val e = embeddings(s, d)
    val cents = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    // inverted lists: nearest centroid per vector (exact-double argmax,
    // cent_id tiebreak)
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(desc("cos_c"), asc("cent_id"))
    val lists = e.join(broadcast(cents))
      .withColumn("cos_c", expr(cosSql("embedding", "cv")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("n_id"), col("embedding").as("nv"),
        col("cent_id"))
    // probes: nprobe=2 nearest centroids per query vector
    val wProbe = Window.partitionBy("q_id")
      .orderBy(desc("cos_c"), asc("cent_id"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .join(broadcast(cents))
      .withColumn("cos_c", expr(cosSql("qv", "cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2)
      .select(col("q_id"), col("qv"), col("cent_id"))
    // exact scoring inside the probed lists only
    val wTop = Window.partitionBy("q_id")
      .orderBy(desc("cos_exact"), asc("n_id"))
    probes.join(lists, Seq("cent_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos_exact", expr(cosSql("qv", "nv")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("n_id"),
        round(col("cos_exact"), 4).as("cos"), col("rank"))
      .orderBy("q_id", "rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_cosine_topk"      -> (s1CosineTopk _),
    "s2_ann_lsh"          -> (s2AnnLsh _),
    "s3_embedding_neardup" -> (s3EmbeddingNeardup _),
    "s4_ivf_topk"         -> (s4IvfTopk _),
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
    "s3_embedding_neardup" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, $bucketDuck AS bucket FROM embeddings
         |), scored AS (
         |  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
         |    round(${cosDuck("a.embedding", "c.embedding")}, 4) AS cos
         |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
         |SELECT vec_a, vec_b, cos FROM scored
         |WHERE cos >= 0.30 ORDER BY vec_a, vec_b""".stripMargin,
    "s4_ivf_topk" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
         |  WHERE vec_id % 25 = 0
         |), lists AS (
         |  SELECT n_id, nv, cent_id FROM (
         |    SELECT e.vec_id AS n_id, e.embedding AS nv, c.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosDuck("e.embedding", "c.cv")} DESC, c.cent_id) AS rn
         |    FROM embeddings e, cents c)
         |  WHERE rn = 1
         |), probes AS (
         |  SELECT q_id, qv, cent_id FROM (
         |    SELECT e.vec_id AS q_id, e.embedding AS qv, c.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosDuck("e.embedding", "c.cv")} DESC, c.cent_id) AS rn
         |    FROM embeddings e, cents c WHERE e.vec_id < 10)
         |  WHERE rn <= 2
         |), ranked AS (
         |  SELECT q_id, n_id, cos_exact,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos_exact DESC, n_id) AS INTEGER) AS rank
         |  FROM (
         |    SELECT p.q_id, l.n_id, ${cosDuck("p.qv", "l.nv")} AS cos_exact
         |    FROM probes p JOIN lists l ON p.cent_id = l.cent_id
         |    WHERE p.q_id <> l.n_id))
         |SELECT q_id, n_id, round(cos_exact, 4) AS cos, rank
         |FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
  )
}
