package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.lake.Tables._

/** BM25 ranked retrieval (Robertson-Spärck Jones, k1=1.2 b=0.75) for a
  * bounded query-term set — the lexical side of the s8 hybrid stack
  * (s8 fuses per-modality RANKS; this produces the text rank list
  * end-to-end, where t11 stops at per-doc keyword extraction).
  * Reference analogue: the filter stages of ETL_glue_pregao_B3.json
  * select by exact match only — BM25 is the graded relevance a corpus
  * that size needs for retrieval-style selection.
  *
  * Scale shape (100 TB): one token explode feeds BOTH the per-doc
  * length (map-side partial count per doc_id) and the tf relation,
  * which is FILTERED to the query terms at the explode — the only
  * shuffled relations are |docs| (lengths) and |docs containing a
  * query term| (tf). The df/avgdl statistics collapse to |Q|+1 rows
  * and broadcast. Final top-k is TakeOrderedAndProject — per-partition
  * heads, never a global sort. Per-query cost is independent of
  * vocabulary size; the corpus streams once.
  *
  * Cross-engine determinism: every factor is rational EXCEPT idf's ln,
  * and transcendentals are not bit-portable across engines (the
  * Sampling.scala:98 rule). So (a) the normalization uses the rational
  * form dl/avgdl = dl·N/Σdl — no division-order drift; (b) the
  * per-doc score sums its |Q| term contributions in FIXED literal
  * term order (conditional-aggregate pivot, then left-to-right
  * addition — never an unordered SUM over doubles); and (c) the
  * OUTPUT carries no float: rank, doc_id, matched-term count, and doc
  * length only. A last-ulp ln disagreement can flip the output only
  * by reordering two docs whose true scores differ below 1e-15 —
  * docs with IDENTICAL (tf vector, dl) produce bit-equal scores in
  * each engine and fall through to the doc_id tie-break instead.
  */
object Bm25 {

  /** Fixed query-term list — literal order IS the score summation
    * order (determinism contract above).
    */
  private val Terms = Seq("dup", "vector", "spark", "scan")

  def t27Bm25(s: SparkSession, d: String): DataFrame =
    rank(documents(s, d), Terms, k = 20)

  /** Corpus API: top-k (rank, doc_id, matched, dl) by BM25 over any
    * (doc_id, text) frame for a bounded term list.
    */
  def rank(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val st = dl.agg(sum("dl").as("total"), count(lit(1)).as("nd"))
    val tf = tok.filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .withColumn("idf", log(
        (col("nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1)))
      .withColumn("tfn", col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) *
          (lit(0.25) + lit(0.75) * col("dl") * col("nd") / col("total"))))
      .withColumn("sc", col("idf") * col("tfn"))
    // fixed-order pivot: one column per term, summed left-to-right in
    // the literal term order (never an unordered double SUM)
    val aggCols = first(col("dl")).as("dl") +:
      count(lit(1)).cast("int").as("matched") +:
      terms.map(t =>
        max(when(col("term") === t, col("sc"))).as(s"s_$t"))
    val pivoted = scored.groupBy("doc_id")
      .agg(aggCols.head, aggCols.tail: _*)
    val score = terms.map(t => coalesce(col(s"s_$t"), lit(0.0)))
      .reduceLeft(_ + _)
    val top = pivoted.withColumn("score", score)
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))))
      .select(col("rank"), col("doc_id"), col("matched"), col("dl"))
      .orderBy("rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t27_bm25" -> (t27Bm25 _))

  def oracles: Map[String, String] = Map(
    "t27_bm25" -> {
      val inList = Terms.map(t => s"'$t'").mkString(", ")
      val caseCols = Terms.map(t =>
        s"max(CASE WHEN term = '$t' THEN sc END) AS s_$t").mkString(",\n        |    ")
      val scoreSum = Terms.map(t => s"coalesce(s_$t, 0)").mkString(" + ")
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        |st AS (SELECT CAST(sum(dl) AS BIGINT) AS total,
        |              CAST(count(*) AS BIGINT) AS nd FROM dl),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok WHERE term IN ($inList) GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    ln((nd - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)) + 1) *
        |    (tf * CAST(2.2 AS DOUBLE) /
        |      (tf + CAST(1.2 AS DOUBLE) *
        |        (CAST(0.25 AS DOUBLE) +
        |         CAST(0.75 AS DOUBLE) * dl.dl * nd / total))) AS sc
        |  FROM tf JOIN dfq USING (term) JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN st),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS matched,
        |    $caseCols
        |  FROM sc GROUP BY 1),
        |top AS (
        |  SELECT doc_id, matched, $scoreSum AS score FROM agg
        |  ORDER BY score DESC, doc_id LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
        |       doc_id, matched, dl.dl AS dl
        |FROM top JOIN dl USING (doc_id)
        |ORDER BY rank""".stripMargin
    })
}
