package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embedding-column encoding contract — the events.ts lesson applied
  * to the `embeddings` table BEFORE a regeneration bites: the upstream
  * writer may ship `embedding` as float[] (today) or double[] (the
  * plausible drift — r7 lost seven queries to exactly this class on
  * timestamps). `graft_dot` dispatches on the scanned element type and
  * every driver-side collect is type-agnostic, so the whole ANN family
  * must produce IDENTICAL results on both encodings when the stored
  * values are equal (floats widen exactly, so a double file holding
  * float-representable values is the same math in both engines).
  *
  * The fixture writes the REAL sf0.001 vectors in both shapes and runs
  * one query per index family over each.
  */
class EmbeddingsEncodingSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dirs: (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("embenc").toString
    val src = spark.read.parquet(s"$sf/embeddings.parquet")
    val fdir = s"$base/float"
    val ddir = s"$base/double"
    src.write.parquet(s"$fdir/embeddings.parquet")
    src.withColumn("embedding", col("embedding").cast("array<double>"))
      .write.parquet(s"$ddir/embeddings.parquet")
    (fdir, ddir)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("fixture precondition: the double file really scans as array<double>") {
    val (fdir, ddir) = dirs
    import org.apache.spark.sql.types._
    def elem(d: String): DataType =
      spark.read.parquet(s"$d/embeddings.parquet").schema("embedding")
        .dataType.asInstanceOf[ArrayType].elementType
    assert(elem(fdir) == FloatType && elem(ddir) == DoubleType)
  }

  test("every ANN index family is encoding-invariant: LSH, IVF, PQ, IVF-PQ, brute, near-dup") {
    val (fdir, ddir) = dirs
    val queries = Seq("s1_cosine_topk", "s2_ann_lsh", "s3_embedding_neardup",
      "s4_ivf_topk", "s9_pq_topk", "s13_ivfpq_topk")
    queries.foreach { name =>
      val f = rows(SparkEntry.queries(name)(spark, fdir))
      val d = rows(SparkEntry.queries(name)(spark, ddir))
      assert(f.nonEmpty, s"$name produced no rows on the fixture")
      assert(f == d, s"$name diverges between float[] and double[] encodings: " +
        s"first diff ${f.zip(d).find(p => p._1 != p._2)}")
    }
  }

  test("incremental admission is encoding-invariant") {
    val (fdir, ddir) = dirs
    def admitted(dir: String): Seq[Long] =
      graft.sim.Similarity.queries("s12_incremental_admit")(spark, dir)
        .collect().map(_.getLong(0)).toSeq
    assert(admitted(fdir) == admitted(ddir))
  }
}
