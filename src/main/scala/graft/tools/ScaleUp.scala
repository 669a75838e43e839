package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for scale validation (r6 verdict #1):
  * replicates the driver-generated sf0.1 tables `factor`× into an sf1
  * tier with DISJOINT key spaces and copy-perturbed content, so the
  * scaled corpus has realistic 10× statistics instead of ten identical
  * clones:
  *
  *   - ids offset by copy·stride (stride = the table's row count; the
  *     testdata keys are 0-based dense) — uniqueness and referential
  *     integrity hold per copy (each copy's orders point at that copy's
  *     customers, etc.)
  *   - document text goes through a per-copy letter PERMUTATION (a
  *     seeded uniform permutation of [a-z]/[A-Z] per copy — r15
  *     verdict #1 replaced the caesar rotation, whose mod-26 alias
  *     made copies ≥ 26 exact text clones): lengths, token counts,
  *     whitespace and within-copy duplicate structure are preserved
  *     exactly, while cross-copy shingles/minhashes are disjoint at
  *     EVERY factor — dedup candidate volume scales linearly like a
  *     real crawl, not quadratically like cloned text would, and the
  *     planted dup density is tier-invariant (ScaleUpSpec)
  *   - embeddings are PERMUTED (circular shift by copy·7 mod 64) and
  *     per-copy SIGN-FLIPPED (the shift alone aliased at 64 copies):
  *     both preserve norms and within-copy pairwise cosines
  *     bit-for-bit, while cross-copy cosines are near-orthogonal noise —
  *     LSH bucket occupancy grows `factor`× with the same geometry
  *   - customer names regenerate from the new key (`Customer#%09d`, the
  *     testdata's own pattern), so the name-linkage blocks of
  *     f_edit_distance grow 10× in population without gaining
  *     distance-0 clone pairs
  *   - region/nation copy unchanged (fixed dims, TPC-H-style)
  *   - events copies get disjoint event_id AND user_id spaces (user
  *     stride = 1 + max id), ts untouched: the scaled log is a
  *     `factor`×-busier site over the same wall-clock window, with
  *     per-user event counts and densities preserved exactly — the
  *     right shape for the window/warehouse families, which partition
  *     by user. The ts column round-trips through whatever encoding
  *     the source tier carries (NANOS-as-long int64, NTZ, or LTZ — it
  *     is never touched); `Tables.events` dispatches on the scanned
  *     type, so all three re-read correctly (r9; pre-r9 events was
  *     copied byte-identical because no heavy query read it)
  *
  * Every transform is a pure projection of exact integer/byte work — no
  * float arithmetic, no shuffle — so the scaled corpus is bit-identical
  * across runs and engines (the sf1 spot-oracle reads the same files).
  *
  *   sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10"
  */
object ScaleUp {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  /** splitmix64 — the per-copy PRNG behind [[permAlpha]] and
    * [[flipBits]], written out so the scaled tiers are bit-identical
    * across runs and JVMs with no library-version dependence.
    */
  private[graft] def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-copy letter PERMUTATION (r15 verdict #1): the previous caesar
    * rotation aliased mod 26 — copies ≥ 26 were exact text clones of
    * their 26-earlier siblings, which saturated planted dup density
    * 10% → 100% between the 10× and 100× tiers and confounded every
    * text-family scale law at ≥ 26×. Each copy c ≥ 1 now substitutes
    * through its OWN uniform permutation of [a-z] (mirrored on
    * [A-Z]), drawn by a seeded Fisher-Yates over [[mix64]]. Still an
    * injective letter map, so lengths, token counts, whitespace and
    * within-copy duplicate structure are preserved exactly; the alias
    * period is gone (26! permutations), and two distinct copies map a
    * given ngram identically only if their permutations agree on every
    * letter it uses — ~26^-k for k distinct letters, vanishing for
    * word-width spans — so dup density stays at the source tier's
    * planted rate at EVERY factor (ScaleUpSpec pins it at a
    * past-the-old-alias factor). Copy 0 is the identity: the original
    * tier's rows appear verbatim.
    */
  private[graft] def permAlpha(c: Int): (String, String) = {
    if (c == 0) return (Lower + Upper, Lower + Upper)
    val p = Lower.toCharArray
    var i = p.length - 1
    while (i > 0) {
      val r = mix64(c.toLong * 131L + i)
      val j = java.lang.Long.remainderUnsigned(r, i + 1L).toInt
      val t = p(i); p(i) = p(j); p(j) = t
      i -= 1
    }
    val lo = new String(p)
    (Lower + Upper, lo + lo.toUpperCase)
  }

  /** Per-copy SIGN-FLIP mask for the embedding copies (the text fix's
    * vector counterpart): the circular shift alone has period 64, so
    * copies ≥ 64 were exact embedding clones. Bit i of the mask
    * negates dimension i AFTER the shift; negation preserves norms
    * exactly and within-copy pairwise cosines bit-for-bit (both
    * vectors of a pair flip the same dims: (-x)·(-y) = x·y), while
    * cross-copy cosines stay near-orthogonal noise. shift × mask
    * gives 64·2⁶⁴ distinct copy transforms — no alias at any factor.
    * Copy 0 keeps mask 0 (identity).
    */
  private[graft] def flipBits(c: Int): Long =
    if (c == 0) 0L else mix64(0xE1B1E5L * c.toLong)

  /** One scaled copy of `df` — `perturb(copyIndex)` returns the
    * column edits applied on top of the key offsets.
    */
  private def copies(df: DataFrame, factor: Int)(
      perturb: Int => DataFrame => DataFrame): DataFrame =
    (0 until factor).map(c => perturb(c)(df)).reduce(_ unionByName _)

  /** The documents scaling transform, exposed for ScaleUpSpec's
    * dup-density pin: `stride` is the source tier's doc count.
    */
  private[graft] def scaledDocuments(df: DataFrame, factor: Int,
      stride: Long): DataFrame =
    copies(df, factor) { c => d =>
      val (from, to) = permAlpha(c)
      d.withColumn("doc_id", col("doc_id") + lit(c * stride))
        .withColumn("text", translate(col("text"), from, to))
    }

  /** The embeddings scaling transform (shift ∘ sign-flip), exposed for
    * ScaleUpSpec's no-alias and norm pins.
    */
  private[graft] def scaledEmbeddings(df: DataFrame, factor: Int,
      stride: Long): DataFrame =
    copies(df, factor) { c => d =>
      val dims = 64
      val shift = (c * 7) % dims
      val rotated =
        if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, dims - shift),
          slice(col("embedding"), 1, shift))
      val mask = flipBits(c)
      // the mask lowers to a ±1.0f literal array zipped in: float
      // multiply by ±1 is exact, so norms and within-copy cosines are
      // preserved bit-for-bit
      val flipped =
        if (mask == 0L) rotated
        else zip_with(rotated,
          array((0 until dims).map(j =>
            lit(if (((mask >>> j) & 1L) == 1L) -1.0f else 1.0f)): _*),
          (x, f) => x * f)
      d.withColumn("vec_id", col("vec_id") + lit(c * stride))
        .withColumn("embedding", flipped)
    }

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    // optional 4th arg: comma-separated table subset — e.g. the 100x
    // corpus tier only needs documents+embeddings (scaling lineitem
    // 100x would write ~60 M rows no heavy-family query reads)
    val only: String => Boolean = if (args.length > 3) {
      val s = args(3).split(",").map(_.trim).toSet; s.contains
    } else _ => true

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").option("compression", "snappy")
        .parquet(s"$out/$t.parquet")
    def copyRaw(t: String): Unit = {
      val to = java.nio.file.Paths.get(out, s"$t.parquet")
      java.nio.file.Files.createDirectories(to.getParent)
      java.nio.file.Files.copy(java.nio.file.Paths.get(src, s"$t.parquet"),
        to, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    // fixed dims: byte-identical copies
    Seq("region", "nation").filter(only).foreach(copyRaw)

    lazy val nCust = read("customer").count()
    lazy val nSupp = read("supplier").count()
    lazy val nPart = read("part").count()
    lazy val nOrd = read("orders").count()
    lazy val nDoc = read("documents").count()
    lazy val nVec = read("embeddings").count()

    if (only("customer")) write(copies(read("customer"), factor) { c => df =>
      df.withColumn("c_custkey", col("c_custkey") + lit(c * nCust))
        .withColumn("c_name",
          format_string("Customer#%09d", col("c_custkey")))
    }, "customer")

    if (only("supplier")) write(copies(read("supplier"), factor) { c => df =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(c * nSupp))
    }, "supplier")

    if (only("part")) write(copies(read("part"), factor) { c => df =>
      df.withColumn("p_partkey", col("p_partkey") + lit(c * nPart))
    }, "part")

    if (only("orders")) write(copies(read("orders"), factor) { c => df =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(c * nOrd))
        .withColumn("o_custkey", col("o_custkey") + lit(c * nCust))
    }, "orders")

    if (only("events")) {
      val ev = read("events")
      val nEv = ev.count()
      val uStride = ev.agg(max(col("user_id"))).head.getLong(0) + 1L
      write(copies(ev, factor) { c => df =>
        df.withColumn("event_id", col("event_id") + lit(c * nEv))
          .withColumn("user_id", col("user_id") + lit(c * uStride))
      }, "events")
    }

    if (only("lineitem")) write(copies(read("lineitem"), factor) { c => df =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(c * nOrd))
        .withColumn("l_partkey", col("l_partkey") + lit(c * nPart))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * nSupp))
    }, "lineitem")

    if (only("documents"))
      write(scaledDocuments(read("documents"), factor, nDoc), "documents")

    if (only("embeddings"))
      write(scaledEmbeddings(read("embeddings"), factor, nVec), "embeddings")

    val scaledDocs = if (only("documents")) nDoc * factor else 0L
    val scaledVecs = if (only("embeddings")) nVec * factor else 0L
    println(s"""{"scaled":"$out","factor":$factor,"docs":$scaledDocs,"vecs":$scaledVecs}""")
    spark.stop()
  }
}
