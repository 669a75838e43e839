package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The NIGHTLY-INCREMENT orchestrator: one entry point that lands a
  * crawl/fact/event delta in a tier and maintains EVERY persisted
  * artifact the tier serves — the composed form of the per-family
  * maintenance this library grew piecemeal (band index, fingerprint
  * indexes, ngram-occurrence index, image-signature index, trained
  * BPE tokenizer, co-order adjacency, g1 edges, memoized LPA, ANN
  * index, and the warehouse
  * states: algebraic agg, HLL/KLL sketches, the materialized join
  * view), so the "daily crawl" story is one call, not a checklist an
  * operator can get out of order.
  *
  * Ordering is the whole point, and it is the appendIncrement caller
  * contract enforced mechanically:
  *
  *   1. read EVERY artifact's stamp FIRST (prevSig handles — they
  *      witness the pre-delta corpus each maintainer derived from);
  *   2. land the delta files in the tier (corpus changes by exactly
  *      the delta);
  *   3. run each artifact's increment append against its handle.
  *
  * A handle read after step 2 would self-certify; an append before
  * step 2 would race its own corpus. Artifacts WITHOUT a serving
  * table (or memo) are skipped — a tier that never persisted an index
  * pays nothing, and a stale table was already dropped by serve()'s
  * mismatch path. Each append inherits the family's own posture:
  * append-before-restamp crash safety, auto-compaction past the file
  * debt threshold, merge-on-read where weights are additive, the
  * warm-LPA saturation bail. MaintenanceSpec drives the whole flow
  * and pins every artifact fresh AND equal to a from-scratch rebuild
  * afterwards.
  *
  * Document deltas are assumed ADMITTED already (the d13/s12 gate runs
  * before anything lands — admission is a decision, maintenance is
  * bookkeeping); fact deltas are whole NEW orders with their lines
  * (the order-local increment grain every graph artifact requires).
  */
object Maintenance {

  /** What one nightly run did: artifact name → maintained (true) or
    * skipped because nothing was serving (false). "Maintained"
    * includes empty-increment RE-STAMPS (see [[nightly]]).
    */
  final case class NightlyReport(maintained: Map[String, Boolean])

  /** Fact deltas must arrive as WHOLE new orders with their lines —
    * the order-local grain every graph artifact's append soundness
    * rests on — so lineitem and orders deltas come together or not at
    * all (a lines-only delta would make g1's delta edges silently
    * empty under the join with no matching orders).
    */
  /** `bpePolicy` is the tokenizer-retrain policy forwarded to
    * [[graft.text.TextAnalysis.maintainBpe]]: "always" (default —
    * exactness: the served tokenizer equals a retrain on the grown
    * corpus) or "on-doubling" (the frozen-artifact posture: restamp
    * only, retrain when corpus bytes double — the ANN ladder
    * precedent).
    */
  /** `spanScreenStores`: flagged-store roots of any
    * [[graft.streaming.Streams.spanScreenStream]] instances whose
    * cross-batch side stores this window should maintain (r16 verdict
    * #4 — the stores are stream-instance-keyed, not tier-keyed, so the
    * orchestrator names them). Each gets the partition-count-triggered
    * compaction; the maintenance window IS the no-concurrent-
    * micro-batch boundary the compaction contract demands.
    */
  def nightly(s: SparkSession, d: String,
      newDocs: Option[DataFrame] = None,
      newLineitem: Option[DataFrame] = None,
      newOrders: Option[DataFrame] = None,
      newEmbeddings: Option[DataFrame] = None,
      newEvents: Option[DataFrame] = None,
      bpePolicy: String = "always",
      spanScreenStores: Seq[String] = Seq.empty): NightlyReport = {
    import graft.text.{Dedup, Winnowing}
    import graft.ops.Warehouse
    import graft.queries.Graph
    import graft.sim.Similarity
    require(newLineitem.isEmpty == newOrders.isEmpty,
      "fact deltas are whole orders: pass newLineitem and newOrders " +
        "together or neither")

    val docsPath = s"$d/documents.parquet"

    // ---- 1. handles BEFORE anything lands -------------------------
    val bandSig = Dedup.bandIndexStamp(s, docsPath)
    val fpSig = Winnowing.fingerprintStamp(s, d)
    val ngoSig = graft.text.SubstringDedup.occurrenceStamp(s, d)
    val dsirSig = graft.text.Dsir.ratioStamp(s, d)
    val mmSig = graft.mm.Multimodal.phashStamp(s, d)
    val bpeSig = graft.text.TextAnalysis.bpeStamp(s, d)
    val bpeStreamSig = graft.text.TextAnalysis.bpeStreamStamp(s, d)
    val adjSig = Graph.adjacencyStamp(s, d)
    val g1Sig = Graph.g1Stamp(s, d)
    val lpaSig = Graph.lpaStamp(s, d)
    val annSig = Similarity.annIndexStamp(s, d)
    val aggSig = Warehouse.aggStateStamp(s, d)
    val hllSig = Warehouse.hllStateStamp(s, d)
    val jvSig = Warehouse.joinViewStamp(s, d)

    // ---- 2. the delta lands ---------------------------------------
    newDocs.foreach(_.write.mode("append").parquet(docsPath))
    newLineitem.foreach(
      _.write.mode("append").parquet(s"$d/lineitem.parquet"))
    newOrders.foreach(
      _.write.mode("append").parquet(s"$d/orders.parquet"))
    newEmbeddings.foreach(
      _.write.mode("append").parquet(s"$d/embeddings.parquet"))
    // events deltas must carry the tier's ts ENCODING (the caller
    // normalizes through Tables.normalizeEventsTs before handing rows
    // over — mixed encodings in one directory fail the merged read)
    newEvents.foreach(
      _.write.mode("append").parquet(s"$d/events.parquet"))
    // ANYTHING landing in the tier moves the directory signature the
    // graph artifacts are stamped against — including an
    // embeddings-only delta (ADVICE r14: leaving embeddings out of
    // `landed` stranded coadj/g1/LPA stale, and the next serve()
    // silently dropped them and paid the cold rebuild this
    // orchestrator exists to avoid).
    val landed = newDocs.nonEmpty || newLineitem.nonEmpty ||
      newOrders.nonEmpty || newEmbeddings.nonEmpty || newEvents.nonEmpty

    // ---- 3. per-artifact increments against the handles -----------
    // The document indexes sign documents.parquet ALONE, so a
    // facts-only nightly leaves them untouched AND fresh — no action
    // needed. The graph artifacts sign the TIER DIRECTORY (the
    // over-invalidation posture), so a docs-only nightly moves their
    // signature even though their INPUTS are unchanged — without
    // intervention they would strand stale and silently fall back to
    // cold rebuilds. The fix is the EMPTY-INCREMENT RE-STAMP: an
    // append of zero derived rows is vacuously "exactly the change
    // their inputs saw", lands nothing, and moves the stamp to the
    // new tier signature (MaintenanceSpec pins the served relations
    // bit-identical across it).
    def emptyLi = graft.lake.Tables.lineitem(s, d).limit(0)
    def emptyOrd = graft.lake.Tables.orders(s, d).limit(0)

    val band = (newDocs, bandSig) match {
      case (Some(docs), Some(sig)) =>
        Dedup.appendBandIndex(s, docsPath, docs, sig); true
      case _ => false
    }
    val fp = (newDocs, fpSig) match {
      case (Some(docs), Some(sig)) =>
        Winnowing.appendFingerprintIndex(s, d, docs, sig); true
      case _ => false
    }
    // the ngram-occurrence index (t40/t41) is docs-scoped and per-doc
    // row-local like the fingerprints: only the new docs split + hash
    val ngo = (newDocs, ngoSig) match {
      case (Some(docs), Some(sig)) =>
        graft.text.SubstringDedup.appendOccurrenceIndex(s, d, docs, sig)
        true
      case _ => false
    }
    // the dsir feature-counts table is docs-scoped and count-additive:
    // the delta's per-feature counts append as rows, consumers
    // merge-on-read (sum per f) — append == rebuild exactly
    val dsir = (newDocs, dsirSig) match {
      case (Some(docs), Some(sig)) =>
        graft.text.Dsir.appendRatioTable(s, d, docs, sig); true
      case _ => false
    }
    // the image-signature index is docs-scoped like band/fingerprints:
    // only the new docs' payloads decode + hash (per-media locality —
    // the corpus is never re-decoded, which is the whole point of the
    // persisted table; r14 verdict #1)
    val mm = (newDocs, mmSig) match {
      case (Some(docs), Some(sig)) =>
        graft.mm.Multimodal.appendPhashIndex(s, d, docs, sig); true
      case _ => false
    }
    // the tokenizer artifact is corpus-global (no sound append): the
    // leg delegates to the retrain policy — "always" re-trains on the
    // grown corpus, "on-doubling" restamps the frozen artifact until
    // corpus bytes double (r14 verdict #3)
    val (bpe, bpeRetrained) = (newDocs, bpeSig) match {
      case (Some(_), Some(sig)) =>
        (true, graft.text.TextAnalysis.maintainBpe(s, d, sig, bpePolicy))
      case _ => (false, true)
    }
    // the trained-token STREAM derives from the tokenizer the leg
    // above just left serving, so it maintains strictly after it:
    // retrained merges re-encode everything (re-persist); a frozen
    // restamp means per-doc locality holds and the delta appends
    val bpeStream = (newDocs, bpeStreamSig) match {
      case (Some(docs), Some(sig)) =>
        graft.text.TextAnalysis.maintainBpeStream(s, d, docs, sig,
          retrained = bpeRetrained || bpeSig.isEmpty)
        true
      case _ => false
    }
    val adj = adjSig match {
      case Some(sig) if newLineitem.nonEmpty =>
        Graph.appendAdjacencyIncrement(s, d, newLineitem.get, sig); true
      case Some(sig) if landed =>
        Graph.appendAdjacencyIncrement(s, d, emptyLi, sig); true
      case _ => false
    }
    val g1 = g1Sig match {
      case Some(sig) if newLineitem.nonEmpty =>
        Graph.appendG1Increment(s, d, newLineitem.get, newOrders.get, sig)
        true
      case Some(sig) if landed =>
        Graph.appendG1Increment(s, d, emptyLi, emptyOrd, sig); true
      case _ => false
    }
    // LPA last: its warm pass reads the adjacency, which the coadj
    // append above just brought fresh — the warm rounds consume the
    // served merge-on-read relation, not a cold rebuild. An
    // empty-touched warm pass is the memo's re-stamp (states pass
    // through the override untouched).
    val lpa = lpaSig match {
      case Some(sig) if newLineitem.nonEmpty =>
        Graph.warmLpaAfterAppend(s, d, newLineitem.get, sig); true
      case Some(sig) if landed =>
        Graph.warmLpaAfterAppend(s, d, emptyLi, sig); true
      case _ => false
    }
    // ANN index: path-scoped like the document indexes (signs
    // embeddings.parquet alone), so only an embeddings delta touches
    // it. The append REFUSES across a hash-family ladder step
    // (appended rows would be invisible to live-count probes) — the
    // nightly's policy is to PAY THE REBUILD right there: a ladder
    // step happens once per corpus doubling, so the amortized bill is
    // one re-persist per doubling, and the alternative (propagating
    // the refusal) strands the index stale until someone notices.
    val ann = (newEmbeddings, annSig) match {
      case (Some(vecs), Some(sig)) =>
        try Similarity.appendAnnIndex(s, d, vecs, sig)
        catch {
          case _: IllegalStateException => Similarity.persistAnnIndex(s, d)
        }
        true
      case _ => false
    }
    // warehouse states (r14 verdict #6): the agg/quantile states sign
    // orders.parquet and the distinct state events.parquet (path-scoped
    // like the document indexes — untouched AND fresh when their source
    // didn't move); the join view signs the tier, so it appends on an
    // orders delta and empty-restamps on any other landing
    val whOrders = (newOrders, aggSig) match {
      case (Some(ord), Some(sig)) =>
        Warehouse.appendOrdersState(s, d, ord, sig); true
      case _ => false
    }
    val whEvents = (newEvents, hllSig) match {
      case (Some(ev), Some(sig)) =>
        Warehouse.appendEventsState(s, d, ev, sig); true
      case _ => false
    }
    val whJoin = jvSig match {
      case Some(sig) if newOrders.nonEmpty =>
        Warehouse.appendJoinView(s, d, newOrders.get, sig); true
      case Some(sig) if landed =>
        Warehouse.appendJoinView(s, d, emptyOrd, sig); true
      case _ => false
    }
    // stream side stores: the nightly window is between micro-batches
    // by definition, so the compaction contract holds here. The report
    // key appears only when stores were named — its value is "a
    // compaction RAN", which is legitimately false while the partition
    // debt sits under the threshold (unlike the always-true artifact
    // legs above).
    val spanStoresEntry =
      if (spanScreenStores.isEmpty) Map.empty[String, Boolean]
      else Map("span_screen_stores" -> spanScreenStores.map(p =>
        graft.streaming.Streams.maintainSpanScreenStore(s, p))
        .exists(identity))
    NightlyReport(Map("band" -> band, "fingerprints" -> fp, "ngo" -> ngo,
      "dsir" -> dsir, "mm" -> mm,
      "bpe" -> bpe, "bpe_stream" -> bpeStream,
      "coadj" -> adj, "g1_edges" -> g1, "lpa" -> lpa,
      "ann" -> ann, "wh_orders" -> whOrders, "wh_events" -> whEvents,
      "wh_join" -> whJoin) ++ spanStoresEntry)
  }
}
