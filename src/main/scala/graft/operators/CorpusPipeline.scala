package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.{TextFunctions => TF}

/** The curated outputs: `documents` is the cleaned/annotated/split corpus,
  * `packManifest` the context-window map over its train split. */
final case class CuratedCorpus(documents: DataFrame, packManifest: DataFrame)

/** End-to-end training-data curation: the engine's LLM-pipeline operators
  * composed into the standard corpus flow —
  *
  *   redact PII → score (tokens, repetition, language, quality) →
  *   filter (empty / boilerplate) → exact dedup (min-id keeper) →
  *   deterministic split assignment → packing manifest of the train split.
  *
  * Everything before the dedup is a single narrow codegen'd pass over the
  * text; dedup is one hash shuffle on the content digest; the split is
  * seed-free arithmetic; the manifest is the Packing distributed prefix
  * sum. No UDFs, no driver-side loops — the whole flow is the same plan
  * at 500 documents and at 100 TB.
  */
object CorpusPipeline {

  /** Curate a raw corpus (columns: doc_id, text; extra columns ride
    * along). `minTokens` drops empty/trivial docs, `maxDupNgramRatio`
    * drops boilerplate (duplicate word-3-gram fraction above the cut).
    *
    * `gopherRules = true` adds the Gopher-rules keep verdict
    * (`TextFunctions.gopherQuality`) to the narrow scoring pass — the
    * published prose heuristics, off by default because they assume
    * prose-length documents (minimum 50 words).
    *
    * `maxDupSpanFraction = Some(f)` drops documents whose duplicated-span
    * coverage (`Dedup.dupSpanStats`, the Lee et al. exact-substring
    * signal) exceeds `f` — one extra count shuffle on the window
    * fingerprints, before the exact dedup so boilerplate-heavy docs never
    * reach the digest shuffle.
    *
    * `nearDupMaxHamming = Some(h)` adds a near-duplicate pass after the
    * exact dedup: SimHash-blocked candidate pairs within `h` bits →
    * connected components → each cluster keeps its min-id doc. The same
    * bounded-candidate shapes as the standalone operators (16-bit-or-wider
    * exact block keys, id-only shuffles), so the stage scales with the
    * corpus, not with pairs².
    *
    * `sourceCap = Some((col, n))` caps every value of `col` (domain,
    * source) at n docs after dedup — `Sampling.capPerGroup`'s
    * deterministic md5-order keep-set, only over-cap groups shuffled.
    * `tokenBudgets = Some((col, budgets, default))` then trims each
    * source to its token budget (`Sampling.tokenBudget`) — the mixture
    * knob. Both run AFTER dedup (a duplicate shouldn't spend budget) and
    * BEFORE the split (a capped doc shouldn't occupy a split slot); the
    * rank/cum provenance columns are dropped to keep the curated schema
    * stable.
    *
    * `blockedHosts = Some(hostsDf)` drops documents whose `url` host
    * falls under a blocked registrable domain (`UrlFilter
    * .dropBlockedHosts`) BEFORE any content work — the cheapest cut
    * runs first, the CCNet/RefinedWeb ordering. Requires a `url` column
    * (the jsonlDocument/WET-ingest shape has one). The streaming face
    * gets this for free: the streaming sinks commit through
    * foreachBatch, where each microbatch is a batch frame.
    *
    * `dropLinesMinDocFreq = Some(n)` removes corpus-frequent lines
    * (`Dedup.dropFrequentLines`) after the blocklist but before
    * scoring — CCNet's ordering, so boilerplate never inflates quality
    * scores or token counts, and the exact dedup downstream sees the
    * cleaned text (two boilerplate-only variants of one page dedup). */
  def curate(raw: DataFrame, ctxTokens: Long = 2048,
      minTokens: Long = 1, maxDupNgramRatio: Double = 0.9,
      nearDupMaxHamming: Option[Int] = None,
      gopherRules: Boolean = false,
      maxDupSpanFraction: Option[Double] = None,
      sourceCap: Option[(String, Int)] = None,
      tokenBudgets: Option[(String, Map[String, Long], Long)] = None,
      blockedHosts: Option[DataFrame] = None,
      dropLinesMinDocFreq: Option[Long] = None,
      navLineRules: Boolean = false): CuratedCorpus = {
    val unblocked = blockedHosts.fold(raw)(b =>
      UrlFilter.dropBlockedHosts(raw, "url", b))
    val lineClean = dropLinesMinDocFreq.fold(unblocked) { n =>
      // dropFrequentLines returns only (doc_id, text) — rejoin to keep
      // the ingest columns (url/lang/...) flowing to the score stage
      val cleaned = Dedup.dropFrequentLines(unblocked, "doc_id", "text", n)
      unblocked.drop("text").join(cleaned, Seq("doc_id"))
    }
    // navLineRules: the per-page RefinedWeb line battery
    // (TF.dropNavLines) after the corpus-frequency pass — same
    // ordering rationale: boilerplate never inflates quality scores,
    // and the exact dedup sees cleaned text. A narrow codegen'd map,
    // no extra pass.
    val navClean =
      if (navLineRules)
        lineClean.withColumn("text", TF.dropNavLines(col("text")))
      else lineClean
    val scored = scoreAndFilter(navClean, minTokens, maxDupNgramRatio, gopherRules)
    val kept = maxDupSpanFraction.fold(scored) { f =>
      val heavy = Dedup.dupSpanStats(scored, "doc_id", "text")
        .filter(col("dup_fraction") > f)
        .select("doc_id")
      scored.join(heavy, Seq("doc_id"), "left_anti")
    }
    val deduped = Dedup.exactDedup(kept, "doc_id", "text")
    val nearDeduped = nearDupMaxHamming.fold(deduped) { h =>
      val pairs = Dedup.simhashNearDupPairs(deduped, "doc_id", "text", h)
      val keepers = Dedup.connectedComponents(
          pairs, deduped.select("doc_id"), idCol = "doc_id")
        .filter(col("id") === col("component"))
        .select(col("id").as("doc_id"))
      deduped.join(keepers, Seq("doc_id"), "left_semi")
    }
    val capped = sourceCap.fold(nearDeduped) { case (c, n) =>
      Sampling.capPerGroup(nearDeduped, c, "doc_id", n).drop("cap_rank")
    }
    val budgeted = tokenBudgets.fold(capped) { case (c, budgets, default) =>
      Sampling.tokenBudget(capped, c, "doc_id", "n_tokens", budgets, default)
        .drop("cum_tokens")
    }
    val split = Sampling.assignSplit(budgeted, "doc_id")
    val manifest = Packing.packManifest(
      split.filter(col("split") === "train").select("doc_id", "n_tokens"),
      ctxTokens)
    CuratedCorpus(split, manifest)
  }

  /** The curate CAPSTONE — raw archive to training-ready survivors as
    * ONE composed flow, every stage an operator the engine already
    * ships:
    *
    *   readWarc → charset detect/decode ([[graft.io.Warc
    *   .toDocumentsDetected]] — both text faces in ONE archive scan)
    *   → quality floor ([[scoreAndFilter]]: PII redaction, token
    *   count, duplicate-3-gram boilerplate cut) → near-dup dedup
    *   (MinHash LSH candidates + exact shingle-hash Jaccard verify)
    *   → benchmark decontamination ([[Decontaminate
    *   .flagNearContaminated]]).
    *
    * The DEDUP KEEPER is the greedy pairwise rule the streaming sink's
    * intra-batch dedup uses ([[indexedCommit]]): a document drops iff
    * it near-duplicates one with a lexicographically SMALLER URL — the
    * only stable identity an archive carries. Deterministic, total,
    * and replayable by an independent engine (no iterative component
    * resolution in the oracle's way); like the greedy min-keeper it
    * can over-drop a chain's tail (A~B~C with A≁C drops both B and C),
    * the documented trade there.
    *
    * Scale shape — the reason this is one operator and not a script of
    * four: the archive is scanned ONCE — the post-floor document frame
    * PERSISTS (text-scale, far below archive-scale), so the dedup
    * machinery's several consumers (signature table, pair sides, the
    * decontamination verify, the survivor output) read the cache
    * instead of re-walking 100 TB of WARC per reference; dedup is the
    * bounded-candidate LSH shape (banded buckets, id-only pair
    * shuffles, exact verify on the rare candidates); the benchmark
    * side of decontamination broadcasts (eval-scale by contract).
    * The cache releases with the session (the one-shot flow's
    * lifetime) or the caller's `clearCache`.
    * Feed the survivors to [[graft.operators.BpeTokenizer]] +
    * [[graft.operators.TokenShards.writeTokenShards]] for the binary
    * training artifact (the `curate-e2e` CLI verb does exactly that).
    *
    * Output: the surviving documents with their provenance columns —
    * (doc_id, url, charset, charset_margin, lang, text, n_tokens,
    * dup_ngram_ratio, lang_pred). */
  def curateArchive(records: org.apache.spark.sql.Dataset[graft.io.Warc.WarcRecord],
      bench: Option[DataFrame] = None,
      minTokens: Long = 1, maxDupNgramRatio: Double = 0.9,
      minJaccard: Double = 0.8): DataFrame = {
    val scored = scoreAndFilter(graft.io.Warc.toDocumentsDetected(records),
        minTokens, maxDupNgramRatio)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE signature pass over the curated corpus (tokenize → shingle →
    // minhash — the flow's heaviest per-row kernels), shared by the
    // near-dup dedup AND the decontamination probe; before r16 the
    // decontamination side re-ran all three kernels over the survivors
    // (guide §1.2: remove redundant passes before tuning anything else).
    // Persisted for the span of the two eager id-set jobs below, then
    // RELEASED — the returned plan never reads it (guide §5: caches get
    // an owner and an unpersist point; the r16 shape leaked this, the
    // flow's widest frame, one copy per call).
    val sigs = Dedup.minhashSignatureTable(scored, "url", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // loser ids are read twice (the corpus anti-join and the
    // survivor-signature anti-join) — uncomputed, each consumer would
    // re-run the whole LSH pair pipeline (measured 4× the flow's cost
    // at sf0.1). Eager localCheckpoint instead of persist: the id-scale
    // result pins as blocks with TRUNCATED lineage, so `sigs` can be
    // released before return instead of leaking for the session.
    val losers = Dedup.minhashNearDupPairs(scored, "url", "text",
        minJaccard = minJaccard, sigs = Some(sigs))
      .select(col("id_b").as("url")).distinct()
      .localCheckpoint(true)
    val deduped = scored.join(losers, Seq("url"), "left_anti")
    val out = bench.fold(deduped) { b =>
      // the survivors' signatures, re-keyed to the docs' id column
      // (doc_id = xxhash64(url) — toDocumentsDetected's derivation)
      val survivorSigs = sigs
        .join(losers.select(col("url").as("doc_id")), Seq("doc_id"),
          "left_anti")
        .select(xxhash64(col("doc_id")).as("doc_id"), col("hs"), col("sig"))
      // contamination is rare by contract (the Decontaminate scaladoc) —
      // the flagged id set is tiny; computing it eagerly here is what
      // lets `sigs` release deterministically below
      val flagged = Decontaminate.nearContaminatedIds(deduped, b,
          minJaccard = minJaccard, docSigs = Some(survivorSigs))
        .localCheckpoint(true)
      deduped.join(broadcast(flagged), Seq("doc_id"), "left_anti")
    }
    sigs.unpersist(false)
    out
  }

  /** The stateless front of the flow — redact, score, filter — one narrow
    * codegen'd pass, shared verbatim by batch `curate` and the streaming
    * face below (same plan, same columns, same cuts). With `gopherRules`
    * the Gopher keep verdict joins the same pass and its rejects are
    * filtered here. */
  def scoreAndFilter(raw: DataFrame,
      minTokens: Long = 1, maxDupNgramRatio: Double = 0.9,
      gopherRules: Boolean = false): DataFrame = {
    val redacted = raw.withColumn("text", TF.redactPii(col("text")))
    // token/gram arrays staged once — every downstream score reads the
    // materialized column (lambda-bearing expressions defeat Catalyst
    // subexpression elimination)
    val scored = redacted
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("grams", TF.ngramsAll(col("toks"), 3))
    // every score packs into ONE generated struct behind a
    // single-element explode. The Generate is the pushdown fence:
    // PushPredicateThroughNonJoin SUBSTITUTES staged aliases into any
    // deterministic predicate it pushes below a Project — the quality
    // cut was re-evaluating the tokenize/ngram kernels 3-4x PER ROW
    // (Catalyst cannot subexpression-eliminate lambda-bearing
    // expressions; measured 10.7 s → ~2 s at sf0.1) — but a filter
    // referencing a generator's OUTPUT cannot cross the Generate, so
    // every kernel runs exactly once and the filter reads fields. The
    // explode of a one-element array is a codegen'd row-wise no-op;
    // deterministic, streaming-safe.
    val qExpr = struct(
      size(col("toks")).cast(LongType).as("n_tokens"),
      (lit(1.0) -
        size(array_distinct(col("grams"))).cast(DoubleType) /
          size(col("grams")).cast(DoubleType)).as("dup_ngram_ratio"),
      TF.langIdFromTokens(col("toks")).as("lang_pred"),
      (if (gopherRules)
        TF.gopherQualityFromTokens(col("toks")).getField("keep")
      else lit(true)).as("keep_gopher"))
    scored.select(col("*"), explode(array(qExpr)).as("__q"))
      .filter(col("__q.n_tokens") >= minTokens &&
        col("__q.dup_ngram_ratio") <= maxDupNgramRatio &&
        col("__q.keep_gopher"))
      .withColumn("n_tokens", col("__q.n_tokens"))
      .withColumn("dup_ngram_ratio", col("__q.dup_ngram_ratio"))
      .withColumn("lang_pred", col("__q.lang_pred"))
      .drop("toks", "grams", "__q")
  }

  /** Incremental-ingest face: the same redact → score → filter pass over a
    * STREAM of documents, then SimHash-sketch ingest dedup within the
    * watermark horizon (8 B state per surviving sketch). Returns a
    * streaming frame ready for `writeStream` (parquet append, or the
    * exactly-once TSV sink). Corpus-WIDE stages stay batch jobs over the
    * accumulated output on purpose: global near-dup clustering, split
    * assignment, and packing all need the whole corpus (a pack manifest's
    * prefix sum over a partial stream would renumber on every batch), so
    * the streaming face curates what a stream CAN — per-doc transforms and
    * horizon-bounded dedup — and the batch `curate` sweeps the rest.
    *
    * Pair with `Sinks.writeParquetStreamMaintained` for the full
    * maintenance loop: append each curated microbatch, keep the sink
    * directory's file count bounded by threshold-triggered in-place
    * compaction, and refresh the catalog entry every batch. */
  def curateStream(raw: DataFrame, tsCol: String, watermark: String = "1 hour",
      minTokens: Long = 1, maxDupNgramRatio: Double = 0.9): DataFrame =
    graft.streaming.StreamingOps.nearDupDedupWithinWatermark(
      scoreAndFilter(raw, minTokens, maxDupNgramRatio),
      "text", tsCol, watermark)

  /** Continuous-ingest sink with CROSS-BATCH near-dup dedup: each
    * microbatch of an already-curated stream (e.g. [[curateStream]]'s
    * output — its watermark dedup handles WITHIN-horizon twins, this
    * handles everything older) is flagged against the corpus's
    * accumulated MinHash signature table, only the genuinely-new docs are
    * appended, and THEIR signatures join the table for the next batch —
    * so no batch ever re-tokenizes the accumulated corpus (the signature
    * table itself is text-order-sized: its shingle-hash arrays feed the
    * exact verify — see minhashSignatureTable's storage note). Twins
    * WITHIN one microbatch are deduped first (greedy min-keeper — see
    * indexedCommit), so the first batch (no table yet) is also internally
    * deduped rather than passing wholesale.
    *
    * The PROBE is index-shaped: a (doc_id, band, bucket) bucket table
    * ([[Dedup.minhashBucketTable]]) is maintained at `sigDir + ".buckets"`
    * and each batch joins its own buckets against the PRE-BUILT index
    * instead of re-exploding the whole signature table — per-batch cost
    * is O(batch + matching buckets + one signature-table verify probe),
    * not O(corpus bands). A signature table that predates the index (or
    * lost it) is backfilled once, inside the commit, before the probe.
    *
    * Atomicity — the MANIFEST-LAST commit (`Sinks.stageBatch` /
    * `publishStagedBatch`): every batch stages its corpus rows,
    * bucket rows, and signatures INVISIBLY (dot-prefixed staging dirs
    * no reader lists), then flips ONE marker (the corpus dir's batch
    * marker — the commit manifest for all three dirs), then publishes
    * the stagings. A reader therefore sees a batch in all three dirs
    * or in none — there is no docs-present-but-unindexed state in
    * which later twins of committed docs could slip past the probe. A
    * crash BEFORE the flip leaves nothing visible; the replay
    * recomputes the identical kept-set (a pure function of the batch
    * and the unchanged standing table) and restages over its own
    * leftovers. A crash AFTER the flip rolls forward: every commit
    * begins by publishing any staged batch at or below the marker,
    * BEFORE the probe reads the signature table — so admission never
    * runs against a table missing committed rows, and a replayed id
    * publishes-and-returns without re-appending. Single-writer
    * contract. Every batch's caches (batch signatures, the fresh
    * survivors) are unpersisted at the end of the commit — a
    * long-running query holds no growing cache.
    *
    * (k, bands, shingleN, minJaccard) are pinned per corpus — changing
    * them invalidates the accumulated table AND index (see
    * minhashDedupAgainst). */
  def writeStreamIncrementalDedup(curated: DataFrame, corpusDir: String,
      sigDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 64, bands: Int = 16, shingleN: Int = 3,
      minJaccard: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery = {
    // the same self-healing commit as [[writeStreamIndexed]], minus the
    // BM25 index (indexDir = None): per-dir markers, fixed append order,
    // signatures last — see indexedCommit's scaladoc for the replay proof
    val commit = (batch: DataFrame, batchId: Long) =>
      indexedCommit(batch, batchId, corpusDir, sigDir, indexDir = None,
        idCol, textCol, k, bands, shingleN, minJaccard, maxIndexFiles = 64)
    curated.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch(commit)
      .start()
  }

  /** [[writeStreamIncrementalDedup]]'s indexed sibling: one sink maintains
    * the corpus, the MinHash signature table + band-bucket index, AND a
    * standing BM25 inverted index ([[Search.bm25IndexAppendIdempotent]]),
    * so the curated corpus is keyword-searchable the moment a batch
    * commits — no separate indexing job trailing the ingest.
    *
    * Crash safety: the corpus/bucket/signature trio commits through
    * the MANIFEST-LAST protocol (stage all three → flip the corpus
    * marker → publish; see [[writeStreamIncrementalDedup]] for the
    * replay proof — all-or-nothing visibility, pre-flip crashes
    * recompute, post-flip crashes roll forward at the next entry).
    * The BM25 append rides its own marker BEFORE the flip: a pre-flip
    * crash replays to the identical kept-set (the signature table is
    * unchanged until the flip) and the index marker skips the
    * completed append — never a double-count, which
    * CorpusPipelineSpec drives (mid-sequence crash + replay
    * converges). The BM25 index's own residual append-to-marker
    * window is documented at its maintenance contract (Search.scala).
    * Single-writer contract.
    *
    * The BM25 index is threshold-compacted in the commit
    * ([[Search.bm25IndexMaintain]], `maxIndexFiles`) so a long-running
    * ingest keeps bounded file counts. Parameter pinning as in
    * [[writeStreamIncrementalDedup]]. */
  def writeStreamIndexed(curated: DataFrame, corpusDir: String,
      sigDir: String, indexDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 64, bands: Int = 16, shingleN: Int = 3,
      minJaccard: Double = 0.8,
      maxIndexFiles: Int = 64): org.apache.spark.sql.streaming.StreamingQuery = {
    val commit = (batch: DataFrame, batchId: Long) =>
      indexedCommit(batch, batchId, corpusDir, sigDir, Some(indexDir),
        idCol, textCol, k, bands, shingleN, minJaccard, maxIndexFiles)
    curated.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch(commit)
      .start()
  }

  /** One sink commit — shared by [[writeStreamIncrementalDedup]]
    * (indexDir = None) and [[writeStreamIndexed]]; package-visible so the
    * spec can drive replay and mid-sequence-crash scenarios directly. */
  private[graft] def indexedCommit(batch: DataFrame, batchId: Long,
      corpusDir: String, sigDir: String, indexDir: Option[String],
      idCol: String, textCol: String,
      k: Int, bands: Int, shingleN: Int, minJaccard: Double,
      maxIndexFiles: Int): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val spark = batch.sparkSession
    val bucketDir = sigDir + ".buckets"
    val dirs = Seq(corpusDir, bucketDir, sigDir)
    // MANIFEST-LAST entry: publish any committed-but-unpublished
    // staging first (a crash between the marker flip and publication),
    // BEFORE anything reads the signature table — admission never runs
    // against a table missing committed rows
    val committed = graft.io.Sinks.lastCommittedBatch(spark, corpusDir)
    dirs.foreach { d =>
      graft.io.Sinks.stagedBatches(spark, d).filter(_ <= committed)
        .foreach(b => graft.io.Sinks.publishStagedBatch(spark, d, b))
    }
    if (batchId <= committed) {
      dirs.foreach(spark.catalog.refreshByPath)
      return // replayed id: the batch is committed; roll-forward above
    }
    val fs = new HPath(sigDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasParquet(dir: String): Boolean = {
      val p = new HPath(dir)
      fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    }
    val hasTable = hasParquet(sigDir)
    val batchSigs = Dedup
      .minhashSignatureTable(batch, idCol, textCol, k, shingleN)
      .persist()
    // INTRA-batch twins first: the corpus probe only sees the STANDING
    // table, so near-identical docs arriving in the SAME microbatch would
    // all pass it (and the first batch ever passed wholesale). Greedy
    // min-keeper inside the batch — drop a doc iff it near-dups a
    // smaller-id batch doc, the same rule as the probe's min(ref_id).
    // Chains (A~B~C, A≁C) drop C though its witness B was itself dropped —
    // the over-dropping a CC keeper also applies. Pure function of the
    // batch, so a crash replay recomputes the identical kept-set;
    // batch-sized work under the microbatch contract.
    val intraLosers = Dedup.minhashNearDupPairs(batch, idCol, textCol,
        k, bands, shingleN, minJaccard, sigs = Some(batchSigs))
      .select(col("id_b").as(idCol)).distinct()
    val batchKept = batch.join(intraLosers, Seq(idCol), "left_anti")
    val fresh =
      if (!hasTable) batchKept
      else {
        if (!hasParquet(bucketDir)) // pre-index table: backfill once
          Dedup.minhashBucketTable(spark.read.parquet(sigDir), k, bands)
            .write.mode("overwrite").parquet(bucketDir)
        else {
          // same partial-divergence repair as writeStreamIncrementalDedup
          val unindexed = spark.read.parquet(sigDir)
            .join(spark.read.parquet(bucketDir).select("doc_id").distinct(),
              Seq("doc_id"), "left_anti")
          if (!unindexed.isEmpty) {
            Dedup.minhashBucketTable(unindexed, k, bands)
              .write.mode("append").parquet(bucketDir)
            spark.catalog.refreshByPath(bucketDir)
          }
        }
        // batchSigs is a superset of batchKept's signatures (it still
        // carries the intra-batch losers) — harmless: extra candidates,
        // and the output joins back to batchKept's rows only
        Dedup.minhashDedupAgainst(batchKept, spark.read.parquet(sigDir),
            idCol, textCol, k, bands, shingleN, minJaccard,
            batchSigs = Some(batchSigs),
            refBuckets = Some(spark.read.parquet(bucketDir)))
          .filter(col("is_new")).drop("dup_of_ref", "is_new")
      }
    val freshP = fresh.persist()
    val freshSigs = batchSigs.join(
      freshP.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")
      .persist()
    // stage all three dirs INVISIBLY (every standing-table read above
    // happened against the pre-batch state), then the BM25 append under
    // its own marker, then flip the ONE manifest marker, then publish —
    // a reader sees the batch in all three dirs or in none, and a crash
    // at any point either recomputes the identical kept-set (pre-flip:
    // nothing visible) or rolls forward at the next entry (post-flip)
    graft.io.Sinks.stageBatch(freshP, corpusDir, batchId)
    graft.io.Sinks.stageBatch(
      Dedup.minhashBucketTable(freshSigs, k, bands), bucketDir, batchId)
    graft.io.Sinks.stageBatch(freshSigs, sigDir, batchId)
    indexDir.foreach { idx =>
      if (graft.operators.Search.bm25IndexAppendIdempotent(
          freshP, idx, batchId, idCol, textCol))
        graft.operators.Search.bm25IndexMaintain(spark, idx, maxIndexFiles)
    }
    graft.io.Sinks.recordCommittedBatch(spark, corpusDir, batchId) // commit
    dirs.foreach(d => graft.io.Sinks.publishStagedBatch(spark, d, batchId))
    freshSigs.unpersist()
    freshP.unpersist()
    batchSigs.unpersist()
    dirs.foreach(spark.catalog.refreshByPath)
    ()
  }

  /** Retract documents from every standing artifact the sinks maintain —
    * the takedown path (the legal reality of crawl corpora). Deleted ids
    * are registered in a sibling dir `<corpusDir>.deletes` (never inside
    * the corpus — readers see only corpus rows), then the corpus, the
    * signature table, and the band-bucket index are physically rewritten
    * WITHOUT them, and the BM25 index (when the stream runs indexed)
    * retracts through [[Search.bm25IndexDelete]]'s registry + negative
    * increments.
    *
    * The signature/bucket rewrite is what makes retraction COMPLETE
    * rather than cosmetic: a deleted doc's signatures would otherwise
    * keep matching — suppressing every future near-twin of content that
    * no longer exists, forever (CorpusPipelineSpec proves a post-delete
    * twin survives ingestion). Physical rewrite over tombstone-masking
    * is deliberate here: the dedup probe joins these tables inside every
    * microbatch commit, and a mask would tax the ingest hot path on
    * every batch to spare a rare maintenance verb.
    *
    * Idempotent by construction: every rewrite filters against the FULL
    * registry, so a replayed call (or one resumed after a crash between
    * rewrites) repairs any partially-applied state and converges to the
    * same tables; re-registered ids are skipped, so the BM25 decrements
    * never double-apply. Cost is one rewrite of each table per call —
    * batch takedowns accordingly (the registry append is cheap; the
    * rewrites amortize over any number of ids). Single-writer contract
    * shared with compaction: do not run concurrently with the stream's
    * own commits. Returns the number of NEWLY registered ids. */
  def deleteDocs(spark: SparkSession, ids: DataFrame, corpusDir: String,
      sigDir: String, indexDir: Option[String] = None,
      idCol: String = "doc_id"): Long = {
    require(graft.io.Sinks.parquetExists(spark, corpusDir),
      s"no corpus at $corpusDir")
    val delDir = corpusDir + ".deletes"
    val bucketDir = sigDir + ".buckets"
    val incoming = ids.select(col(idCol).as("doc_id")).distinct()
    val fresh = if (graft.io.Sinks.parquetExists(spark, delDir))
      incoming.join(spark.read.parquet(delDir), Seq("doc_id"), "left_anti")
    else incoming
    val n = fresh.persist().count()
    if (n > 0) {
      fresh.write.mode("append").parquet(delDir)
      spark.catalog.refreshByPath(delDir)
    }
    fresh.unpersist()
    def registry = broadcast(spark.read.parquet(delDir))
    if (graft.io.Sinks.parquetExists(spark, delDir)) {
      graft.io.Sinks.rewriteParquetInPlace(spark, corpusDir)(df =>
        df.join(registry.select(col("doc_id").as(idCol)), Seq(idCol), "left_anti"))
      if (graft.io.Sinks.parquetExists(spark, sigDir))
        graft.io.Sinks.rewriteParquetInPlace(spark, sigDir)(df =>
          df.join(registry, Seq("doc_id"), "left_anti"))
      if (graft.io.Sinks.parquetExists(spark, bucketDir))
        graft.io.Sinks.rewriteParquetInPlace(spark, bucketDir)(df =>
          df.join(registry, Seq("doc_id"), "left_anti"))
      indexDir.foreach(idx =>
        graft.operators.Search.bm25IndexDelete(spark, idx, incoming, "doc_id"))
    }
    n
  }

  // ---- streaming MEDIA dedup (perceptual hashes) -------------------------

  /** Kinds the perceptual tier can hash. Everything else passes through
    * the media sink UNDEDUPED (a payload without a pixel/waveform
    * decoder cannot be perceptually compared; silently hashing its raw
    * bytes would pair nothing and imply it was deduped). `audio/mpeg`
    * is hashable PER PAYLOAD: MPEG-1 Layer I decodes to samples and
    * fingerprints like WAV/FLAC; Layer II/III — whose sample decode the
    * clean-room build refuses (see [[graft.operators.Mpeg]]) — take the
    * unhashable pass-through, decided by a header walk, never by an
    * executor exception. */
  private val hashableKinds = Set(
    "image/ppm", "image/png", "image/jpeg", "image/gif",
    "image/bmp", "image/x-ms-bmp", "image/tiff",
    "image/x-icon", "image/vnd.microsoft.icon",
    "audio/wav", "audio/flac", "audio/x-flac",
    "audio/aiff", "audio/x-aiff",
    "audio/mpeg", "audio/mp3", "audio/mpeg3", "audio/x-mpeg-3",
    "video/mp4", "audio/mp4", "audio/x-m4a",
    "audio/ogg", "application/ogg", "audio/opus", "audio/vorbis",
    "video/webm", "audio/webm", "video/x-matroska", "audio/x-matroska")

  /** Perceptual + identity signatures of a media batch: (`doc_id`,
    * `modality`, `simhash`) — images through
    * [[Multimodal.perceptualHash64]], audio through
    * [[Multimodal.audioHash64]]. Only [[hashableKinds]] emit rows;
    * malformed payloads of hashable kinds fail loudly (the codec
    * contract), EXCEPT audio/mpeg where an unwalkable stream means
    * framing damage — the documented metadata-only tier — and the
    * payload falls back to pass-through.
    *
    * `audio/mpeg` emits up to TWO rows from ONE frame walk
    * ([[graft.operators.Mpeg.walkFrames]]):
    *  - `audio_stream` at EVERY layer: the tag-invariant
    *    [[graft.operators.Mpeg.streamHash64]] over the ID3-stripped
    *    coded stream — a re-tagged MP3 (different ID3, identical
    *    audio) is an exact dup even where sample decode is refused
    *    (Layer II/III), closing the no-fingerprint gap for the
    *    dominant crawl audio format. A content hash avalanches, so at
    *    the shared Hamming radius only equal hashes ever pair —
    *    exact-dup semantics by construction.
    *  - `audio` for MPEG-1 Layer I: the decoded spectrogram
    *    fingerprint ([[Multimodal.audioHash64With]], fed by the SAME
    *    walk; a stream that walks clean but carries a corrupt Layer-I
    *    payload still fails loudly there).
    *
    * MP4 containers (`video/mp4`, m4a audio) emit the `mp4_stream`
    * identity — [[graft.operators.Mp4.contentHash64]] over the mdat
    * payload ranges, so an edited-metadata copy of the same video is
    * an exact dup; same avalanche-only-pairs-equal property as the
    * audio stream hash. */
  private def mediaSigs(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col("media_id"), col("kind"), col("bytes"))
      .as[Multimodal.Media]
      .mapPartitions(_.flatMap { m =>
        if (!hashableKinds.contains(m.kind)) Nil
        else if (m.kind.startsWith("image/"))
          Seq((m.media_id, "image", Multimodal.perceptualHash64(m)))
        else if (m.kind == "audio/wav" || m.kind.contains("flac") ||
            m.kind == "audio/aiff" || m.kind == "audio/x-aiff")
          Seq((m.media_id, "audio", Multimodal.audioHash64(m)))
        else if (m.kind == "video/mp4" || m.kind == "audio/mp4" ||
            m.kind == "audio/x-m4a") {
          // MP4: metadata-invariant mdat content hash ([[Mp4
          // .contentHash64]]) — an edited-metadata copy is an exact dup;
          // malformed containers take the metadata-tier pass-through,
          // the audio/mpeg framing-damage contract
          (try Some(graft.operators.Mp4.contentHash64(m.bytes, m.media_id))
          catch { case _: IllegalArgumentException => None })
            .map(h => (m.media_id, "mp4_stream", h)).toSeq
        } else if (m.kind == "audio/ogg" || m.kind == "application/ogg" ||
            m.kind == "audio/opus" || m.kind == "audio/vorbis") {
          // Ogg: tag- AND page-layout-invariant audio-packet hash
          // ([[graft.operators.Ogg.streamHash64]]) — a re-tagged or
          // re-muxed copy of the same coded audio is an exact dup;
          // framing damage takes the metadata-tier pass-through
          (try Some(graft.operators.Ogg.streamHash64(m.bytes, m.media_id))
          catch { case _: IllegalArgumentException => None })
            .map(h => (m.media_id, "ogg_stream", h)).toSeq
        } else if (m.kind == "video/webm" || m.kind == "audio/webm" ||
            m.kind == "video/x-matroska" || m.kind == "audio/x-matroska") {
          // Matroska/WebM: metadata-invariant Cluster content hash
          // ([[graft.operators.Mkv.contentHash64]]) — a retitled or
          // retagged copy of the same media is an exact dup; framing
          // damage takes the metadata-tier pass-through
          (try Some(graft.operators.Mkv.contentHash64(m.bytes, m.media_id))
          catch { case _: IllegalArgumentException => None })
            .map(h => (m.media_id, "mkv_stream", h)).toSeq
        } else {
          val walked = // framing damage: metadata tier, pass through
            try Some(graft.operators.Mpeg.walkFrames(m.bytes, m.media_id))
            catch { case _: IllegalArgumentException => None }
          walked.toSeq.flatMap { fs =>
            val stream = (m.media_id, "audio_stream",
              graft.operators.Mpeg.streamHash64Of(m.bytes, fs))
            if (fs.head.layer == 1 && fs.head.version == 1)
              Seq(stream, (m.media_id, "audio", Multimodal.audioHash64With(
                m, graft.operators.Mpeg.infoOf(m.bytes, fs))))
            else Seq(stream)
          }
        }
      })
      .toDF("doc_id", "modality", "simhash")
  }

  /** Streaming media ingest with standing perceptual dedup — the media
    * face of [[writeStreamIncrementalDedup]]: each microbatch of
    * (`media_id`, `kind`, `bytes`) rows is hashed (DCT pHash for
    * images, spectrogram fingerprint for audio — so a re-encoded,
    * re-levelled, or resized copy of already-kept media is a DUP, not a
    * new row), deduped within the batch and against the STANDING
    * signature table at Hamming radius `maxHamming`, and the survivors
    * committed atomically through the same MANIFEST-LAST protocol as
    * the text sink (stage corpus rows, the chunk bucket index —
    * [[Dedup.hash64BucketTable]], partitioned by modality so probes
    * prune — and signatures invisibly; flip the corpus marker;
    * publish): a reader sees a batch everywhere or nowhere, pre-flip
    * crashes replay to the identical kept-set (a pure function of
    * (batch, signature table)), post-flip crashes roll forward.
    * Modalities never cross-match: probing and pairing run per
    * modality.
    *
    * Unhashable kinds pass through to the corpus undeduped (see
    * [[hashableKinds]]). Single-writer contract. */
  def writeStreamMediaDedup(media: DataFrame, corpusDir: String,
      sigDir: String, checkpointDir: String, maxHamming: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        mediaCommit(batch, batchId, corpusDir, sigDir, maxHamming))
      .start()

  /** One media-sink commit — package-visible so the spec drives replay,
    * divergence-repair, and cross-modality scenarios directly. */
  private[graft] def mediaCommit(batch: DataFrame, batchId: Long,
      corpusDir: String, sigDir: String, maxHamming: Int): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val spark = batch.sparkSession
    val bucketDir = sigDir + ".buckets"
    val dirs = Seq(corpusDir, bucketDir, sigDir)
    // manifest-last entry roll-forward — same protocol as indexedCommit
    val committed = graft.io.Sinks.lastCommittedBatch(spark, corpusDir)
    dirs.foreach { d =>
      graft.io.Sinks.stagedBatches(spark, d).filter(_ <= committed)
        .foreach(b => graft.io.Sinks.publishStagedBatch(spark, d, b))
    }
    if (batchId <= committed) {
      dirs.foreach(spark.catalog.refreshByPath)
      return
    }
    val fs = new HPath(sigDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasParquet(dir: String): Boolean = {
      val p = new HPath(dir)
      fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    }
    val modalities = Seq("image", "audio", "audio_stream", "mp4_stream",
      "ogg_stream", "mkv_stream")
    val sigs = mediaSigs(batch).persist()
    sigs.count() // materialize: exact stats → broadcast probes (see minhashDedupAgainst)
    // intra-batch twins per modality — same min-id-keeper rule as text
    val intraLosers = modalities.map(mod =>
        Dedup.hash64NearDupPairs(sigs.filter(col("modality") === mod),
          maxHamming, maxBlockSize = 1000,
          sizeByVolume = false) // microbatch-sized, decode-bound lineage
          .select(col("id_b").as("doc_id")))
      .reduce(_ union _).distinct()
    val keptSigs = sigs.join(intraLosers, Seq("doc_id"), "left_anti")
    val fresh =
      if (!hasParquet(sigDir)) keptSigs
      else {
        if (!hasParquet(bucketDir)) // pre-index table: backfill once
          bucketRows(spark.read.parquet(sigDir))
            .write.mode("overwrite").parquet(bucketDir)
        else {
          // partial-divergence repair: every commit backfills sig rows
          // the bucket index is missing (the text sink's contract)
          val unindexed = spark.read.parquet(sigDir)
            .join(spark.read.parquet(bucketDir).select("doc_id").distinct(),
              Seq("doc_id"), "left_anti")
          if (!unindexed.isEmpty) {
            bucketRows(unindexed)
              .write.mode("append").parquet(bucketDir)
            spark.catalog.refreshByPath(bucketDir)
          }
        }
        modalities.map { mod =>
          Dedup.hash64DedupAgainst(
              keptSigs.filter(col("modality") === mod)
                .select("doc_id", "simhash"),
              spark.read.parquet(bucketDir)
                .filter(col("modality") === mod)
                .select("chunk", "v", "doc_id", "simhash"),
              maxHamming)
            .filter(col("is_new")).select("doc_id")
        }.reduce(_ union _)
          .join(keptSigs, Seq("doc_id")) // reattach modality + hash
      }
    // EAGER local checkpoint, not persist: the kept-set's plan reads
    // bucketDir (the standing-index probe), and the commit's own bucket
    // append below invalidates any cache keyed on that path — a
    // persisted `fresh` would silently RECOMPUTE at the signature
    // append, probe its own just-appended buckets, classify every fresh
    // row as a dup of itself, and append an empty signature batch
    // (observed exactly so). The checkpoint pins the kept-set before
    // any directory is touched.
    val freshP = fresh.localCheckpoint(true)
    // corpus rows: fresh hashable media + every unhashable pass-through
    val keepIds = freshP.select(col("doc_id").as("media_id"))
      .union(batch.select(col("media_id"))
        .join(sigs.select(col("doc_id").as("media_id")), Seq("media_id"), "left_anti"))
    val corpusRows = batch.join(keepIds, Seq("media_id"), "left_semi")
    // stage → one marker flip → publish (the manifest-last commit; the
    // kept-set was checkpointed before any directory is touched)
    graft.io.Sinks.stageBatch(corpusRows, corpusDir, batchId)
    graft.io.Sinks.stageBatch(bucketRows(freshP), bucketDir, batchId)
    graft.io.Sinks.stageBatch(freshP, sigDir, batchId)
    graft.io.Sinks.recordCommittedBatch(spark, corpusDir, batchId) // commit
    dirs.foreach(d => graft.io.Sinks.publishStagedBatch(spark, d, batchId))
    sigs.unpersist()
    dirs.foreach(spark.catalog.refreshByPath)
    ()
  }

  /** (`chunk`, `v`, `doc_id`, `simhash`, `modality`) bucket rows of a
    * signature frame. */
  private def bucketRows(sigs: DataFrame): DataFrame =
    Dedup.hash64BucketTable(sigs.select("doc_id", "simhash"))
      .join(sigs.select("doc_id", "modality"), Seq("doc_id"))
}
