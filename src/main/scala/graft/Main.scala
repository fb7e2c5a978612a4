package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, length, trim}

import graft.io.{EnsemblRegistry, Retrieve, Sinks, Sources}
import graft.ops.GeneOps

/** CLI entry point mirroring the reference's click CLI
  * (`eggv retrieve|process|annotate|complete`, eggv/cli.py:144-193).
  *
  * Usage:
  *   graft.Main retrieve <url> [url...] <destDir>
  *   graft.Main process  <gvf> <gtf> <outDir>
  *   graft.Main annotate <effectsTsvDir> <genesTsvDir> <outDir>
  *   graft.Main complete [--force] <gvf|url> <gtf|url> <outDir>
  *   graft.Main complete [--force] <hg38|mm10> <outDir>
  *   graft.Main run      <config.properties>
  *
  * `complete` accepts http(s)/file URLs for the feature builds — they are
  * staged via graft.io.Retrieve (the reference's eggv/retrieve.py stage,
  * wired as in eggv/pipeline.py:161-177) into `<outDir>/raw/` and read
  * from there; gzipped builds are read natively, no unzip pass. `run`
  * drives the same pipeline through a config file + Catalog layout.
  */
object Main {

  def session(appName: String, config: GraftConfig = GraftConfig.default): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", config.cores.toString)
    // dedicated env var; falls back to the cpus value (local-mode default:
    // one shuffle partition per core) and only then to the config file
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", config.shufflePartitions.toString))
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Split `--force` (anywhere in a subcommand's argument list) from the
    * positional arguments. */
  private[graft] def parseForce(rest: List[String]): (Boolean, List[String]) =
    (rest.contains("--force"), rest.filterNot(_ == "--force"))

  /** URL arguments are staged to `rawDir` and replaced by the local path;
    * plain paths pass through untouched. */
  private def resolveInput(arg: String, rawDir: String, force: Boolean): String =
    if (Retrieve.isUrl(arg)) Retrieve.retrieve(arg, rawDir, force) else arg

  /** Stage the GVF and GTF inputs concurrently (each into its own raw
    * dir) — downloads are network-bound, so the two builds overlap
    * (reference: one download future per file, eggv/pipeline.py:161-177). */
  private def resolveInputs(gvf: String, gvfRawDir: String,
      gtf: String, gtfRawDir: String, force: Boolean): (String, String) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fv = Future(resolveInput(gvf, gvfRawDir, force))
    val fg = Future(resolveInput(gtf, gtfRawDir, force))
    (Await.result(fv, Duration.Inf), Await.result(fg, Duration.Inf))
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "retrieve" :: rest if rest.length >= 2 =>
      val urls = rest.init
      val dest = rest.last
      Retrieve.retrieveAll(urls, dest).foreach(p => println(s"retrieved: $p"))

    case "process" :: gvf :: gtf :: out :: Nil =>
      val spark = session("graft-process")
      val v = Pipeline.processVariants(spark, gvf)
      Sinks.writeTsv(v.effects, s"$out/variant-effects")
      Sinks.writeTsv(v.metadata, s"$out/variant-metadata")
      v.unpersist()
      val genes = Pipeline.processGenes(spark, gtf)
      Sinks.writeTsv(genes, s"$out/genes")
      Sinks.writeTsv(GeneOps.dedupGenes(genes), s"$out/genes-deduped")
      spark.stop()

    case "annotate" :: effects :: genes :: out :: Nil =>
      val spark = session("graft-annotate")
      val ann = Pipeline.annotate(
        Sources.readProcessedVariants(spark, effects),
        Sources.readProcessedGenes(spark, genes))
      Sinks.writeTsv(ann.intergenic, s"$out/intergenic")
      Sinks.writeTsv(ann.intragenic, s"$out/intragenic")
      spark.stop()

    // `complete` forms (each takes --force anywhere after the verb, the
    // reference's eggv/cli.py:43-77 flag: re-download staged builds):
    //   complete [--force] <gvf|url> <gtf|url> <outDir>
    //   complete [--force] <build> <outDir>     (hg38|mm10 via Ensembl registry)
    case "complete" :: rest if parseForce(rest)._2.length >= 2 =>
      val (force, positional) = parseForce(rest)
      positional match {
        case build :: out :: Nil if EnsemblRegistry.isBuild(build) =>
          // zero-URL convenience: the registry derives the full download
          // set (24 per-chromosome GVFs for hg38); variants stage into
          // their own raw dir so the processing scan can take the DIR as
          // its glob — one read over all chromosome files
          val spark = session(s"graft-complete-$build")
          Retrieve.retrieveAll(
            EnsemblRegistry.variationUrls(build), s"$out/raw/variants", force)
          val gtfLocal = Retrieve.retrieve(
            EnsemblRegistry.geneUrl(build), s"$out/raw/genes", force)
          Pipeline.complete(spark, s"$out/raw/variants", gtfLocal, out)
          spark.stop()
        case gvf :: gtf :: out :: Nil =>
          val spark = session("graft-complete")
          val (gvfLocal, gtfLocal) =
            resolveInputs(gvf, s"$out/raw", gtf, s"$out/raw", force)
          Pipeline.complete(spark, gvfLocal, gtfLocal, out)
          spark.stop()
        case other =>
          System.err.println(s"complete: bad arguments: ${other.mkString(" ")}")
          sys.exit(2)
      }

    // LLM corpus curation over a JSONL corpus (engine extension):
    // redact -> score -> filter -> exact dedup -> split -> pack manifest.
    // Writes parquet: <outDir>/documents (curated + split) and
    // <outDir>/pack-manifest (train-split context-window map).
    case "corpus" :: rest if rest.filterNot(f => f == "--near-dup" ||
        f == "--gopher" || f == "--wet" || f == "--nav-lines" ||
        f.startsWith("--cap=") ||
        f.startsWith("--budget=") || f.startsWith("--block=") ||
        f.startsWith("--drop-lines=")).length == 2 =>
      val nearDup = rest.contains("--near-dup")
      val gopher = rest.contains("--gopher")
      // --wet: the input is a WET segment dir (Common Crawl shape), not
      // JSONL — ingest via io.Wet and curate the same way
      val wet = rest.contains("--wet")
      // --cap=<col>:<n> caps every value of <col> (e.g. lang, url) at n
      // docs post-dedup — Sampling.capPerGroup via the curate stage
      val cap = rest.find(_.startsWith("--cap=")).map { f =>
        f.stripPrefix("--cap=").split(":", 2) match {
          case Array(c, n) if n.toIntOption.exists(_ > 0) => (c, n.toInt)
          case other => sys.error(s"--cap expects <col>:<n>, got: ${other.mkString(":")}")
        }
      }
      // --budget=<col>:<tokens> spends at most <tokens> tokens per value
      // of <col> — Sampling.tokenBudget via the curate stage
      val budget = rest.find(_.startsWith("--budget=")).map { f =>
        f.stripPrefix("--budget=").split(":", 2) match {
          case Array(c, n) if n.toLongOption.exists(_ > 0) =>
            (c, Map.empty[String, Long], n.toLong)
          case other => sys.error(s"--budget expects <col>:<tokens>, got: ${other.mkString(":")}")
        }
      }
      // --block=<hostsFile>: one registrable domain per line (UT1-style
      // blocklist shape) — docs whose url host falls under any are dropped
      // before content work
      val blockFile = rest.find(_.startsWith("--block="))
        .map(_.stripPrefix("--block="))
      // --drop-lines=<n>: remove lines occurring in >= n distinct docs
      // (CCNet boilerplate pass) before scoring
      val dropLines = rest.find(_.startsWith("--drop-lines="))
        .map(_.stripPrefix("--drop-lines="))
        .map(v => v.toLongOption.filter(_ > 1)
          .getOrElse(sys.error(s"--drop-lines expects an integer > 1, got: $v")))
      val (in :: out :: Nil) = rest.filterNot(f => f == "--near-dup" ||
        f == "--gopher" || f == "--wet" || f == "--nav-lines" ||
        f.startsWith("--cap=") ||
        f.startsWith("--budget=") || f.startsWith("--block=") ||
        f.startsWith("--drop-lines=")): @unchecked
      val spark = session("graft-corpus")
      val raw =
        if (wet) graft.io.Wet.toDocuments(graft.io.Wet.readWet(spark, in))
        else Sources.readJsonl(spark, in)
      val curated = graft.operators.CorpusPipeline.curate(
        raw,
        nearDupMaxHamming = if (nearDup) Some(3) else None,
        gopherRules = gopher,
        sourceCap = cap,
        tokenBudgets = budget,
        blockedHosts = blockFile.map(f =>
          spark.read.textFile(f).toDF("host")
            .select(trim(col("host")).as("host"))
            .filter(length(col("host")) > 0 && !col("host").startsWith("#"))),
        dropLinesMinDocFreq = dropLines,
        // --nav-lines: the per-page RefinedWeb line rules
        navLineRules = rest.contains("--nav-lines"))
      curated.documents.write.mode("overwrite").parquet(s"$out/documents")
      curated.packManifest.write.mode("overwrite").parquet(s"$out/pack-manifest")
      println(s"curated: ${spark.read.parquet(s"$out/documents").count()} docs, " +
        s"${spark.read.parquet(s"$out/pack-manifest").count()} manifest rows")
      spark.stop()

    // The curate capstone: raw WARC archives to the training-ready
    // artifact as ONE composed flow — charset detect/decode (one
    // archive scan), quality floor, near-dup dedup, optional benchmark
    // decontamination, then BPE train + binary token shards.
    //   graft.Main curate-e2e <warcPathOrGlob> <outDir>
    //     [--bench=<parquetDir>] [--merges=<n>] [--shard-tokens=<n>]
    // Writes <outDir>/documents (survivors + provenance columns),
    // <outDir>/bpe (the trained model), <outDir>/shards (binary id
    // files + manifest).
    case "curate-e2e" :: rest if rest.filterNot(f =>
        f.startsWith("--bench=") || f.startsWith("--merges=") ||
          f.startsWith("--shard-tokens=")).length == 2 =>
      val bench = rest.find(_.startsWith("--bench="))
        .map(_.stripPrefix("--bench="))
      val merges = rest.find(_.startsWith("--merges="))
        .map(f => f.stripPrefix("--merges=").toIntOption
          .filter(_ > 0).getOrElse(sys.error(s"bad --merges: $f")))
        .getOrElse(256)
      val shardTokens = rest.find(_.startsWith("--shard-tokens="))
        .map(f => f.stripPrefix("--shard-tokens=").toLongOption
          .filter(_ > 0).getOrElse(sys.error(s"bad --shard-tokens: $f")))
        .getOrElse(1L << 22)
      val (in :: out :: Nil) = rest.filterNot(_.startsWith("--")): @unchecked
      val spark = session("graft-curate-e2e")
      val docs = graft.operators.CorpusPipeline.curateArchive(
          graft.io.Warc.readWarc(spark, in),
          bench.map(b => spark.read.parquet(b)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.write.mode("overwrite").parquet(s"$out/documents")
      val model = graft.operators.BpeTokenizer.trainBpe(
        docs.select("doc_id", "text"), numMerges = merges)
      graft.operators.BpeTokenizer.saveModel(model, s"$out/bpe")
      val vocab = graft.operators.BpeTokenizer.vocabMap(model)
      val manifest = graft.operators.TokenShards.writeTokenShards(
        graft.operators.BpeTokenizer.bpeEncodeIds(
          docs.select("doc_id", "text"), model.merges, vocab),
        s"$out/shards", shardTokens,
        vocabSize = vocab.size + 1, eosId = vocab.size)
      println(s"curated: ${docs.count()} docs, ${manifest.count()} shard(s), " +
        manifest.agg(org.apache.spark.sql.functions.sum("n_tokens"))
          .head.getLong(0) + " tokens -> " + out)
      docs.unpersist()
      spark.stop()

    // WET/WARC ingestion: parse a Common Crawl-style WET segment dir
    // (plain or .gz) to a parquet record table — the entry point feeding
    // the `corpus` curation stage at web scale
    //   graft.Main wet <wetPathOrGlob> <outParquetDir>
    case "wet" :: in :: out :: Nil =>
      import org.apache.spark.sql.functions.col
      val spark = session("graft-wet")
      graft.io.Wet.readWet(spark, in).write.mode("overwrite").parquet(out)
      val recs = spark.read.parquet(out)
      println(s"wet: ${recs.count()} records " +
        s"(${recs.filter(col("warc_type") === "conversion").count()} conversion, " +
        s"${recs.filter(!col("framing_ok")).count()} framing violations) -> $out")
      spark.stop()

    // full-WARC ingestion (binary-safe): record table, or media features
    // through the multimodal codecs
    case "warc" :: in :: out :: Nil =>
      val spark = session("graft-warc")
      graft.io.Warc.readWarc(spark, in).toDF().write.mode("overwrite").parquet(out)
      val recs = spark.read.parquet(out)
      println(s"warc: ${recs.count()} records " +
        s"(${recs.filter(col("warc_type") === "response").count()} response, " +
        s"${recs.filter(!col("framing_ok")).count()} framing violations) -> $out")
      spark.stop()

    // EVERY text-bearing response (html/pdf/plain) -> curate-ready docs;
    // --detect routes undeclared-charset html/plain through the detector
    case "warc-docs" :: rest if rest.filterNot(_ == "--detect").length == 2 =>
      val detect = rest.contains("--detect")
      val (in :: out :: Nil) = rest.filterNot(_ == "--detect"): @unchecked
      val spark = session("graft-warc-docs")
      val recs = graft.io.Warc.readWarc(spark, in)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.io.Warc.toDocuments(recs, detectCharsets = detect)
        .write.mode("overwrite").parquet(out)
      recs.unpersist()
      println(s"warc-docs: ${spark.read.parquet(out).count()} documents -> $out")
      spark.stop()

    // application/pdf responses -> curate-ready documents (pure-JVM
    // FlateDecode + content-stream text extraction)
    case "warc-pdf" :: in :: out :: Nil =>
      val spark = session("graft-warc-pdf")
      graft.io.Warc.toDocumentsPdf(graft.io.Warc.readWarc(spark, in))
        .write.mode("overwrite").parquet(out)
      println(s"warc-pdf: ${spark.read.parquet(out).count()} documents -> $out")
      spark.stop()

    case "warc-media" :: in :: out :: Nil =>
      val spark = session("graft-warc-media")
      graft.operators.Multimodal.decodeFeatures(
          graft.io.Warc.toMedia(graft.io.Warc.readWarc(spark, in)))
        .toDF().write.mode("overwrite").parquet(out)
      println(s"warc-media: ${spark.read.parquet(out).count()} media features -> $out")
      spark.stop()

    // charset-provenance catalog: text+html responses decoded with the
    // statistical detector on the no-declaration path, the routed
    // label carried per document (the encoding-audit product)
    case "warc-charset" :: in :: out :: Nil =>
      val spark = session("graft-warc-charset")
      val recs = graft.io.Warc.readWarc(spark, in)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.io.Warc.toDocumentsTextDetected(recs)
        .unionByName(graft.io.Warc.toDocumentsHtmlDetected(recs))
        .write.mode("overwrite").parquet(out)
      recs.unpersist()
      val docs = spark.read.parquet(out)
      println(s"warc-charset: ${docs.count()} documents, " +
        s"${docs.select("charset").distinct().count()} charsets -> $out")
      spark.stop()

    // URL identity clusters off one archive scan: redirect + meta-
    // refresh edges ∪ rel=canonical declarations -> representative per
    // alias cluster (LinkRank.urlAliasClusters)
    case "alias-clusters" :: in :: out :: Nil =>
      val spark = session("graft-alias-clusters")
      val recs = graft.io.Warc.readWarc(spark, in)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val redirects = graft.io.Warc.redirectEdges(recs)
        .select("from_url", "to_url")
        .unionByName(graft.io.Warc.refreshEdges(recs)
          .select("from_url", "to_url"))
      val canonicals = graft.io.Warc.canonicalDeclarations(recs)
      graft.operators.LinkRank.urlAliasClusters(redirects, canonicals)
        .write.mode("overwrite").parquet(out)
      recs.unpersist()
      val cl = spark.read.parquet(out)
      println(s"alias-clusters: ${cl.count()} aliased urls, " +
        s"${cl.select("representative").distinct().count()} clusters -> $out")
      spark.stop()

    // the CDXJ selection layer's lifecycle, the index-*/ann-* analogue:
    //   graft.Main cdx-build  <warcPathOrGlob> <idxDir> [shards]
    //   graft.Main cdx-merge  <warcPathOrGlob> <idxDir>
    //   graft.Main cdx-delete <idxDir> <url1,url2,...>
    case "cdx-build" :: in :: idx :: rest if rest.length <= 1 &&
        rest.forall(_.toIntOption.exists(_ > 0)) =>
      val spark = session("graft-cdx-build")
      graft.io.Cdx.writeCdxj(
        graft.io.Cdx.cdxFromWarc(graft.io.Warc.readWarc(spark, in)), idx,
        shards = rest.headOption.map(_.toInt).getOrElse(0))
      println(s"cdx-build: ${graft.io.Cdx.readCdxj(spark, idx).count()} " +
        s"index lines -> $idx")
      spark.stop()

    case "cdx-merge" :: in :: idx :: Nil =>
      val spark = session("graft-cdx-merge")
      graft.io.Cdx.mergeCdxj(spark, idx,
        graft.io.Cdx.cdxFromWarc(graft.io.Warc.readWarc(spark, in)))
      println(s"cdx-merge: standing index now " +
        s"${graft.io.Cdx.readCdxj(spark, idx).count()} lines -> $idx")
      spark.stop()

    //   graft.Main cdx-compact <idxDir> [shards]
    case "cdx-compact" :: idx :: rest if rest.length <= 1 &&
        rest.forall(_.toIntOption.exists(_ > 0)) =>
      val spark = session("graft-cdx-compact")
      val (kept, dropped) = graft.io.Cdx.compactCdxj(spark, idx,
        shards = rest.headOption.map(_.toInt).getOrElse(0))
      println(s"cdx-compact: $kept lines re-sharded" +
        (if (dropped > 0) s", $dropped flagged line(s) DROPPED" else "") +
        s" -> $idx")
      spark.stop()

    case "cdx-delete" :: idx :: urlCsv :: Nil =>
      val spark = session("graft-cdx-delete")
      import spark.implicits._
      val n = graft.io.Cdx.deleteFromCdxj(spark, idx,
        urlCsv.split(",").map(_.trim).toSeq.toDF("url"))
      println(s"cdx-delete: $n capture(s) un-indexed from $idx")
      spark.stop()

    // text-tag catalog rows (ID3v2 / MP4 ilst): media_id, kind, tag, value
    case "warc-tags" :: in :: out :: Nil =>
      val spark = session("graft-warc-tags")
      // one catalog: audio/video text tags ∪ image EXIF provenance —
      // the same (media_id, kind, tag, value) shape, one archive scan
      val media = graft.io.Warc.toMedia(graft.io.Warc.readWarc(spark, in))
        .persist()
      graft.operators.Multimodal.mediaTags(media)
        .unionByName(graft.operators.Multimodal.imageExif(media))
        .write.mode("overwrite").parquet(out)
      media.unpersist()
      println(s"warc-tags: ${spark.read.parquet(out).count()} tag rows -> $out")
      spark.stop()

    // BPE-encode a corpus with a saved model and write binary token
    // shards + manifest (the training-consumable artifact)
    //   graft.Main shards <documentsParquetDir> <bpeModelDir> <outDir> [tokensPerShard]
    case "shards" :: docs :: modelDir :: out :: rest if rest.length <= 1 &&
        rest.forall(_.toLongOption.exists(_ > 0)) =>
      val spark = session("graft-shards")
      val perShard = rest.headOption.map(_.toLong).getOrElse(1L << 20)
      val merges = graft.operators.BpeTokenizer.loadMerges(spark, modelDir)
      val vocab = graft.operators.BpeTokenizer.loadVocab(spark, modelDir)
      val eosId = vocab.size // one past the vocabulary, the doc separator
      val manifest = graft.operators.TokenShards.writeTokenShards(
        graft.operators.BpeTokenizer.bpeEncodeIds(
          spark.read.parquet(docs).select("doc_id", "text"), merges, vocab),
        out, perShard, vocabSize = eosId + 1, eosId = eosId)
      val (ns, nt) = (manifest.count(),
        manifest.agg(org.apache.spark.sql.functions.sum("n_tokens"))
          .head.getLong(0))
      println(s"shards: $ns shard(s), $nt tokens (eos=$eosId) -> $out")
      spark.stop()

    // dataset card + composition table for a curated corpus
    //   graft.Main report <documentsParquetDir> <outDir> [dim1,dim2,...]
    case "report" :: docs :: out :: rest if rest.length <= 1 =>
      val spark = session("graft-report")
      val dims = rest.headOption.map(_.split(",").toSeq)
        .getOrElse(Seq("source", "lang"))
      val df = spark.read.parquet(docs)
      graft.operators.Report.datasetCard(df, dims)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/card")
      graft.operators.Report.corpusComposition(df, dims)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/composition")
      val card = spark.read.parquet(s"$out/card")
      println(s"report: ${card.count()} card rows over ${dims.mkString(",")} -> $out")
      spark.stop()

    // ad-hoc keyword probe of a curated corpus: top-k docs by BM25
    //   graft.Main search <documentsParquetDir> <k> <term> [term...]
    case "search" :: dir :: k :: terms if terms.nonEmpty && k.toIntOption.exists(_ > 0) =>
      val spark = session("graft-search")
      graft.operators.Search.bm25TopK(
          spark.read.parquet(dir), terms.distinct, k.toInt)
        .collect()
        .foreach(r => println(s"${r.getLong(0)}\t${r.getDouble(1)}"))
      spark.stop()

    // standing-index lifecycle: build (overwrite) or append a doc batch,
    // probe with a term list, fold append debris
    //   graft.Main index-build  <documentsParquetDir> <indexDir>
    //   graft.Main index-append <documentsParquetDir> <indexDir>
    //   graft.Main index-probe  <indexDir> <k> <term> [term...]
    //   graft.Main index-compact <indexDir>
    case "index-build" :: docs :: idx :: Nil =>
      val spark = session("graft-index-build")
      graft.operators.Search.bm25BuildIndex(spark.read.parquet(docs), idx)
      println(s"indexed: $docs -> $idx")
      spark.stop()

    case "index-append" :: docs :: idx :: Nil =>
      val spark = session("graft-index-append")
      graft.operators.Search.bm25IndexAppend(spark.read.parquet(docs), idx)
      println(s"appended: $docs -> $idx")
      spark.stop()

    case "index-probe" :: idx :: k :: terms if terms.nonEmpty && k.toIntOption.exists(_ > 0) =>
      val spark = session("graft-index-probe")
      graft.operators.Search.bm25IndexProbe(spark, idx, terms.distinct, k.toInt)
        .collect()
        .foreach(r => println(s"${r.getLong(0)}\t${r.getDouble(1)}"))
      spark.stop()

    case "bpe-train" :: docs :: modelDir :: rest if rest.length <= 1 &&
        rest.forall(_.toIntOption.exists(_ > 0)) =>
      val spark = session("graft-bpe-train")
      val numMerges = rest.headOption.map(_.toInt).getOrElse(256)
      val model = graft.operators.BpeTokenizer.trainBpe(
        spark.read.parquet(docs), numMerges)
      graft.operators.BpeTokenizer.saveModel(model, modelDir)
      val v = spark.read.parquet(s"$modelDir/vocab").count()
      println(s"bpe model: ${model.merges.length} merges, $v vocab tokens -> $modelDir")
      spark.stop()

    case "bpe-encode" :: docs :: modelDir :: out :: Nil =>
      val spark = session("graft-bpe-encode")
      val merges = graft.operators.BpeTokenizer.loadMerges(spark, modelDir)
      val vocab = graft.operators.BpeTokenizer.loadVocab(spark, modelDir)
      val enc = graft.operators.BpeTokenizer.bpeEncodeIds(
        spark.read.parquet(docs), merges, vocab)
      enc.write.mode("overwrite").parquet(out)
      val stats = spark.read.parquet(out)
        .selectExpr("count(*)", "sum(n_tokens)", "sum(n_oov)").collect()(0)
      println(s"encoded: ${stats.getLong(0)} docs, ${stats.getLong(1)} tokens, " +
        s"${stats.getLong(2)} oov -> $out")
      spark.stop()

    case "index-compact" :: idx :: Nil =>
      val spark = session("graft-index-compact")
      graft.operators.Search.bm25IndexCompact(spark, idx)
      println(s"compacted index: $idx")
      spark.stop()

    // operator recovery after a CRASHED (process-death) writer left its
    // lease behind — works on BM25 and ANN indexes alike
    case "index-unlock" :: idx :: Nil =>
      val spark = session("graft-index-unlock")
      graft.operators.IndexLock.forceUnlock(spark, idx)
      println(s"cleared writer lease: $idx")
      spark.stop()

    //   graft.Main index-delete <indexDir> <id1,id2,...>
    case "index-delete" :: idx :: idCsv :: Nil =>
      val spark = session("graft-index-delete")
      import spark.implicits._
      val n = graft.operators.Search.bm25IndexDelete(spark, idx,
        idCsv.split(",").map(_.trim.toLong).toSeq.toDF("doc_id"))
      println(s"retracted $n doc(s) from $idx")
      spark.stop()

    // standing ANN index lifecycle — the vector analogue of index-*:
    //   graft.Main ann-build   <embeddingsParquetDir> <indexDir> <nLists> <m>
    //   graft.Main ann-append  <embeddingsParquetDir> <indexDir>
    //   graft.Main ann-probe   <indexDir> <queriesParquetDir> <k> [nProbe]
    //   graft.Main ann-compact <indexDir>
    //   graft.Main ann-rebalance <indexDir>
    case "ann-build" :: vecs :: idx :: nl :: m :: Nil
        if nl.toIntOption.exists(_ > 0) && m.toIntOption.exists(_ > 0) =>
      val spark = session("graft-ann-build")
      graft.operators.AnnIndex.annBuildIndex(
        spark.read.parquet(vecs), idx, nLists = nl.toInt, m = m.toInt)
      println(s"ann-indexed: $vecs -> $idx")
      spark.stop()

    case "ann-append" :: vecs :: idx :: Nil =>
      val spark = session("graft-ann-append")
      graft.operators.AnnIndex.annIndexAppend(spark.read.parquet(vecs), idx)
      println(s"ann-appended: $vecs -> $idx")
      spark.stop()

    case "ann-probe" :: idx :: queries :: k :: rest
        if rest.length <= 1 && k.toIntOption.exists(_ > 0) &&
          rest.headOption.forall(_.toIntOption.exists(_ > 0)) =>
      val spark = session("graft-ann-probe")
      graft.operators.AnnIndex.annIndexProbe(spark, idx,
          spark.read.parquet(queries), k.toInt,
          nProbe = rest.headOption.map(_.toInt).getOrElse(8))
        .collect()
        .foreach(r => println(s"${r.getLong(0)}\t${r.getInt(1)}\t${r.getLong(2)}\t${r.getDouble(3)}"))
      spark.stop()

    case "ann-compact" :: idx :: Nil =>
      val spark = session("graft-ann-compact")
      graft.operators.AnnIndex.annIndexCompact(spark, idx)
      println(s"compacted ann index: $idx")
      spark.stop()

    //   graft.Main ann-rebalance <indexDir>   (growth maintenance: re-train
    //   at corpus-proportional nLists, re-code survivors, swap)
    case "ann-rebalance" :: idx :: Nil =>
      val spark = session("graft-ann-rebalance")
      graft.operators.AnnIndex.annIndexRebalance(spark, idx)
      val meta = graft.operators.AnnIndex.loadMeta(spark, idx)
      println(s"rebalanced ann index: $idx -> " +
        meta.map(m => s"${m.nLists} lists over ${m.builtVectors} vectors")
          .getOrElse("?"))
      spark.stop()

    //   graft.Main ann-delete <indexDir> <id1,id2,...>
    case "ann-delete" :: idx :: idCsv :: Nil =>
      val spark = session("graft-ann-delete")
      import spark.implicits._
      val n = graft.operators.AnnIndex.annIndexDelete(spark, idx,
        idCsv.split(",").map(_.trim.toLong).toSeq.toDF("vec_id"))
      println(s"retracted $n vector(s) from $idx")
      spark.stop()

    // full-corpus takedown across every standing artifact the streaming
    // sinks maintain (corpus, signatures, buckets, optional BM25 index):
    //   graft.Main delete <corpusDir> <sigDir> <id1,id2,...> [bm25IndexDir]
    case "delete" :: corpusDir :: sigDir :: idCsv :: rest if rest.length <= 1 =>
      val spark = session("graft-delete")
      import spark.implicits._
      val n = graft.operators.CorpusPipeline.deleteDocs(spark,
        idCsv.split(",").map(_.trim.toLong).toSeq.toDF("doc_id"),
        corpusDir, sigDir, indexDir = rest.headOption)
      println(s"retracted $n doc(s) from $corpusDir")
      spark.stop()

    // small-file maintenance: rewrite a parquet dir to a byte budget
    //   graft.Main compact <parquetDir> [targetFileMB]
    case "compact" :: dir :: rest if rest.length <= 1 &&
        rest.headOption.forall(_.toLongOption.exists(_ > 0)) =>
      val targetMb = rest.headOption.map(_.toLong).getOrElse(128L)
      val spark = session("graft-compact")
      val n = Sinks.compactParquet(spark, dir, targetMb * 1024 * 1024)
      println(s"compacted: $dir -> $n file(s)")
      spark.stop()

    case "run" :: configPath :: Nil =>
      // raw data already staged at the catalog locations — unless
      // retrieve.registry=true, which stages the build's Ensembl download
      // set there first (config-driven form of `complete <build>`)
      val cfg = GraftConfig.load(configPath)
      val cat = cfg.catalog
      if (cfg.retrieveFromRegistry) {
        Retrieve.retrieveAll(
          EnsemblRegistry.variationUrls(cfg.build), cat.variantRawDir, cfg.overwrite)
        Retrieve.retrieve(
          EnsemblRegistry.geneUrl(cfg.build), cat.geneRawDir, cfg.overwrite)
      }
      val spark = session(s"graft-run-${cfg.build}", cfg)
      Pipeline.completeCatalog(spark, cat, cfg.chromosomePartitioned)
      spark.stop()

    case "run" :: configPath :: gvf :: gtf :: Nil =>
      // explicit sources: URLs stage into the catalog's raw layout
      val cfg = GraftConfig.load(configPath)
      val cat = cfg.catalog
      val spark = session(s"graft-run-${cfg.build}", cfg)
      val (gvfLocal, gtfLocal) = resolveInputs(
        gvf, cat.variantRawDir, gtf, cat.geneRawDir, cfg.overwrite)
      Pipeline.completeTo(spark, gvfLocal, gtfLocal,
        effectsDir = cat.variantEffectsDir,
        metadataDir = cat.variantMetadataDir,
        genesDir = cat.genesDir,
        genesDedupedDir = cat.genesDedupedDir,
        intergenicDir = cat.intergenicDir,
        intragenicDir = cat.intragenicDir,
        chromosomePartitioned = cfg.chromosomePartitioned)
      spark.stop()

    case other =>
      System.err.println(
        s"""unknown arguments: ${other.mkString(" ")}
           |usage:
           |  graft.Main retrieve <url> [url...] <destDir>
           |  graft.Main process  <gvf> <gtf> <outDir>
           |  graft.Main annotate <effectsTsv> <genesTsv> <outDir>
           |  graft.Main complete [--force] <gvf|url> <gtf|url> <outDir>
           |  graft.Main complete [--force] <hg38|mm10> <outDir>
           |  graft.Main corpus   [--wet] [--near-dup] [--gopher] [--cap=<col>:<n>] [--budget=<col>:<tokens>] [--block=<hostsFile>] [--drop-lines=<n>] <in.jsonl|wetDir> <outDir>
           |  graft.Main wet      <wetPathOrGlob> <outParquetDir>
           |  graft.Main warc     <warcPathOrGlob> <outParquetDir>
           |  graft.Main warc-media <warcPathOrGlob> <outParquetDir>
           |  graft.Main warc-pdf <warcPathOrGlob> <outParquetDir>
           |  graft.Main warc-docs [--detect] <warcPathOrGlob> <outParquetDir>
           |  graft.Main shards   <documentsParquetDir> <bpeModelDir> <outDir> [tokensPerShard]
           |  graft.Main report   <documentsParquetDir> <outDir> [dim1,dim2,...]
           |  graft.Main search   <documentsParquetDir> <k> <term> [term...]
           |  graft.Main index-build  <documentsParquetDir> <indexDir>
           |  graft.Main index-append <documentsParquetDir> <indexDir>
           |  graft.Main index-probe  <indexDir> <k> <term> [term...]
           |  graft.Main bpe-train <documentsParquetDir> <modelDir> [numMerges]
           |  graft.Main bpe-encode <documentsParquetDir> <modelDir> <outParquetDir>
           |  graft.Main warc-tags <warcPathOrGlob> <outParquetDir>
           |  graft.Main warc-charset <warcPathOrGlob> <outParquetDir>
           |  graft.Main alias-clusters <warcPathOrGlob> <outParquetDir>
           |  graft.Main cdx-build <warcPathOrGlob> <idxDir> [shards]
           |  graft.Main cdx-merge <warcPathOrGlob> <idxDir>
           |  graft.Main cdx-delete <idxDir> <url1,url2,...>
           |  graft.Main cdx-compact <idxDir> [shards]
           |  graft.Main index-compact <indexDir>
           |  graft.Main index-unlock <indexDir>
           |  graft.Main index-delete <indexDir> <id1,id2,...>
           |  graft.Main ann-build <embeddingsParquetDir> <indexDir> <nLists> <m>
           |  graft.Main ann-append <embeddingsParquetDir> <indexDir>
           |  graft.Main ann-probe <indexDir> <queriesParquetDir> <k> [nProbe]
           |  graft.Main ann-compact <indexDir>
           |  graft.Main ann-delete <indexDir> <id1,id2,...>
           |  graft.Main delete <corpusDir> <sigDir> <id1,id2,...> [bm25IndexDir]
           |  graft.Main compact  <parquetDir> [targetFileMB]
           |  graft.Main run      <config.properties> [<gvf|url> <gtf|url>]""".stripMargin)
      sys.exit(2)
  }
}
