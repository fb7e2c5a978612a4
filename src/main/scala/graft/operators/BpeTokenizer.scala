package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding tokenizer training and encoding
  * (Sennrich et al. 2016) — the learned counterpart of the
  * `TextFunctions.bpeTokenCount` regex proxy. A training-data pipeline
  * at 100 TB does not just COUNT tokens, it LEARNS the tokenizer from
  * the corpus it curates; this operator does both halves Spark-first.
  *
  * The reference pipeline has no tokenizer surface (SURVEY.md §2.9 —
  * training-data extension operator).
  *
  * Scale shape — the key decomposition is corpus-scale work vs
  * vocabulary-scale work:
  *  - `wordFrequencies`: the ONLY corpus-scale pass. One explode + one
  *    hash-aggregate shuffle folds 100 TB of text into a distinct-word
  *    table of O(|vocabulary|) rows (each with a count), which is what
  *    every later step operates on. `minWordFreq` prunes the long tail
  *    (hapax legomena carry no merge evidence and at web scale dominate
  *    the row count).
  *  - `learnMerges`: BPE's sequential-greedy contract — merge r+1's
  *    counts depend on merge r having been applied — means the loop is
  *    inherently iterative. Each iteration is one SMALL job over the
  *    word table: explode adjacent symbol pairs weighted by word freq,
  *    hash-aggregate, take the argmax row. Per-iteration cost is
  *    O(word-table), INDEPENDENT of corpus size; driver traffic is one
  *    row per merge (the argmax), never the table. The merge fold is a
  *    pure Catalyst `aggregate` higher-order expression, so applying a
  *    merge is a narrow map over the word table — no shuffle at all.
  *    Lineage is truncated by a local checkpoint every few merges.
  *  - `bpeEncode`: merges are a driver-side array of `numMerges` string
  *    pairs (KB-scale by construction — the model artifact), broadcast
  *    once; encoding is a narrow `mapPartitions` codec (the
  *    `Multimodal` precedent) with a per-partition word→tokens memo, so
  *    each DISTINCT word per partition pays the merge loop once however
  *    often it occurs. Zero shuffle, linear in corpus bytes.
  *
  * Determinism contract (what the q_check_bpe gate pins down): pair
  * counts are exact longs; the argmax tiebreak is (count desc, left
  * asc, right asc), so training is bit-reproducible across partitionings
  * and replays. Encoding applies merges in rank order, each
  * exhaustively left-to-right — exactly the state the training fold
  * leaves the word table in, so `encodeWord` on a training word
  * reproduces the trained segmentation symbol-for-symbol (the parity
  * check in BpeTokenizerSpec and q_check_bpe).
  *
  * Symbols are Unicode code points (`substring` on the Spark side and
  * `codePoints` on the JVM side both index code points, so the two
  * halves agree beyond the BMP); words end with the [[EOW]] marker so
  * merges never cross word boundaries and decoding is unambiguous.
  */
object BpeTokenizer {

  /** End-of-word marker appended to every word's symbol sequence
    * (Sennrich-style). Multi-char on purpose: no single code point in
    * real text collides with it. */
  val EOW = "</w>"

  /** One learned merge: at `rank`, adjacent symbols (`left`, `right`)
    * fuse into `left + right`. */
  final case class BpeMerge(rank: Int, left: String, right: String)

  /** A trained tokenizer: the ranked merge list (the model — KB-scale,
    * driver-held, broadcast to encode) plus the word table in its
    * final segmented state (`word`, `freq`, `syms`) for parity checks
    * and vocabulary derivation. */
  final case class BpeModel(merges: Seq[BpeMerge], words: DataFrame) {
    /** Merge list as a DataFrame for persistence / query output. */
    def mergesDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      merges.map(m => (m.rank, m.left, m.right, m.left + m.right))
        .toDF("rank", "left", "right", "merged")
    }
  }

  /** Corpus → distinct-word frequency table (`word`, `freq`) — the one
    * corpus-scale shuffle in BPE training. Whitespace pre-tokenization
    * (the same `\s+` contract as `TextFunctions.tokens`, so learned
    * token counts are comparable to the whitespace baseline).
    * `minWordFreq` drops words with fewer occurrences than the floor —
    * at web scale the hapax tail is most of the distinct rows and
    * contributes nothing a merge could ever win on. */
  def wordFrequencies(docs: DataFrame, textCol: String = "text",
      minWordFreq: Long = 1L): DataFrame = {
    require(minWordFreq >= 1, s"minWordFreq must be >= 1: $minWordFreq")
    docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minWordFreq)
  }

  /** Initial symbol sequence of `word`: one array element per code
    * point, then [[EOW]]. `substring` indexes code points on
    * UTF8String, matching the JVM encoder's `codePoints` split. */
  private def initialSyms(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => substring_unit(word, i)),
      array(lit(EOW)))

  /** One-code-point slice — `substring(word, i, 1)` via the Column API. */
  private def substring_unit(word: Column, i: Column): Column =
    word.substr(i, lit(1))

  /** Greedy left-to-right single-pass merge of adjacent (`l`, `r`) into
    * `m` over a symbol array — the Catalyst fold both training and the
    * oracle-facing checks use. `try_element_at` yields null on the empty
    * accumulator, which `when` treats as no-match, so the fold is
    * ANSI-safe without a size guard. */
  private def mergeFold(syms: Column, l: String, r: String, m: String): Column =
    aggregate(syms, lit(Array.empty[String]),
      (acc, x) => when(
        try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
        .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` BPE merges from a (`word`, `freq`) table.
    *
    * Sequential-greedy by contract: each iteration pair-counts the
    * CURRENT segmentation (one word-table-scale aggregate), collects the
    * single argmax row, and applies the merge as a narrow Catalyst fold.
    * Stops early when the best pair's count drops below `minPairFreq`
    * (a merge seen once is noise, and at the natural end of training
    * every remaining pair is rare). Lineage is truncated with an eager
    * local checkpoint every [[checkpointEvery]] merges so the stacked
    * folds never grow an unbounded plan.
    *
    * Returns the merge list and the word table in its final segmented
    * state. */
  def learnMerges(wordFreq: DataFrame, numMerges: Int,
      minPairFreq: Long = 2L): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    require(minPairFreq >= 1, s"minPairFreq must be >= 1: $minPairFreq")
    val base = wordFreq
      .select(col("word"), col("freq").cast(LongType).as("freq"),
        initialSyms(col("word")).as("syms"))
    var cur = base.localCheckpoint(true)
    val merges = mutable.ArrayBuffer.empty[BpeMerge]
    var sinceCheckpoint = 0
    var stopped = false
    while (merges.length < numMerges && !stopped) {
      // pair-count the current segmentation; ONE row leaves the cluster.
      // Fully-merged words (a single symbol — frequent words collapse to
      // one token fast) carry no pairs and must not reach the explode:
      // sequence(0, -1) is a DESCENDING sequence in Spark, not empty.
      val top = cur
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i + 1] AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minPairFreq) {
        stopped = true
      } else {
        val l = top(0).getAs[String]("l")
        val r = top(0).getAs[String]("r")
        merges += BpeMerge(merges.length, l, r)
        cur = cur.select(col("word"), col("freq"),
          mergeFold(col("syms"), l, r, l + r).as("syms"))
        sinceCheckpoint += 1
        if (sinceCheckpoint >= checkpointEvery) {
          cur = cur.localCheckpoint(true)
          sinceCheckpoint = 0
        }
      }
    }
    BpeModel(merges.toSeq, cur)
  }

  /** Fold stack depth between lineage truncations: deep enough to
    * amortize the checkpoint job, shallow enough that re-analysis of
    * the stacked `aggregate` folds stays trivial. */
  private val checkpointEvery = 8

  /** Train end-to-end: corpus → word frequencies → merges. */
  def trainBpe(docs: DataFrame, numMerges: Int, textCol: String = "text",
      minWordFreq: Long = 1L, minPairFreq: Long = 2L): BpeModel =
    learnMerges(wordFrequencies(docs, textCol, minWordFreq), numMerges, minPairFreq)

  /** JVM-side encode of one word against a ranked merge list: apply
    * merges in rank order, each exhaustively left-to-right — the same
    * fold the trainer runs distributed, so training words reproduce
    * their trained segmentation exactly. O(numMerges · |word|); callers
    * memoize per distinct word ([[bpeEncode]]). */
  def encodeWord(word: String, merges: Seq[BpeMerge]): Array[String] = {
    var syms: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp))) :+ EOW
    merges.foreach { m =>
      if (syms.length >= 2) {
        val out = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (out.nonEmpty && out.last == m.left && syms(i) == m.right) {
            out(out.length - 1) = m.left + m.right
          } else {
            out += syms(i)
          }
          i += 1
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Per-partition memo ceiling: distinct words per partition beyond
    * this flush the memo (web-scale partitions can hold more distinct
    * words than executor heap wants to keep as boxed arrays). */
  private val encodeMemoCap = 1 << 17

  /** Encode a corpus with a trained merge list: (`doc_id`, `tokens`).
    * The model is broadcast once; encoding is a narrow typed
    * `mapPartitions` codec (zero shuffle) with a per-partition
    * word→tokens memo so each distinct word pays the merge loop once.
    * Null text encodes to an empty token array. */
  def bpeEncode(docs: DataFrame, merges: Seq[BpeMerge],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray.sortBy(_.rank).toSeq)
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        col(textCol).cast(StringType).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.split("\\s+").filter(_.nonEmpty)
          if (memo.size > encodeMemoCap) memo.clear()
          val toks = words.flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, ms)))
          (id, toks)
        }
      }
      .toDF("doc_id", "tokens")
  }

  /** Encode each row of a one-column word table: (`word`, `tokens`).
    * The [[bpeEncode]] codec over distinct words — the parity-check
    * surface (trainer's final `syms` vs this encoder, per word). */
  def encodeWordsTable(words: DataFrame, merges: Seq[BpeMerge],
      wordCol: String = "word"): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray.sortBy(_.rank).toSeq)
    words.select(col(wordCol).cast(StringType)).as[String]
      .mapPartitions { it =>
        val ms = bc.value
        it.map(w => (w, encodeWord(w, ms)))
      }
      .toDF("word", "tokens")
  }

  /** Decode a token array back to the word string it encodes: tokens
    * concatenate and the [[EOW]] marker restores the word boundary.
    * Column-level so checks run in-plan. */
  def decodeTokens(tokens: Column): Column =
    array_join(transform(tokens, t => replace(t, lit(EOW), lit(""))), "")

  /** Vocabulary of a trained model as (`token_id`, `token`): the training
    * corpus's alphabet (every distinct code-point symbol plus [[EOW]])
    * sorted lexicographically at ids `0..A-1`, then merge `r`'s product
    * at id `A + r` — fully deterministic, so two engines handed the same
    * model emit identical id maps. The table is vocab-scale (the model
    * artifact, KBs–MBs at any corpus size); the id-assigning global sort
    * runs on that artifact, never on the corpus. */
  def vocabTable(model: BpeModel): DataFrame = {
    val spark = model.words.sparkSession
    import spark.implicits._
    val alphabet = model.words
      .select(explode(initialSyms(col("word"))).as("token"))
      .distinct()
    val nAlpha = alphabet.count()
    // vocab-scale rows through ONE window: a single partition is the
    // correct plan here, but it rides an explicit constant single-group
    // partitionBy — pmod(length(token), 1), NOT lit(0), which
    // EliminateWindowPartitions folds back to empty — so Spark's
    // single-partition WindowExec warning stays out of every model
    // build's log, where it would bury a REAL unpartitioned window.
    val alphaIds = alphabet
      .withColumn("token_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(length(col("token")), lit(1)))
          .orderBy(col("token"))).cast(IntegerType) - 1)
    val mergeIds = model.merges
      .map(m => (m.left + m.right, nAlpha.toInt + m.rank))
      .toDF("token", "token_id")
    alphaIds.select(col("token_id"), col("token"))
      .unionByName(mergeIds.select(col("token_id"), col("token")))
  }

  /** Encode a corpus straight to training-ready token ids:
    * (`doc_id`, `token_ids`, `n_tokens`, `n_oov`). The vocabulary id map
    * rides the same broadcast as the merges (both are the model
    * artifact); symbols outside the vocabulary — code points never seen
    * in training — emit id −1 and count in `n_oov`, so the caller
    * decides between dropping, filtering, and an unk remap. Zero
    * shuffle, linear in corpus bytes. */
  def bpeEncodeIds(docs: DataFrame, merges: Seq[BpeMerge],
      vocab: Map[String, Int], idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bcM = spark.sparkContext.broadcast(merges.toArray.sortBy(_.rank).toSeq)
    val bcV = spark.sparkContext.broadcast(vocab)
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        col(textCol).cast(StringType).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bcM.value
        val v = bcV.value
        val memo = mutable.HashMap.empty[String, Array[Int]]
        it.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.split("\\s+").filter(_.nonEmpty)
          if (memo.size > encodeMemoCap) memo.clear()
          val ids = words.flatMap(w => memo.getOrElseUpdate(w,
            encodeWord(w, ms).map(v.getOrElse(_, -1))))
          (id, ids, ids.length, ids.count(_ < 0))
        }
      }
      .toDF("doc_id", "token_ids", "n_tokens", "n_oov")
  }

  /** Driver-side (token → id) map off [[vocabTable]] — the broadcastable
    * model artifact `bpeEncodeIds` consumes. Vocab-scale collect (the
    * same contract as the merge list itself). */
  def vocabMap(model: BpeModel): Map[String, Int] =
    vocabTable(model).collect()
      .map(r => r.getString(1) -> r.getInt(0)).toMap

  /** Persist a trained model under `dir` as two parquet tables —
    * `merges` (rank, left, right, merged) and `vocab` (token_id, token).
    * The artifact a training fleet ships alongside its shards. */
  def saveModel(model: BpeModel, dir: String): Unit = {
    val spark = model.words.sparkSession
    model.mergesDf(spark).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/merges")
    vocabTable(model).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** Load the ranked merge list of a [[saveModel]] artifact. */
  def loadMerges(spark: SparkSession, dir: String): Seq[BpeMerge] =
    spark.read.parquet(s"$dir/merges")
      .select("rank", "left", "right").collect()
      .map(r => BpeMerge(r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_.rank).toSeq

  /** Load the (token → id) vocabulary of a [[saveModel]] artifact. */
  def loadVocab(spark: SparkSession, dir: String): Map[String, Int] =
    spark.read.parquet(s"$dir/vocab")
      .select("token_id", "token").collect()
      .map(r => r.getString(1) -> r.getInt(0)).toMap
}
