package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.operators.BpeTokenizer
import graft.operators.BpeTokenizer.{BpeMerge, EOW}

class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  /** Independent single-threaded reference BPE trainer (the textbook
    * algorithm over an in-memory word-count map) — shares no code with
    * the distributed trainer; same tiebreak contract (count desc, left
    * asc, right asc). */
  private def referenceTrain(wordFreq: Map[String, Long], numMerges: Int,
      minPairFreq: Long): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      (w.codePoints().toArray.map(cp =>
        new String(Character.toChars(cp))).toVector :+ EOW, f)
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (best._2 < minPairFreq) done = true
        else {
          val (l, r) = best._1
          merges += ((l, r))
          words = words.map { case (syms, f) =>
            val out = mutable.ArrayBuffer.empty[String]
            for (s <- syms) {
              if (out.nonEmpty && out.last == l && s == r)
                out(out.length - 1) = l + r
              else out += s
            }
            (out.toVector, f)
          }
        }
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    (1L, "low lower lowest low low"),
    (2L, "new newer newest new newer"),
    (3L, "wide wider widest wide"),
    (4L, "low new wide slow slower"),
    (5L, "the newest lowest the the"))

  test("learnMerges matches the in-memory reference trainer merge-for-merge") {
    val docs = corpus.toDF("doc_id", "text")
    val wf = BpeTokenizer.wordFrequencies(docs)
    val wordMap = wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceTrain(wordMap, numMerges = 30, minPairFreq = 2L)
    val model = BpeTokenizer.learnMerges(wf, numMerges = 30, minPairFreq = 2L)
    val got = model.merges.map(m => (m.left, m.right))
    assert(got == want)
    assert(model.merges.map(_.rank) == got.indices)
  }

  test("training is invariant to word-table partitioning") {
    val docs = corpus.toDF("doc_id", "text")
    val wf = BpeTokenizer.wordFrequencies(docs)
    val a = BpeTokenizer.learnMerges(wf, 20, 2L).merges
    val b = BpeTokenizer.learnMerges(wf.repartition(7), 20, 2L).merges
    assert(a == b)
  }

  test("encodeWord reproduces every training word's trained segmentation") {
    val docs = corpus.toDF("doc_id", "text")
    val model = BpeTokenizer.trainBpe(docs, numMerges = 25)
    val trained = model.words.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
    assert(trained.nonEmpty)
    for ((w, syms) <- trained)
      assert(BpeTokenizer.encodeWord(w, model.merges).toSeq == syms,
        s"parity failed for word '$w'")
  }

  test("bpeEncode round-trips: decoded tokens rebuild the normalized text") {
    val docs = corpus.toDF("doc_id", "text")
    val model = BpeTokenizer.trainBpe(docs, numMerges = 25)
    val enc = BpeTokenizer.bpeEncode(docs, model.merges)
    // tokens of one word concatenate to word + EOW; EOW count = word count
    val bad = enc.join(docs.toDF("doc_id", "text"), Seq("doc_id"))
      .select(col("doc_id"),
        BpeTokenizer.decodeTokens(col("tokens")).as("dec"),
        array_join(graft.functions.TextFunctions.tokens(col("text")), "").as("norm"))
      .filter(col("dec") =!= col("norm"))
      .count()
    assert(bad == 0L)
  }

  test("encoding segments unseen words with the learned merges") {
    val docs = corpus.toDF("doc_id", "text")
    val model = BpeTokenizer.trainBpe(docs, numMerges = 25)
    // 'slowest' never occurs, but 'slow'/'est'-family merges apply
    val toks = BpeTokenizer.encodeWord("slowest", model.merges)
    assert(toks.mkString("") == "slowest" + EOW)
    assert(toks.length < "slowest".length + 1, "no merge applied to an in-domain word")
  }

  test("minPairFreq stops training before numMerges on a tiny corpus") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val model = BpeTokenizer.trainBpe(docs, numMerges = 50, minPairFreq = 2L)
    // only pairs with freq >= 2: (a,b) and (ab,</w>) — then every pair is 1
    assert(model.merges.length < 50)
    assert(model.merges.nonEmpty)
  }

  test("merge fold handles overlapping pairs greedily left-to-right") {
    // 'aaaa' with merge (a,a): greedy gives (aa)(aa), not a(aa)a
    val syms = BpeTokenizer.encodeWord("aaaa", Seq(BpeMerge(0, "a", "a")))
    assert(syms.toSeq == Seq("aa", "aa", EOW))
    // and the distributed fold agrees via a one-word train
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val model = BpeTokenizer.trainBpe(docs, numMerges = 1, minPairFreq = 2L)
    assert(model.merges == Seq(BpeMerge(0, "a", "a")))
    val got = model.words.select("syms").as[Seq[String]].collect().head
    assert(got == Seq("aa", "aa", EOW))
  }

  test("empty and null text encode to empty token arrays") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "ok"))
      .toDF("doc_id", "text")
    val model = BpeTokenizer.trainBpe(Seq((1L, "ok ok")).toDF("doc_id", "text"), 5)
    val out = BpeTokenizer.bpeEncode(docs, model.merges)
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(out(0)._2.isEmpty && out(1)._2.isEmpty && out(2)._2.nonEmpty)
  }

  test("vocabTable: deterministic dense ids — sorted alphabet then merges by rank") {
    val docs = corpus.toDF("doc_id", "text")
    val model = BpeTokenizer.trainBpe(docs, numMerges = 20)
    val vocab = BpeTokenizer.vocabTable(model).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    // dense 0..V-1, no duplicate tokens
    assert(vocab.map(_._1).toSeq == vocab.indices)
    assert(vocab.map(_._2).distinct.length == vocab.length)
    val nAlpha = vocab.length - model.merges.length
    // alphabet prefix is sorted and contains EOW; merge ids follow rank order
    val alpha = vocab.take(nAlpha).map(_._2)
    assert(alpha.sorted.toSeq == alpha.toSeq)
    assert(alpha.contains(EOW))
    for (m <- model.merges)
      assert(vocab(nAlpha + m.rank)._2 == m.left + m.right)
  }

  test("bpeEncodeIds: ids invert through the vocab back to the token stream") {
    val docs = corpus.toDF("doc_id", "text")
    val model = BpeTokenizer.trainBpe(docs, numMerges = 20)
    val vmap = BpeTokenizer.vocabMap(model)
    val inv = vmap.map(_.swap)
    val toks = BpeTokenizer.bpeEncode(docs, model.merges)
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    val ids = BpeTokenizer.bpeEncodeIds(docs, model.merges, vmap)
      .orderBy("doc_id").as[(Long, Seq[Int], Int, Int)].collect()
    assert(ids.forall(_._4 == 0), "training corpus must have zero OOV")
    for (((_, ts), (_, is, n, _)) <- toks.zip(ids)) {
      assert(n == is.length)
      assert(is.map(inv) == ts)
    }
  }

  test("bpeEncodeIds: out-of-alphabet code points count as OOV with id -1") {
    val model = BpeTokenizer.trainBpe(Seq((1L, "ab ab")).toDF("doc_id", "text"), 5)
    val vmap = BpeTokenizer.vocabMap(model)
    val out = BpeTokenizer.bpeEncodeIds(
        Seq((1L, "ab zz")).toDF("doc_id", "text"), model.merges, vmap)
      .as[(Long, Seq[Int], Int, Int)].collect().head
    assert(out._4 > 0)
    assert(out._2.count(_ == -1) == out._4)
  }

  test("saveModel/loadMerges/loadVocab round-trip the artifact byte-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    val docs = corpus.toDF("doc_id", "text")
    val model = BpeTokenizer.trainBpe(docs, numMerges = 15)
    BpeTokenizer.saveModel(model, dir)
    assert(BpeTokenizer.loadMerges(spark, dir) == model.merges)
    assert(BpeTokenizer.loadVocab(spark, dir) == BpeTokenizer.vocabMap(model))
  }

  test("non-BMP code points survive the Spark/JVM symbol split identically") {
    // U+1F600 is a surrogate pair in UTF-16; both halves must treat it
    // as ONE symbol or merges would corrupt it
    val docs = Seq((1L, "a😀b a😀b")).toDF("doc_id", "text")
    val model = BpeTokenizer.trainBpe(docs, numMerges = 3, minPairFreq = 2L)
    val trained = model.words.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for ((w, syms) <- trained)
      assert(BpeTokenizer.encodeWord(w, model.merges).toSeq == syms)
    val dec = BpeTokenizer.encodeWord("a😀b", model.merges)
      .mkString("").replace(EOW, "")
    assert(dec == "a😀b")
  }
}
