package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Dedup, Multimodal, Similarity}

/** Training-data-pipeline extension operators as named queries
  * (deduplication, similarity search, text analysis, multimodal plumbing).
  *
  * Oracle strategy: everything arithmetic (token counts, ratios, language
  * ID, Jaccard, cosine) is expressed in exact integer math or sequential
  * double folds that DuckDB reproduces bit-for-bit (validated: DuckDB's own
  * list_cosine_similarity computes in float and does NOT match — the
  * oracles below spell out the double math instead). Hash-based operators
  * (MinHash/SimHash/LSH — xxhash64 is Spark-native) are not SQL-expressible
  * → no oracle, driver records rows-only; their semantics are covered by
  * ScalaTest with constructed near-duplicates.
  */
object ExtensionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** documents ∪ mutated copies (id + 1M, first token dropped): a corpus
    * with guaranteed near-duplicate pairs, so near-dup queries emit
    * meaningful, deterministic rows on purely-random testdata. */
  private def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    docs.union(docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      array_join(slice(TF.tokens(col("text")), 2, 1000000), " ").as("text")))
  }

  private val enStop = TF.stopwords("en")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis ----------------------------------------------------
    "q_token_count" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TF.tokenCount(col("text")).as("n_tokens"),
          size(array_distinct(TF.tokens(col("text")))).as("n_unique_tokens"))
        .orderBy("doc_id")),

    "q_text_quality" -> ((s, dir) => {
      val qf = TF.qualityFeatures(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          qf.getField("n_chars").as("n_chars"),
          qf.getField("n_tokens").as("n_tokens"),
          qf.getField("chars_per_token").as("chars_per_token"),
          qf.getField("space_ratio").as("space_ratio"),
          qf.getField("digit_ratio").as("digit_ratio"),
          qf.getField("alpha_ratio").as("alpha_ratio"),
          qf.getField("en_stopword_ratio").as("en_stopword_ratio"))
        .orderBy("doc_id")
    }),

    "q_lang_id" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TF.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TF.fingerprint(col("text")).as("content_hash"),
          length(col("text")).as("n_chars"))
        .orderBy("doc_id")),

    // ---- deduplication ----------------------------------------------------
    "q_dedup_exact_docs" -> ((s, dir) =>
      Dedup.exactDupGroups(
        // duplicate corpus: every doc twice under distinct ids → every
        // group has exactly 2 copies and a deterministic min-id keeper
        t(s, dir, "documents").select("doc_id", "text").union(
          t(s, dir, "documents").select((col("doc_id") + 1000000L).as("doc_id"), col("text"))),
        "doc_id", "text")
        .orderBy("content_hash")),

    "q_jaccard_words" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), array_distinct(TF.tokens(col("text"))).as("toks"))
      d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          size(array_intersect(col("a.toks"), col("b.toks"))).as("n_shared"),
          size(col("a.toks")).as("sz_a"), size(col("b.toks")).as("sz_b"))
        .withColumn("jaccard", col("n_shared").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("n_shared")).cast(DoubleType))
        .select("id_a", "id_b", "n_shared", "jaccard")
        .orderBy("id_a", "id_b")
    }),

    // hash-based (rows-only): full MinHash→LSH→verify pipeline over the
    // constructed near-dup corpus; each original pairs with its mutation
    "q_minhash_near_dup" -> ((s, dir) =>
      Dedup.minhashNearDupPairs(docsWithNearDups(s, dir), "doc_id", "text",
          k = 32, bands = 8, shingleN = 3, minJaccard = 0.5)
        .orderBy("id_a", "id_b")),

    "q_simhash_near_dup" -> ((s, dir) =>
      Dedup.simhashNearDupPairs(docsWithNearDups(s, dir), "doc_id", "text",
          maxHamming = 6)
        .orderBy("id_a", "id_b")),

    "q_simhash" -> ((s, dir) =>
      Dedup.simhash(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // exact inverted-index n-gram Jaccard (no LSH approximation) over the
    // constructed near-dup corpus; rows-only (value verified in DedupSpec).
    // maxDocFreq stays at the operator's stop-shingle default: a shingle in
    // more than 1000 docs is boilerplate, and pruning it is what bounds the
    // hottest pair-generation key at any corpus size.
    "q_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(docsWithNearDups(s, dir), "doc_id", "text",
          shingleN = 3, minJaccard = 0.5)
        .orderBy("id_a", "id_b")),

    // embedding near-dup pairs via hyperplane LSH + exact cosine verify,
    // over embeddings ∪ exact copies (ids +100000) so pairs exist
    "q_embed_near_dup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = e.union(e.select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
      // 16 bits/band: 65k buckets keeps same-bucket pair counts linear-ish
      // in corpus size; identical vectors still always collide
      Similarity.embeddingNearDupPairs(planted, threshold = 0.999,
          bands = 8, bitsPerBand = 16)
        .orderBy("id_a", "id_b")
    }),

    // ---- similarity search ------------------------------------------------
    "q_embed_cosine" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = e.filter(col("vec_id") >= 5).select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      c.crossJoin(broadcast(q))
        .select(col("query_id"), col("neighbor_id"),
          VF.cosine(col("qv"), col("cv")).as("cosine"))
        .orderBy("query_id", "neighbor_id")
    }),

    "q_embed_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 20), e, k = 10)
        .orderBy("query_id", "rank")
    }),

    // rows-only: LSH ANN path (hash-bucketed candidates, exact rerank)
    "q_embed_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e.filter(col("vec_id") < 20), e, k = 10,
          bands = 8, bitsPerBand = 8)
        .orderBy("query_id", "rank")
    }),

    // ---- multimodal plumbing ---------------------------------------------
    "q_multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
      Multimodal.decodeFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"))
        .orderBy("media_id")
    })
  )

  private val enStopSql = enStop.map(w => s"'$w'").mkString("[", ", ", "]")
  private val tokensSql =
    """list_filter(string_split_regex(text, '\s+'), x -> x != '')"""

  val oracles: Map[String, String] = Map(
    "q_token_count" ->
      s"""SELECT doc_id, len($tokensSql) AS n_tokens, len(list_distinct($tokensSql)) AS n_unique_tokens FROM documents ORDER BY doc_id""",
    "q_text_quality" ->
      s"""WITH f AS (SELECT doc_id, text, length(text) AS n_chars, len($tokensSql) AS n_tokens, len(list_filter($tokensSql, x -> list_contains($enStopSql, x))) AS en_hits FROM documents) SELECT doc_id, n_chars, n_tokens, CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1) AS chars_per_token, CAST(n_chars - length(replace(text, ' ', '')) AS DOUBLE) / greatest(n_chars, 1) AS space_ratio, CAST(n_chars - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / greatest(n_chars, 1) AS digit_ratio, CAST(n_chars - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / greatest(n_chars, 1) AS alpha_ratio, CAST(en_hits AS DOUBLE) / greatest(n_tokens, 1) AS en_stopword_ratio FROM f ORDER BY doc_id""",
    "q_lang_id" -> {
      def hits(words: Seq[String]) = {
        val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter($tokensSql, x -> list_contains($lst, x))) AS DOUBLE) / greatest(len($tokensSql), 1)"
      }
      s"""WITH f AS (SELECT doc_id, ${hits(TF.stopwords("en"))} AS s_en, ${hits(TF.stopwords("es"))} AS s_es, ${hits(TF.stopwords("de"))} AS s_de, ${hits(TF.stopwords("fr"))} AS s_fr FROM documents) SELECT doc_id, CASE WHEN greatest(s_en, s_es, s_de, s_fr) <= 0 THEN 'und' WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en' WHEN s_es >= s_de AND s_es >= s_fr THEN 'es' WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS lang_pred FROM f ORDER BY doc_id"""
    },
    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS content_hash, length(text) AS n_chars FROM documents ORDER BY doc_id""",
    "q_dedup_exact_docs" ->
      """WITH u AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id + 1000000, text FROM documents) SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies FROM u GROUP BY 1 ORDER BY content_hash""",
    "q_jaccard_words" ->
      s"""WITH d AS (SELECT doc_id, list_distinct($tokensSql) AS toks FROM documents WHERE doc_id < 40) SELECT a.doc_id AS id_a, b.doc_id AS id_b, len(list_intersect(a.toks, b.toks)) AS n_shared, CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard FROM d a JOIN d b ON a.doc_id < b.doc_id ORDER BY id_a, id_b""",
    "q_embed_cosine" -> {
      def dotSql(x: String, y: String) =
        s"list_sum(list_transform(generate_series(1, len($x)), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
      s"""SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, ${dotSql("a.embedding", "b.embedding")} / nullif(sqrt(${dotSql("a.embedding", "a.embedding")}) * sqrt(${dotSql("b.embedding", "b.embedding")}), 0) AS cosine FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id >= 5 ORDER BY query_id, neighbor_id"""
    },
    "q_embed_topk" -> {
      def dotSql(x: String, y: String) =
        s"list_sum(list_transform(generate_series(1, len($x)), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
      s"""WITH sims AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, ${dotSql("a.embedding", "b.embedding")} / nullif(sqrt(${dotSql("a.embedding", "a.embedding")}) * sqrt(${dotSql("b.embedding", "b.embedding")}), 0) AS cosine FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND a.vec_id != b.vec_id), ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM sims) SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"""
    },
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'fake/blob' AS kind, octet_length(encode(text)) AS n_bytes, 1 + (octet_length(encode(text)) % 1024) AS width, 1 + (octet_length(encode(text)) % 768) AS height FROM documents ORDER BY media_id"""
  )
}
