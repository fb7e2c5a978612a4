package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting.
  *
  * All pure Catalyst expressions (codegen'd, no UDFs) so they stay inside
  * whole-stage codegen on a 100 TB scan. The reference has no text-analysis
  * surface (SURVEY.md §2.9) — these generalize its regex/split vocabulary
  * (eggv/process.py:125-175) to the LLM-pipeline domain.
  */
object TextFunctions {

  /** Whitespace tokenizer; drops empty tokens (leading/trailing/multiple
    * spaces). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Token count over whitespace tokenization. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: count of maximal runs of word chars, digits, or
    * single punctuation — a cheap, deterministic stand-in for a real BPE
    * vocab count (ratio vs whitespace tokens ~ tokens-per-word). */
  def bpeTokenCount(text: Column): Column =
    size(filter(split(text, """(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"""),
      // keep pieces containing any non-whitespace char: trim() strips only
      // ' ' (0x20), so tab/newline pieces would be miscounted as tokens
      t => t.rlike("\\S")))

  /** Stopword sets for the n-gram/stopword language heuristic. Tiny on
    * purpose: language ID at pipeline scale wants a broadcastable constant,
    * not a model. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "von", "sie", "ist", "des", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "que")
  )

  /** Count of tokens that appear in `words` (multiset count — each token
    * occurrence counts). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  /** Stopword-ratio language score for one language. */
  def langScore(text: Column, lang: String): Column =
    langScoreFromTokens(tokens(text), lang)

  /** `langScore` over a pre-staged token array. */
  def langScoreFromTokens(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(stopwords(lang)))).cast(DoubleType) /
      greatest(size(toks), lit(1)).cast(DoubleType)

  /** Argmax language by stopword hit ratio; ties resolve in `langs` order;
    * "und" (undetermined) when nothing scores above zero. Hot paths should
    * stage the token array and use `langIdFromTokens`. */
  def langId(text: Column, langs: Seq[String] = Seq("en", "es", "de", "fr")): Column =
    langIdFromTokens(tokens(text), langs)

  /** `langId` over a pre-staged token array. The argmax is ONE array_max
    * over (score, −position, lang) structs — struct ordering gives
    * higher score first, then earlier `langs` position on ties — so each
    * language's score expression appears exactly once in the plan. The
    * earlier pairwise when-reduce substituted every prior struct into
    * each comparison branch, duplicating the scores ~2^n-fold (measured:
    * ~50 tokenizer evaluations per row for 4 languages).
    *
    * Two deliberate structural properties (both measured, both 10×-class):
    *  - the "und" fallback is a SENTINEL struct inside the same array_max
    *    (score 0, ord above every language, so any positive score beats
    *    it and an all-zero row loses to it) instead of a CASE WHEN that
    *    references the argmax twice — lambda-bearing expressions sit
    *    outside both codegen subexpression elimination and CollapseProject
    *    cost checks, so a second reference genuinely re-runs every score;
    *  - the result is wrapped non-nullable (coalesce with the sentinel
    *    value), because a downstream join or filter on the predicted
    *    language otherwise INFERS IsNotNull(lang_pred) and pushes it below
    *    the token-staging Project, substituting the alias and inlining
    *    ~16 tokenizer runs per row into a scan-side Filter (measured:
    *    35 s → 1 s at sf0.1 on the per-language quality floor). */
  def langIdFromTokens(toks: Column,
      langs: Seq[String] = Seq("en", "es", "de", "fr")): Column = {
    val sentinel = struct(lit(0.0).as("score"), lit(1).as("ord"), lit("und").as("lang"))
    val best = array_max(array(sentinel +: langs.zipWithIndex.map { case (l, i) =>
      struct(langScoreFromTokens(toks, l).as("score"),
        lit(-i).as("ord"), lit(l).as("lang"))
    }: _*))
    coalesce(best.getField("lang"), lit("und"))
  }

  /** Quality-score feature struct: char/token counts, mean word length,
    * whitespace/digit/alpha ratios, stopword density. All exact integer
    * arithmetic until the final double divisions, so results are
    * reproducible across engines. */
  def qualityFeatures(text: Column): Column = {
    val nChars = length(text)
    val nonEmpty = greatest(nChars, lit(1)).cast(DoubleType)
    val nTokens = tokenCount(text)
    val nSpaces = nChars - length(regexp_replace(text, " ", ""))
    val nDigits = nChars - length(regexp_replace(text, "[0-9]", ""))
    val nAlpha = nChars - length(regexp_replace(text, "[A-Za-z]", ""))
    struct(
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      (nChars.cast(DoubleType) / greatest(nTokens, lit(1)).cast(DoubleType)).as("chars_per_token"),
      (nSpaces.cast(DoubleType) / nonEmpty).as("space_ratio"),
      (nDigits.cast(DoubleType) / nonEmpty).as("digit_ratio"),
      (nAlpha.cast(DoubleType) / nonEmpty).as("alpha_ratio"),
      langScore(text, "en").as("en_stopword_ratio"))
  }

  /** Gopher-rules document quality battery (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * Appendix A1.1 — the heuristic filter set RedPajama/Dolma reuse),
    * as one exact struct of the per-doc signals plus the composed
    * `keep` verdict:
    *  - token count in [minTokens, maxTokens] (Gopher: 50..100k words)
    *  - mean token length in [3, 10] chars
    *  - symbol tokens (no alphanumeric char at all) ≤ 10% of tokens
    *  - tokens containing an alphabetic char ≥ 80% (Gopher's
    *    word-level alpha requirement)
    *  - ≥ 2 occurrences of the 8 Gopher stop words (the "is this prose"
    *    probe: the, be, to, of, and, that, have, with)
    * Integer counts with final double divisions only, replayable
    * verbatim in oracle SQL. All thresholds are the published defaults;
    * callers tune per corpus. */
  def gopherQuality(text: Column,
      minTokens: Long = 50L, maxTokens: Long = 100000L): Column =
    gopherQualityFromTokens(tokens(text), minTokens, maxTokens)

  /** `gopherQuality` over a pre-staged token array. Hot paths should
    * materialize the array once (`withColumn("toks", TF.tokens(...))`)
    * and call this form: the battery reads the array five times, and
    * lambda-bearing expressions sit outside Catalyst subexpression
    * elimination, so the text-form would re-tokenize per signal. */
  def gopherQualityFromTokens(toks: Column,
      minTokens: Long = 50L, maxTokens: Long = 100000L): Column = {
    val nTokens = size(toks).cast(LongType)
    val nTokD = greatest(nTokens, lit(1L)).cast(DoubleType)
    val meanLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast(DoubleType) / nTokD
    val symbolRatio = size(filter(toks, t => !t.rlike("[A-Za-z0-9]")))
      .cast(DoubleType) / nTokD
    val alphaRatio = size(filter(toks, t => t.rlike("[A-Za-z]")))
      .cast(DoubleType) / nTokD
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = size(filter(toks, t => t.isInCollection(gopherStops)))
      .cast(LongType)
    struct(
      nTokens.as("n_tokens"),
      meanLen.as("mean_token_len"),
      symbolRatio.as("symbol_ratio"),
      alphaRatio.as("alpha_ratio"),
      stopHits.as("stop_hits"),
      (nTokens >= minTokens && nTokens <= maxTokens &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        symbolRatio <= 0.1 && alphaRatio >= 0.8 &&
        stopHits >= 2L).as("keep"))
  }

  /** CCNet-style normalization for dedup keys: lowercase, strip
    * punctuation/symbols to spaces, collapse whitespace, trim — so
    * case/punctuation/spacing variants of the same content share one
    * exact-dedup key. ASCII fold ([a-z0-9] + whitespace): right for
    * Latin-script corpora; CJK text needs its own normalizer (these
    * classes would strip it entirely). Pure codegen'd regexp chain,
    * replayed verbatim in oracle SQL. */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** Exact-content fingerprint (md5 hex — portable across engines). */
  def fingerprint(text: Column): Column = md5(text)

  /** 64-bit rolling-style content fingerprint from xxhash64 (engine-native,
    * faster than md5; not oracle-portable). */
  def fingerprint64(text: Column): Column = xxhash64(text)

  // ---- PII redaction ------------------------------------------------------
  // Patterns are RE2-compatible (no lookaround, no backreferences) so any
  // engine pairing — Spark's java.util.regex, an RE2-based oracle, a
  // downstream Go/Rust service — matches the same spans.

  /** Email addresses (practical form, not full RFC 5322). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded; no range check — redaction favors
    * recall over precision). */
  val ipv4Pattern = "\\b([0-9]{1,3}\\.)([0-9]{1,3}\\.)([0-9]{1,3})\\.([0-9]{1,3})\\b"

  /** International-prefixed phone numbers: +, then ≥8 phone chars ending
    * in a digit. The leading '+' anchor keeps false positives (ids, dates,
    * quantities) out; bare national formats are too ambiguous to redact
    * blindly at corpus scale. */
  val phonePattern = "\\+[0-9][0-9 ()-]{6,}[0-9]"

  /** Redact emails → `<EMAIL>`, IPv4s → `<IP>`, phones → `<PHONE>`,
    * in that fixed order (replacement text contains no digits, so later
    * passes can't re-match inside earlier redactions). Codegen'd
    * regexp_replace chain — no UDF. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  // ---- HTML text extraction ----------------------------------------------

  /** Strip HTML to text — the extraction step between a full-WARC
    * `text/html` response and the documents table (WET arrives
    * pre-extracted; raw crawl archives don't). A regexp-replace chain,
    * codegen'd, RE2-compatible (inline `(?i)`/`(?s)` flags, non-greedy
    * quantifiers, no lookaround/backrefs) so the DuckDB oracle replays
    * it verbatim:
    *  1. `<script>`/`<style>` elements drop wholesale, content included;
    *  2. `<br>` and block-level closers become newlines;
    *  3. every remaining tag deletes to a space;
    *  4. the ubiquitous entities decode (`&amp;` LAST, the standard
    *     single-pass order, so it cannot fabricate new entities);
    *  5. horizontal whitespace collapses, newlines shed flanking spaces,
    *     ≥3 newlines fold to a paragraph break, edges trim.
    * A text EXTRACTOR, not an HTML parser: malformed nesting degrades to
    * extra whitespace, never to silently dropped text. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)\\b[^>]*>.*?</(script|style)>", " ")
    val withBreaks = regexp_replace(noScript,
      "(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol)\\b[^>]*>", "\n")
    val noTags = regexp_replace(withBreaks, "(?s)<[^>]*>", " ")
    val decoded =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(noTags, "&lt;", "<"),
                "&gt;", ">"),
              "&quot;", "\""),
            "&#39;", "'"),
          "&nbsp;", " "),
        "&amp;", "&")
    val collapsed = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val tidyBreaks = regexp_replace(collapsed, " ?\\n ?", "\n")
    val folded = regexp_replace(tidyBreaks, "\\n{3,}", "\n\n")
    trim(regexp_replace(folded, "^\\n+|\\n+$", ""))
  }

  /** Page-level HTML metadata as a struct — `title`, `description`
    * (the `<meta name="description">` content), and `canonical` (the
    * `<link rel="canonical">` href): the curation signals a crawl
    * pipeline filters and dedups on BEFORE stripping body text. A
    * codegen'd regexp chain like [[htmlToText]] (RE2-compatible —
    * inline flags, non-greedy, no lookaround), so a DuckDB oracle
    * replays it verbatim; title whitespace collapses and the standard
    * entities decode (titles are rendered text), attribute values stay
    * verbatim (they are URLs/content attributes, not rendered text).
    * Absent elements are empty strings — absence, not null, so the
    * struct compares exactly. */
  def htmlMeta(html: Column): Column = {
    val title = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    val decodedTitle =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(title, "&lt;", "<"),
                "&gt;", ">"),
              "&quot;", "\""),
            "&#39;", "'"),
          "&nbsp;", " "),
        "&amp;", "&")
    val tidyTitle = trim(regexp_replace(decodedTitle, "[ \\t\\r\\n]+", " "))
    val description = regexp_extract(html,
      "(?is)<meta\\s[^>]*name\\s*=\\s*[\"']description[\"'][^>]*" +
        "content\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    val canonical = regexp_extract(html,
      "(?is)<link\\s[^>]*rel\\s*=\\s*[\"']canonical[\"'][^>]*" +
        "href\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    struct(tidyTitle.as("title"), description.as("description"),
      canonical.as("canonical"))
  }

  /** Outgoing links of an HTML page as an array of (href, anchor)
    * structs — the frontier-seeding / anchor-text-corpus signal
    * (anchor text is what the web calls the target page; a classic
    * relevance corpus). Two aligned `regexp_extract_all` passes over
    * the same double-quoted `<a href="...">...</a>` pattern zipped
    * positionally — codegen'd, RE2-compatible, DuckDB-replayable. The
    * anchor side is tag-stripped and whitespace-collapsed (it renders
    * as text); hrefs stay verbatim. */
  def htmlLinks(html: Column): Column = {
    val pat = lit("(?is)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>")
    val hrefs = regexp_extract_all(html, pat, lit(1))
    val anchors = regexp_extract_all(html, pat, lit(2))
    val cleanAnchors = transform(anchors, a =>
      trim(regexp_replace(
        regexp_replace(a, "(?s)<[^>]*>", " "), "[ \\t\\r\\n]+", " ")))
    arrays_zip(hrefs.as("href"), cleanAnchors.as("anchor"))
  }

  /** Unicode NFC normalization (canonical composition) — the
    * text-identity pass before hashing/dedup/tokenization; see
    * [[graft.expressions.NfcNormalize]]. */
  def normalizeNfc(text: Column): Column =
    graft.expressions.NativeUnicode.nfcNormalize(text)

  /** `<link rel="alternate" hreflang="…" href="…">` clusters — the
    * multilingual-site signal a corpus builder groups on (one logical
    * document, N language editions; `x-default` marks the selector
    * page). Both attribute orders parse (hreflang-first and
    * href-first, rel leading — the forms generators emit); output is
    * an array of (hreflang, href) structs, hrefs verbatim. Two aligned
    * `regexp_extract_all` zips per order, codegen'd, RE2-compatible,
    * DuckDB-replayable like every html kernel here. */
  def htmlAlternates(html: Column): Column = {
    val p1 = lit("(?is)<link\\s[^>]*rel\\s*=\\s*\"alternate\"[^>]*" +
      "hreflang\\s*=\\s*\"([^\"]*)\"[^>]*href\\s*=\\s*\"([^\"]*)\"")
    val p2 = lit("(?is)<link\\s[^>]*rel\\s*=\\s*\"alternate\"[^>]*" +
      "href\\s*=\\s*\"([^\"]*)\"[^>]*hreflang\\s*=\\s*\"([^\"]*)\"")
    concat(
      arrays_zip(regexp_extract_all(html, p1, lit(1)).as("hreflang"),
        regexp_extract_all(html, p1, lit(2)).as("href")),
      arrays_zip(regexp_extract_all(html, p2, lit(2)).as("hreflang"),
        regexp_extract_all(html, p2, lit(1)).as("href")))
  }

  /** Usage-rights and crawl-directive signals of an HTML page — the
    * filter surface a training-data pipeline applies BEFORE any text
    * work: `robots` (the `<meta name="robots">` content, lowercased —
    * directive tokens are case-insensitive), the four directive flags
    * a curation policy keys on (`noindex`/`nofollow`/`noarchive`/
    * `noai`, token-boundary matched so `noindexing` does not trip),
    * `license_href` (the `rel="license"` target, the `<link>` form
    * preferred over the in-body `<a>` form), `license_id` (Creative
    * Commons hrefs normalized to an SPDX-shaped id — `CC-BY-SA-4.0`,
    * `CC0-1.0`, `PDM-1.0` — empty for absent or non-CC targets), and
    * `tdm_reservation` (the W3C TDM-Rep opt-out meta, verbatim).
    * Codegen'd regexp chain like [[htmlMeta]] (RE2-compatible,
    * DuckDB-replayable); absence is the empty string / false, never
    * null, so the struct compares exactly. */
  def htmlRights(html: Column): Column = {
    def metaContent(name: String): Column = regexp_extract(html,
      "(?is)<meta\\s[^>]*name\\s*=\\s*[\"']" + name + "[\"'][^>]*" +
        "content\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    val robots = lower(metaContent("robots"))
    def relLicense(elem: String): Column = regexp_extract(html,
      "(?is)<" + elem + "\\s[^>]*rel\\s*=\\s*[\"']license[\"'][^>]*" +
        "href\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    val linkHref = relLicense("link")
    val aHref = relLicense("a")
    val href = when(linkHref =!= "", linkHref).otherwise(aHref)
    val ccPat = "creativecommons\\.org/licenses/([a-z][a-z-]*)/([0-9]\\.[0-9])"
    val ccFam = regexp_extract(href, ccPat, 1)
    val licenseId =
      when(ccFam =!= "",
        concat_ws("-", lit("CC"), upper(ccFam),
          regexp_extract(href, ccPat, 2)))
        .when(href.rlike("creativecommons\\.org/publicdomain/zero/1\\.0"),
          lit("CC0-1.0"))
        .when(href.rlike("creativecommons\\.org/publicdomain/mark/1\\.0"),
          lit("PDM-1.0"))
        .otherwise(lit(""))
    def directive(name: String): Column =
      robots.rlike("(^|[ ,])" + name + "($|[ ,])")
    struct(robots.as("robots"),
      directive("noindex").as("noindex"),
      directive("nofollow").as("nofollow"),
      directive("noarchive").as("noarchive"),
      directive("noai").as("noai"),
      href.as("license_href"), licenseId.as("license_id"),
      metaContent("tdm-reservation").as("tdm_reservation"))
  }

  /** Pre-redaction PII hit counts per kind (audit signal: which documents
    * carry how much PII, independent of the rewrite). */
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(emailPattern), lit(0))).as("n_emails"),
    size(regexp_extract_all(text, lit(ipv4Pattern), lit(0))).as("n_ips"),
    size(regexp_extract_all(text, lit(phonePattern), lit(0))).as("n_phones"))

  /** Word n-gram shingles (n consecutive tokens joined by single spaces),
    * distinct. A doc with fewer than n tokens yields its full token join as
    * the single shingle so no document silently drops out of dedup.
    *
    * Tokenizes internally — `toks` is referenced several times, so callers
    * on a hot path should materialize the token array themselves and use
    * `shinglesFromTokens` (lambda-bearing expressions defeat Catalyst
    * subexpression elimination; a nested tokens() here is re-split per
    * reference). */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** ALL word n-grams in order (duplicates kept — the multiset the
    * repetition-ratio quality signal needs; `shinglesFromTokens` is the
    * distinct-set variant for Jaccard/MinHash). ≤ n tokens → one
    * whole-document gram, mirroring the shingle fallback. Pass a
    * MATERIALIZED token-array attribute, not a nested expression. */
  def ngramsAll(toks: Column, n: Int): Column = {
    val joined = array_join(toks, " ")
    val count = greatest(size(toks) - lit(n - 1), lit(1))
    when(size(toks) <= n, array(joined)).otherwise(
      transform(sequence(lit(0), count - 1),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** Same, from a MATERIALIZED token-array column (pass an attribute, not
    * a nested expression). */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val joined = array_join(toks, " ")
    val count = greatest(size(toks) - lit(n - 1), lit(1))
    when(size(toks) <= n, array(joined)).otherwise(
      array_distinct(transform(sequence(lit(0), count - 1),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
  }

  /** 64-bit shingle hashes from a token-hash array column, without
    * building shingle strings: each shingle hash is the hash of an n-long
    * slice of the token-hash array (distinct, keep-first order; ≤ n tokens
    * → one whole-array hash). Native codegen'd kernel — bit-identical to
    * the built-in `array_distinct(transform(sequence, i =>
    * xxhash64(slice(th, i+1, n))))` formulation it replaces (parity test
    * in TextFunctionsSpec), minus the interpreted lambda evaluation. */
  def shingleHashesFrom(th: Column, n: Int): Column =
    graft.expressions.NativeText.shingleHashes(th, n)

  /** Token-hash array (one xxhash64 per whitespace token). Native kernel:
    * hashes each token's byte slice in place — no per-token string
    * allocation, no interpreted lambdas; bit-identical to
    * `transform(tokens(text), xxhash64)` (parity test). */
  def tokenHashes(text: Column): Column =
    graft.expressions.NativeText.tokenHashes(text)

  /** Mojibake repair: UTF-8 text damaged by a wrong cp1252/latin-1
    * decode is exactly invertible — re-encode under cp1252, strictly
    * re-decode as UTF-8, accept only when valid AND changed (healthy
    * text passes through; two-round cap heals double damage). Native
    * codegen'd kernel with an all-ASCII fast path
    * ([[graft.expressions.MojibakeKernels]]). */
  def fixMojibake(text: Column): Column =
    graft.expressions.NativeMojibake.fixMojibake(text)

  /** Writing-system profile (dominant script, dominance ratio, script
    * count) via the JDK's Unicode script property — the multilingual
    * routing signal in front of any per-language pipeline. Codegen'd
    * native kernel ([[graft.expressions.ScriptKernels]]). */
  def scriptProfile(text: Column): Column =
    graft.expressions.NativeScript.scriptProfile(text)

  /** Encoding-damage counters — the complement of [[fixMojibake]] for
    * damage that is NOT invertible: U+FFFD replacement characters (a
    * decoder already gave up) and C0 control bytes other than
    * tab/newline/CR (binary junk in a "text" payload). `clean` is the
    * zero-damage verdict a curation policy keys on. Pure codegen'd
    * length/replace arithmetic, engine-replayable. */
  def encodingQuality(text: Column): Column = {
    val n = length(text)
    val nRepl = n - length(regexp_replace(text, "�", ""))
    val nCtrl = n - length(regexp_replace(text,
      "[\u0000-\u0008\u000B\u000C\u000E-\u001F]", ""))
    struct(nRepl.as("n_replacement"), nCtrl.as("n_control"),
      (nRepl + nCtrl === 0).as("clean"))
  }

  /** Intra-document navigation/boilerplate line removal — the
    * line-level rule battery of the RefinedWeb recipe (Penedo et al.
    * 2023 §3.1 line-wise filtering; the per-line complement of the
    * corpus-frequency removal `CorpusPipeline.curate` already runs):
    * a line DROPS when it is (a) empty after trim, (b) caps-dominant —
    * uppercase > 60% of its ≥4 alphabetic chars (nav bars, section
    * headers), (c) a short bullet/enumeration item (≤3 tokens behind a
    * `-`/`*`/`•`/`1.`-style prefix), or (d) a stray ≤2-token fragment
    * with no terminal punctuation ("Read more", "Copyright"). Ratios
    * are integer cross-multiplications (`upper·10 > alpha·6`), never
    * doubles, so the verdicts replay bit-exactly in any engine. Pure
    * higher-order-function plan (split → filter → array_join), fully
    * codegen'd, zero UDFs — a narrow map at any corpus size. */
  def dropNavLines(text: Column): Column = {
    val kept = filter(split(text, "\n"), l => {
      val t = trim(l)
      val alpha = length(regexp_replace(t, "[^A-Za-z]", ""))
      val upper = length(regexp_replace(t, "[^A-Z]", ""))
      val ntok = size(split(t, " +"))
      val terminal = t.rlike("[.!?\"”]$")
      val bullet = t.rlike("^([-*•]|[0-9]+[.)]) ")
      (t =!= "") &&
        !(upper * lit(10) > alpha * lit(6) && alpha >= 4) &&
        !(bullet && ntok <= 3) &&
        !(ntok <= 2 && !terminal)
    })
    array_join(kept, "\n")
  }
}
