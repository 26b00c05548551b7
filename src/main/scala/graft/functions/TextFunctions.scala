package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale training-data pipelines
  * (SURVEY.md §2e): tokenization, quality metrics, language ID, shingling,
  * fingerprints. All pure Catalyst expressions — no UDFs — so every
  * function distributes and stays inside whole-stage codegen.
  */
object TextFunctions {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count — [[tokens]]' size via the one-pass
    * [[TokenProfileExpr]] byte scan (r15): no token array, no interpreted
    * empty-filter lambda; PropertySpec pins equality with the
    * higher-order formulation.
    */
  def tokenCount(text: Column): Column =
    TokenSetExprs.tokenProfile(text, Seq.empty).getField("n_toks")

  /** BPE-ish sub-word segmentation: word pieces and standalone
    * punctuation/symbol runs, like the GPT-2 pre-tokenizer's coarse shape.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text)).cast(LongType)

  /** Punctuation characters per mille of total characters (integer metric:
    * exact, engine-portable — see SURVEY.md §6).
    */
  def punctPerMille(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\[\\]{}-]", ""))
    when(length(text) === 0, lit(0L))
      .otherwise(floor(punct.cast(LongType) * 1000 / length(text))).cast(LongType)
  }

  private val stopwordsEn = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "this", "be", "are")

  /** Stopwords per mille of tokens — a standard fluency signal. One-pass
    * token profile (r15): the former `filter(toks, array_contains(...))`
    * evaluated its lambda interpreted per TOKEN — the streaming quality
    * gate's measured per-document ceiling.
    */
  def stopwordPerMille(text: Column, stops: Seq[String] = stopwordsEn): Column = {
    val p = TokenSetExprs.tokenProfile(text, Seq(stops))
    val nToks = p.getField("n_toks")
    val nStop = p.getField("hits").getItem(0)
    when(nToks === 0L, lit(0L))
      .otherwise(floor(nStop * 1000 / nToks)).cast(LongType)
  }

  /** Mean token length per mille (×1000, integer) — length-quality signal. */
  def meanTokenLenPerMille(text: Column): Column = {
    val p = TokenSetExprs.tokenProfile(text, Seq.empty)
    val nToks = p.getField("n_toks")
    when(nToks === 0L, lit(0L))
      .otherwise(floor(p.getField("sum_len") * 1000 / nToks)).cast(LongType)
  }

  /** Composite quality heuristic in [0,1000]: penalizes very short docs,
    * punctuation floods, and stopword-free (unnatural) text.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast(LongType), lit(400L)) * 1000 / 400
    val punctPenalty = least(punctPerMille(text) * 2, lit(500L))
    val stopScore = least(stopwordPerMille(text) * 4, lit(300L))
    greatest(lit(0L),
      floor(lenScore * lit(0.5d) + stopScore * lit(0.5d)).cast(LongType) - punctPenalty)
  }

  // ------------------------------------------------------------ language ID

  private val langStops: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "que", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "pour", "dans", "avec", "une")
  )

  /** N-gram/stopword language-ID heuristic: CJK-codepoint share decides zh;
    * otherwise the language whose stopword profile matches most tokens wins,
    * `und` (undetermined) when nothing matches. Deterministic and
    * shuffle-free — a pure per-row expression.
    */
  def langId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    // all four language profiles score in ONE token-profile pass (r15);
    // alphabetical language order preserves the original tie-break
    // (strictly-greater keeps the earlier language, "und" at zero)
    val langs = langStops.toSeq.sortBy(_._1)
    val p = TokenSetExprs.tokenProfile(text, langs.map(_._2))
    val best = langs.zipWithIndex.foldLeft((lit("und"), lit(0L))) {
      case ((bl, bs), ((lang, _), i)) =>
        val s = p.getField("hits").getItem(i)
        (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }._1
    when(cjk * 5 > length(text), lit("zh")).otherwise(best)
  }

  // ---------------------------------------------------- shingles / hashing

  /** Word k-shingles: sliding windows of `k` consecutive tokens joined by a
    * single space. Sub-k docs yield their full token string as the only
    * shingle.
    */
  def wordShingles(text: Column, k: Int): Column =
    shinglesFromTokens(tokens(text), k)

  /** Shingles from an (ideally already-materialized) token-array column.
    * NOTE for pipeline authors: `toks` appears in the lambda body, so if it
    * is a derived expression rather than a materialized attribute, Spark's
    * interpreted higher-order functions re-evaluate it per element —
    * materialize tokens first (see Dedup.shingleHashes) on big data.
    */
  def shinglesFromTokens(toks: Column, k: Int): Column = {
    val idx = sequence(lit(0), greatest(size(toks) - k, lit(0)))
    array_distinct(transform(idx, i => array_join(slice(toks, i + 1, lit(k)), " ")))
  }

  /** Character n-grams of the lowercased, whitespace-squeezed text. */
  def charNgrams(text: Column, n: Int): Column =
    ngramsFromNormalized(normalizeWs(text), n)

  /** Lowercase + squeeze whitespace — the normalization under charNgrams
    * and contentHash.
    */
  def normalizeWs(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /** N-grams over already-normalized text. Like shinglesFromTokens, the
    * input appears in the lambda body — pass a materialized attribute on
    * big data (see Dedup.ngramJaccardPairs).
    */
  def ngramsFromNormalized(s: Column, n: Int): Column = {
    val idx = sequence(lit(1), greatest(length(s) - (n - 1), lit(1)))
    array_distinct(transform(idx, i => s.substr(i, lit(n))))
  }

  /** 64-bit hashes of each element of a string array. */
  def hashArray(arr: Column): Column = transform(arr, s => xxhash64(s))

  /** Winnowing-style document fingerprint: the `take` smallest shingle
    * hashes (a bottom-k sketch of the shingle set — the rolling-hash
    * fingerprint family from Schleimer et al., SIGMOD'03). Tokenize →
    * shingle → hash → sort runs as one fused codegen pass per row
    * (WordShingleHashExpr), bit-identical to the HOF formulation
    * `slice(array_sort(hashArray(wordShingles(text, k))), 1, take)`.
    */
  def fingerprint(text: Column, k: Int = 3, take: Int = 8): Column =
    slice(ShingleHash.wordShingleHashes(text, k, sorted = true), 1, take)

  /** Engine-replayable variant of [[fingerprint]]: bottom-`take` md5 hex
    * digests of the distinct word `k`-shingles. Winnowing only needs a
    * uniform hash, so the md5 basis keeps the sketch's guarantees while
    * letting an independent SQL engine (the DuckDB oracle) reproduce the
    * digest bit-for-bit — xxhash64 exists in no other engine. Still pure
    * per-row codegen'd builtins, zero shuffles; prefer [[fingerprint]]
    * when raw throughput matters more than replayability.
    */
  def fingerprintHex(text: Column, k: Int = 3, take: Int = 8): Column = {
    val toks = tokens(text)
    // sub-k documents sketch as ONE whole-run shingle — the same rule the
    // fused xxhash64 path applies (ShingleHashExprs.wordShingleHashes:
    // n = max(len - k, 0) + 1), so the two 'equivalent' fingerprints agree
    // on short docs instead of collapsing every sub-k doc to one empty key
    val shingles = when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
    slice(array_sort(array_distinct(transform(shingles, s => md5(s)))), 1, take)
  }

  /** Single 64-bit content fingerprint of normalized text. */
  def contentHash(text: Column): Column = xxhash64(normalizeWs(text))

  /** 256-bit content digest of the same normalization — for anti-join keys
    * where a 64-bit collision would silently DROP a non-duplicate document
    * (crossDedup at billions of reference docs). Grouping keys can live
    * with 64 bits (a collision only merges two count buckets); deletion
    * keys cannot.
    */
  def contentDigest(text: Column): Column = sha2(normalizeWs(text), 256)

  /** Strip HTML/XML markup from crawled text: tags become spaces, the five
    * predefined character entities unescape, whitespace collapses. The tag
    * pattern is deliberately RE2-compatible (no backtracking constructs) so
    * the same regex runs identically in every engine; `&amp;` unescapes
    * LAST so `&amp;lt;` correctly yields the literal `&lt;`.
    */
  def stripMarkup(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Heuristic sentence splitter: terminal punctuation runs followed by
    * whitespace end a sentence (the delimiter is consumed; a trailing
    * terminator with no following whitespace stays attached). RE2-portable
    * pattern — sentence-level dedup/quality passes need the same split on
    * every engine that touches the corpus.
    */
  def splitSentences(text: Column): Column =
    split(text, "[.!?]+\\s+")

  // ------------------------------------------------------------- scrubbing

  /** Email redaction (PII scrub pass for training corpora). The pattern is
    * deliberately RE2-compatible so the same regex runs in every engine.
    */
  def redactEmails(text: Column, repl: String = "<EMAIL>"): Column =
    regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", repl)

  /** URL redaction. */
  def redactUrls(text: Column, repl: String = "<URL>"): Column =
    regexp_replace(text, "https?://[^\\s]+", repl)

  /** IPv4 redaction. */
  def redactIps(text: Column, repl: String = "<IP>"): Column =
    regexp_replace(text, "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", repl)

  /** Phone-number redaction (international-ish shapes, conservative). */
  def redactPhones(text: Column, repl: String = "<PHONE>"): Column =
    regexp_replace(text, "\\+?[0-9][0-9()\\-. ]{7,}[0-9]", repl)

  /** Full PII scrub: emails → urls → ips → phones, in that order. */
  def scrubPii(text: Column): Column =
    redactPhones(redactIps(redactUrls(redactEmails(text))))

  /** Word bigrams ("a b" strings) — building block for repetition metrics.
    * Like shinglesFromTokens, pass a materialized token attribute at scale.
    */
  def bigramsFromTokens(toks: Column): Column =
    transform(sequence(lit(1), greatest(size(toks) - 1, lit(0))),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))

  /** URL canonicalization (the CommonCrawl-style dedup key): strip the
    * fragment and query string, lowercase scheme and host ONLY (paths are
    * case-significant per RFC 3986), and drop one trailing slash. Pure
    * per-row string expression — zero-shuffle, codegen'd builtins.
    * Scheme-less input (no "://") passes through unchanged after the
    * fragment/query strip — without the guard both substring_index calls
    * return the whole string and the value would double ("a.b/x://a.b/x").
    */
  def canonicalizeUrl(url: Column): Column = {
    val stripped = substring_index(substring_index(url, "#", 1), "?", 1)
    val proto = substring_index(stripped, "://", 1)
    // everything after the FIRST "://" — substring_index(.., -1) splits on
    // the LAST occurrence, so an archive/redirect URL with an embedded
    // scheme ("http://archive.org/web/https://x.com/p") would collapse to
    // the embedded host and dedup under the wrong key (r8 review; the
    // DuckDB oracle computes the first-occurrence form)
    val rest = stripped.substr(locate("://", stripped) + lit(3),
      length(stripped))
    val host = substring_index(rest, "/", 1)
    val path = regexp_replace(rest.substr(length(host) + lit(1), length(rest)),
      "/$", "")
    when(stripped.contains("://"),
      concat(lower(proto), lit("://"), lower(host), path))
      .otherwise(stripped)
  }
}
