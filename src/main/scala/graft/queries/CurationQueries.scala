package graft.queries

import graft.Tables
import graft.functions.{Bpe, ShingleHash}
import graft.functions.TextFunctions.{qualityScore, stripMarkup, tokenCount}
import graft.operators.{Corpus, Dedup, Embeddings}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation surfaces added late in round 5: heavy-hitter n-grams,
  * an inverted index, per-row-weight deterministic sampling, cross-document
  * duplicated-span coverage, and fixed-point embedding centroids — each with
  * an exact DuckDB oracle.
  */
object CurationQueries {

  // ------------------------------------------------------- d_top_ngrams
  // Corpus-wide top-20 word bigrams (boilerplate/template detection). Ties
  // break on the n-gram text so the cutoff is deterministic; the tail is
  // TakeOrderedAndProject, never a global sort.
  private def dTopNgrams(spark: SparkSession, dir: String): DataFrame =
    Corpus.topNgrams(Tables.documents(spark, dir), "text", n = 2, k = 20)

  private val dTopNgramsSql =
    """WITH t AS (
      | SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
      | FROM documents),
      |g AS (
      | SELECT u.bg FROM t,
      |  UNNEST(list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' '))) AS u(bg)
      | WHERE len(toks) >= 2)
      |SELECT bg AS ngram, COUNT(*) AS cnt FROM g
      |GROUP BY bg ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin

  // --------------------------------------------------- d_inverted_index
  // token → document frequency + sorted posting list, hapaxes and
  // stop-word-frequency terms dropped (df bounds are part of the operator:
  // an uncapped posting list for "the" is a single monster row at scale).
  private def dInvertedIndex(spark: SparkSession, dir: String): DataFrame =
    Corpus.invertedIndex(Tables.documents(spark, dir), "doc_id", "text",
      minDf = 50L, maxDf = 400L)

  private val dInvertedIndexSql =
    """WITH tok AS (
      | SELECT DISTINCT doc_id, t AS token FROM (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
      |  FROM documents)
      | WHERE length(t) >= 3)
      |SELECT token, COUNT(*) AS df,
      | string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      |FROM tok GROUP BY token
      |HAVING COUNT(*) >= 50 AND COUNT(*) <= 400""".stripMargin

  // -------------------------------------------------- d_weighted_sample
  // Per-row-weight Bernoulli sampling, deterministically: longer documents
  // keep with higher probability (the length-proportional thinning a
  // token-budgeted mixture uses). Same Knuth multiplicative hash as
  // d_stratified_sample, so the selected row set is engine-, run-, and
  // partitioning-independent.
  private def dWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val perMille = least(expr("n_chars div 2"), lit(900L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .filter(Corpus.hashModKeep(col("doc_id"), perMille))
  }

  private val dWeightedSampleSql =
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE (((doc_id % 1000003 + 1000003) % 1000003 * 2654435761 % 1000003 + 1000003) % 1000003) % 1000 < least(n_chars // 2, 900)""".stripMargin

  // ------------------------------------------------- d_substring_dedup
  // Cross-document duplicated-span coverage (the substring-level dedup
  // signal): per document, how many word 5-shingle positions are covered by
  // a span occurring in ≥2 documents. Every 7th document gets a planted
  // boilerplate sentence (identically in the oracle) so shared spans exist
  // by construction; the operator hashes spans map-side and never shuffles
  // text.
  private val plantedFooter = " subscribe to our newsletter for updates today"

  private def dSubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(plantedFooter)))
        .otherwise(col("text")).as("text"))
    Dedup.duplicatedSpanCoverage(docs, "text", "doc_id", k = 5)
  }

  private val dSubstringDedupSql =
    """WITH d AS (
      | SELECT doc_id, CASE WHEN doc_id % 7 = 0
      |  THEN text || ' subscribe to our newsletter for updates today'
      |  ELSE text END AS text
      | FROM documents),
      |t AS (
      | SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
      | FROM d),
      |sp AS (
      | SELECT doc_id, u.g FROM t,
      |  UNNEST(list_transform(range(1, len(toks) - 3), i -> array_to_string(toks[i:i+4], ' '))) AS u(g)
      | WHERE len(toks) >= 5),
      |f AS (SELECT g, COUNT(DISTINCT doc_id) AS ndocs FROM sp GROUP BY g)
      |SELECT doc_id, COUNT(*) AS n_spans,
      | CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
      | CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) * 1000 // COUNT(*) AS BIGINT) AS dup_pm
      |FROM sp JOIN f USING (g) GROUP BY doc_id""".stripMargin

  // ------------------------------------------------ d_substring_rewrite
  // Substring-dedup REWRITE: the span-REMOVED corpus (Lee et al. ACL'22's
  // actual output, where d_substring_dedup is only the signal). Same
  // planted footer as d_substring_dedup so cross-document duplicated spans
  // exist by construction; every duplicated 5-shingle occurrence except the
  // corpus-wide (doc_id, pos)-first one is removed, and tokens covered by a
  // removed span drop. The oracle replays keep/drop on span TEXT (the
  // operator's 8-byte hashes are a pure grouping device).
  private def dSubstringRewrite(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(plantedFooter)))
        .otherwise(col("text")).as("text"))
    Dedup.removeDuplicatedSpans(docs, "text", "doc_id", k = 5)
  }

  private val dSubstringRewriteSql =
    """WITH d AS (
      | SELECT doc_id, CASE WHEN doc_id % 7 = 0
      |  THEN text || ' subscribe to our newsletter for updates today'
      |  ELSE text END AS text
      | FROM documents),
      |t AS (
      | SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
      | FROM d),
      |tok AS (
      | SELECT doc_id, CAST(u.i AS BIGINT) AS pos, toks[CAST(u.i + 1 AS INT)] AS tok
      | FROM t, UNNEST(range(0, len(toks))) AS u(i)),
      |sp AS (
      | SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
      |  array_to_string(toks[CAST(u.i + 1 AS INT):CAST(u.i + 5 AS INT)], ' ') AS g
      | FROM t, UNNEST(range(0, len(toks) - 4)) AS u(i)
      | WHERE len(toks) >= 5),
      |r AS (
      | SELECT doc_id, pos,
      |  COUNT(*) OVER (PARTITION BY g) AS cnt,
      |  ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
      | FROM sp),
      |cov AS (
      | SELECT DISTINCT doc_id, pos + u.o AS cpos
      | FROM r, UNNEST(range(0, 5)) AS u(o)
      | WHERE cnt >= 2 AND rn > 1),
      |kept AS (
      | SELECT tok.doc_id, tok.pos, tok.tok
      | FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.cpos
      | WHERE cov.cpos IS NULL),
      |agg AS (
      | SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
      | FROM kept GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(agg.clean_text, '') AS clean_text
      |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin

  // ------------------------------------------------- d_embed_centroid
  // Per-label embedding centroids in fixed point: each element contributes
  // floor(v·2^20) as a 64-bit integer, so the sums are exact and
  // order-independent — the one way a float centroid can hash-match across
  // engines and partitionings.
  private def dEmbedCentroid(spark: SparkSession, dir: String): DataFrame =
    Embeddings.centroidsFixedPoint(
      // BIGINT label for oracle schema parity — the cast lives HERE, not
      // in the operator (which must group arbitrary label types as-is)
      Tables.embeddings(spark, dir)
        .withColumn("label", col("label").cast("long")),
      "embedding", "label", scaleBits = 20)

  private val dEmbedCentroidSql =
    """WITH e AS (
      | SELECT CAST(label AS BIGINT) AS label, CAST(u.i AS BIGINT) AS pos,
      |  CAST(FLOOR(CAST(embedding[CAST(u.i + 1 AS INT)] AS DOUBLE) * 1048576) AS BIGINT) AS fp
      | FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)),
      |s AS (
      | SELECT label, pos, COUNT(*) AS n, CAST(SUM(fp) AS BIGINT) AS sum_fp
      | FROM e GROUP BY label, pos)
      |SELECT label, pos, n, sum_fp,
      | CAST(FLOOR(CAST(sum_fp AS DOUBLE) / n) AS BIGINT) AS mean_fp
      |FROM s""".stripMargin

  // ----------------------------------------------------- d_doc_chunk
  // Sliding-window token chunking (64-token chunks, stride 48 → 16-token
  // overlap): the long-document → training-sequence step. Pure per-row
  // work, zero shuffles; trailing chunks may be short but no token drops.
  private def dDocChunk(spark: SparkSession, dir: String): DataFrame =
    Corpus.chunkSliding(Tables.documents(spark, dir), "doc_id", "text",
      chunkSize = 64, stride = 48)

  private val dDocChunkSql =
    """WITH t AS (
      | SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
      | FROM documents),
      |s AS (
      | SELECT doc_id, toks, CAST(u.s AS INT) AS start
      | FROM t, UNNEST(range(0, len(toks), 48)) AS u(s)
      | WHERE len(toks) > 0)
      |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
      | CAST(len(toks[start+1:start+64]) AS BIGINT) AS n_tokens,
      | array_to_string(toks[start+1:start+64], ' ') AS chunk
      |FROM s""".stripMargin

  // ------------------------------------------------------- d_bpe_train
  // BPE tokenizer training (Sennrich ACL'16): one distributed
  // tokenize+count aggregate collapses the corpus to its word-frequency
  // table; the merge loop runs on the bounded top-`maxWords` head (see
  // Corpus.bpeTrain's scale notes). Output is the learned artifact — the
  // rank-ordered merge table. Deterministic (count-desc / lexicographic
  // tie-breaks) but not SQL-expressible (the merge loop is inherently
  // sequential), so rows-only here; BpeSpec pins the semantics against an
  // independent naive reimplementation plus encode round-trip properties.
  private def dBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val model = Corpus.bpeTrain(Tables.documents(spark, dir), "text",
      numMerges = 150)
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left_sym", "right_sym")
  }

  // -------------------------------------------------- d_vocab_coverage
  // Vocabulary OOV coverage: the fixed-vocab head (top 20 tokens by
  // count, deterministic text tie-break) vs each document — total tokens,
  // out-of-vocab tokens, OOV per-mille. The go/no-go report for a chosen
  // tokenizer vocab over a new corpus. Plan: one fused tokenize explode,
  // vocab head via TakeOrdered (bounded), broadcast membership join (no
  // corpus shuffle), per-doc count agg — the only full exchange carries
  // (doc_id, counts). Integer per-mille → engine-exact.
  private def dVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(ShingleHash.ngramTexts(col("text"), 1)).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(20)
      .select(col("tok"), lit(1L).as("__in"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_per_mille", expr("n_oov * 1000 div n_tokens"))
  }

  private val dVocabCoverageSql =
    """WITH tok AS (
      | SELECT doc_id, u.t AS tok FROM (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents), UNNEST(toks) AS u(t)),
      |vocab AS (
      | SELECT tok FROM tok GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT 20)
      |SELECT t.doc_id, COUNT(*) AS n_tokens,
      | CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      | CAST((CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000) // COUNT(*) AS BIGINT) AS oov_per_mille
      |FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
      |GROUP BY t.doc_id""".stripMargin

  // ------------------------------------------------------ d_token_budget
  // Greedy selection under a global token budget (half the corpus, computed
  // from the data so the query is meaningful at every sf): rank documents
  // (quality desc, doc_id asc) and keep while the running token total stays
  // ≤ budget. The implementation is the histogram two-phase of
  // Corpus.selectUnderBudget — no global sort of documents ever happens;
  // only the single boundary quality-bucket is ranked exactly. The oracle
  // replays the naive global-window formulation, proving the bucketed plan
  // IS the greedy selection.
  private def dTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.documents(spark, dir).select(col("doc_id"),
      qualityScore(col("text")).as("quality"),
      tokenCount(col("text")).as("n_tokens"))
    // half the corpus's tokens; the fraction variant derives the total from
    // the selection histogram itself — two corpus scans, not three
    Corpus.selectUnderBudgetFraction(q, "quality", "doc_id", "n_tokens", 1L, 2L)
  }

  private val qualityTokSql = // shared CTE: per-doc quality score + token count
    """q AS (
      | SELECT doc_id,
      |  CAST(greatest(0, CAST(FLOOR((least(length(text), 400) * 1000 / 400) * 0.5 +
      |   least(CASE WHEN len(toks) = 0 THEN 0 ELSE
      |    len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','this','be','are'], x))) * 1000 // len(toks) END * 4, 300) * 0.5) AS BIGINT)
      |   - least(CASE WHEN length(text) = 0 THEN 0 ELSE (length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g'))) * 1000 // length(text) END * 2, 500)) AS BIGINT) AS quality,
      |  CAST(len(toks) AS BIGINT) AS n_tokens
      | FROM (SELECT doc_id, text,
      |        list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
      |       FROM documents))""".stripMargin

  private val dTokenBudgetSql =
    "WITH " + qualityTokSql + """,
c AS (
 SELECT doc_id, quality, n_tokens,
  SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
 FROM q)
SELECT doc_id, quality, n_tokens FROM c
WHERE cum <= (SELECT SUM(n_tokens) // 2 FROM q)"""

  // -------------------------------------------------------- d_source_mix
  // Temperature-scaled source mixing (alpha = 1/2, the multilingual-corpus
  // standard): per-source token mass, weight = isqrt(tokens), sampling
  // share in integer per-mille. floor(sqrt(bigint)) is engine-exact for
  // n < 2^52 (IEEE sqrt is correctly rounded and k^2-1 never rounds up to
  // k at these magnitudes), so no float ever reaches the output. Plan: one
  // partial-combined aggregate; the share divisor rides a broadcast of the
  // one-row total.
  private def dSourceMix(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("source"), tokenCount(col("text")).as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("weight",
        floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    t.crossJoin(broadcast(t.agg(sum(col("weight")).as("__tw"))))
      .withColumn("share_pm", expr("weight * 1000 div __tw"))
      .drop("__tw")
  }

  private val dSourceMixSql =
    """WITH t AS (
      | SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0))) AS BIGINT) AS n_tokens
      | FROM documents GROUP BY source),
      |w AS (
      | SELECT source, n_docs, n_tokens,
      |  CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight FROM t)
      |SELECT source, n_docs, n_tokens, weight,
      | CAST(weight * 1000 // CAST((SELECT SUM(weight) FROM w) AS BIGINT) AS BIGINT) AS share_pm
      |FROM w""".stripMargin

  // ------------------------------------------------------ d_mix_calibrate
  // Two-way mixture calibration by iterative proportional fitting
  // (Corpus.mixtureCalibrate — raking the lang × source contingency to
  // UNIFORM marginals on both axes, 5 fixed iterations). Every step is
  // one integer multiply-then-floor-div per cell, so DuckDB replays the
  // ENTIRE fit bit-for-bit through five unrolled window-sum stages — a
  // wrong rowSum partition, a reordered row/col pass, or a float anywhere
  // breaks the hash.
  private def dMixCalibrate(spark: SparkSession, dir: String): DataFrame =
    Corpus.mixtureCalibrate(Tables.documents(spark, dir), "lang", "source")

  private val dMixCalibrateSql = {
    // greatest(..., 1) mirrors mixtureCalibrate's one-unit mass clamp
    val iter = (1 to 5).map { i =>
      s"""r$i AS (SELECT lang, source, n, m_init, rm, cm,
         |  greatest((m * rm) // SUM(m) OVER (PARTITION BY lang), 1) AS m FROM ${if (i == 1) "m0" else s"c${i - 1}"}),
         |c$i AS (SELECT lang, source, n, m_init, rm, cm,
         |  greatest((m * cm) // SUM(m) OVER (PARTITION BY source), 1) AS m FROM r$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH c0 AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
       |t AS (SELECT SUM(n) AS tot, COUNT(DISTINCT lang) AS nl,
       |       COUNT(DISTINCT source) AS ns FROM c0),
       |m0 AS (SELECT lang, source, n,
       |        greatest((n * 1000000000) // tot, 1) AS m,
       |        greatest((n * 1000000000) // tot, 1) AS m_init,
       |        1000000000 // nl AS rm, 1000000000 // ns AS cm
       |       FROM c0, t),
       |$iter
       |SELECT lang, source, CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS mass,
       | CAST((m * 1000000) // m_init AS BIGINT) AS weight_ppm
       |FROM c5""".stripMargin
  }

  // ---------------------------------------------------- d_bigram_fluency
  // LM-lite fluency scoring: corpus word-bigram frequencies (the 2-gram
  // language model's count table) joined back per document — mean bigram
  // corpus-frequency (per-mille integer) and the rare-bigram count, the
  // "have I seen this phrasing before" signal perplexity filters compute
  // with a trained LM. Only 8-byte bigram hashes cross the exchanges
  // (d_rarity's pattern at the sequence level); the oracle rebuilds the
  // same bigrams as strings.
  private def dBigramFluency(spark: SparkSession, dir: String): DataFrame =
    Corpus.bigramFluency(Tables.documents(spark, dir), "doc_id", "text")

  private val dBigramFluencySql =
    """WITH t AS (
      | SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
      | FROM documents),
      |b AS (
      | SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
      | FROM t, UNNEST(range(1, len(toks))) AS u(i)),
      |f AS (SELECT bg, COUNT(*) AS bf FROM b GROUP BY bg)
      |SELECT b.doc_id, COUNT(*) AS n_bigrams,
      | CAST(SUM(CASE WHEN f.bf < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
      | (CAST(SUM(f.bf) AS BIGINT) // COUNT(*)) * 1000
      |   + ((CAST(SUM(f.bf) AS BIGINT) % COUNT(*)) * 1000) // COUNT(*) AS mean_bf_pm
      |FROM b JOIN f USING (bg)
      |GROUP BY b.doc_id""".stripMargin

  // ----------------------------------------------------------- d_url_dedup
  // URL-keyed dedup (the CommonCrawl first pass): canonicalize — strip
  // fragment and query string, lowercase scheme+host only (paths stay
  // case-significant), drop one trailing slash — then keep the first
  // document per canonical URL. URLs are synthesized from doc_id (the
  // corpus has no url column) with case/query/fragment variants so the
  // canonicalization is load-bearing. Exchange carries the canonical
  // string key; at the billions-of-URLs scale the key would be hashed
  // first (d_dedup_exact's layout) — kept as text here so the oracle can
  // rebuild it.
  private def dUrlDedup(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://Site"), pmod(col("doc_id"), lit(5)),
      lit(".Example.com/P/"), pmod(col("doc_id"), lit(97)),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("/"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("?utm_source=x&ref=y"))
        .otherwise(lit("#section")))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.canonicalizeUrl(url).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))
  }

  private val dUrlDedupSql =
    """WITH u AS (
      | SELECT doc_id,
      |  'https://Site' || (doc_id % 5) || '.Example.com/P/' || (doc_id % 97) ||
      |  CASE WHEN doc_id % 3 = 0 THEN '/' WHEN doc_id % 3 = 1 THEN '?utm_source=x&ref=y' ELSE '#section' END AS url
      | FROM documents),
      |s AS (
      | SELECT doc_id, split_part(split_part(url, '#', 1), '?', 1) AS stripped FROM u),
      |p AS (
      | SELECT doc_id, split_part(stripped, '://', 1) AS proto,
      |  substring(stripped, strpos(stripped, '://') + 3) AS rest FROM s),
      |h AS (
      | SELECT doc_id, proto, split_part(rest, '/', 1) AS host,
      |  regexp_replace(substring(rest, length(split_part(rest, '/', 1)) + 1), '/$', '') AS path
      | FROM p)
      |SELECT lower(proto) || '://' || lower(host) || path AS canon_url,
      | MIN(doc_id) AS keeper, COUNT(*) AS n_docs
      |FROM h GROUP BY 1""".stripMargin

  // ------------------------------------------------------- d_bpe_encode
  // Distributed apply of the trained BPE tokenizer: the learned merge
  // table rides BpeEncodeExpr as a codegen reference object (broadcast
  // with task binaries), so encoding is one fused zero-shuffle per-row
  // pass — the tokenize step every downstream token count in the pipeline
  // consumes. Per-doc subword count + chars-per-100-subwords (the
  // compression ratio a tokenizer is judged by). Rows-only: training is a
  // sequential merge loop no SQL engine replays; BpeSpec pins the
  // encode/train semantics against an independent reimplementation.
  private def dBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val model = Corpus.bpeTrain(docs, "text", numMerges = 60)
    docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(Bpe.encode(col("text"), model)).cast("long").as("n_subwords"))
      .withColumn("chars_per_100sw",
        when(col("n_subwords") === 0, 0L)
          .otherwise(expr("n_chars * 100 div n_subwords")))
  }

  // ----------------------------------------------------- d_bpe_roundtrip
  // BPE encode∘decode identity + character-coverage OOV, inside the hash
  // gate (r15 — shrinks the honest no_oracle set to 2): the trained
  // merges stay engine-side, but two INVARIANTS of any correct tokenizer
  // are engine-independent and hash directly. (1) Decode identity: BPE
  // merges only ever concatenate adjacent symbols within a word, so
  // joining the sub-word units and splitting on the terminal `</w>`
  // marker must reproduce the lowercased whitespace-normalized text
  // EXACTLY — the `decoded` column is that reconstruction, and DuckDB's
  // twin is the normalization alone (no model): any segmentation bug
  // that drops, duplicates, or reorders a symbol breaks the string hash.
  // (2) Character-coverage OOV: the model trains on the ENGLISH slice, so
  // its character alphabet (wordSymbols seeds one symbol per code point —
  // the alphabet IS the training slice's charset) misses the non-English
  // scripts; per-doc out-of-alphabet code-point counts are the tokenizer
  // coverage report, replayed relationally in DuckDB from the same
  // charset definition. Chars count via translate()-deletion — O(doc)
  // per row, no per-char lambda.
  private def dBpeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val train = docs.filter(col("lang") === "en")
    val model = Corpus.bpeTrain(train, "text", numMerges = 60)
    // per-doc array_distinct BEFORE the explode (r16): the alphabet pass
    // previously generated one row per CHARACTER of the slice and relied
    // on the aggregate to collapse them; deduping inside the row first
    // caps the generated rows at the per-doc charset (~dozens), same
    // distinct result
    val alphaStr = train
      .select(explode(array_distinct(split(concat_ws("",
        graft.functions.TextFunctions.tokens(col("text"))), ""))).as("c"))
      .filter(length(col("c")) > 0).distinct()
      .collect().map(_.getString(0)).sorted.mkString
    docs
      .select(col("doc_id"),
        rtrim(regexp_replace(array_join(Bpe.encode(col("text"), model), ""),
          "</w>", " ")).as("decoded"))
      .withColumn("__ns", translate(col("decoded"), " ", ""))
      .select(col("doc_id"), col("decoded"),
        length(col("__ns")).cast("long").as("n_cp"),
        length(translate(col("__ns"), alphaStr, "")).cast("long").as("oov_chars"))
      .withColumn("oov_per_mille",
        expr("oov_chars * 1000 div greatest(n_cp, 1)"))
  }

  private val dBpeRoundtripSql =
    """WITH d AS (
      | SELECT doc_id, lang,
      |  array_to_string(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0), ' ') AS decoded
      | FROM documents),
      |cs AS (
      | SELECT DISTINCT u.c AS ch
      | FROM (SELECT replace(decoded, ' ', '') AS s FROM d WHERE lang = 'en') e,
      |  UNNEST(string_split_regex(e.s, '')) AS u(c) WHERE len(u.c) > 0),
      |ch AS (
      | SELECT doc_id, u.c AS ch
      | FROM d, UNNEST(string_split_regex(replace(decoded, ' ', ''), '')) AS u(c)
      | WHERE len(u.c) > 0),
      |agg AS (
      | SELECT doc_id, COUNT(*) AS n_cp,
      |  SUM(CASE WHEN cs.ch IS NULL THEN 1 ELSE 0 END) AS oov
      | FROM ch LEFT JOIN cs USING (ch) GROUP BY doc_id)
      |SELECT d.doc_id, d.decoded,
      | CAST(COALESCE(a.n_cp, 0) AS BIGINT) AS n_cp,
      | CAST(COALESCE(a.oov, 0) AS BIGINT) AS oov_chars,
      | CAST(COALESCE(a.oov, 0) * 1000 // greatest(COALESCE(a.n_cp, 0), 1) AS BIGINT) AS oov_per_mille
      |FROM d LEFT JOIN agg a USING (doc_id)""".stripMargin

  // --------------------------------------------------------- d_embed_pca
  // PCA over the embedding corpus (Embeddings.pcaTrain — ONE fixed-point
  // Gram pass, bit-identical across partitionings). No SQL engine replays
  // an eigendecomposition, but the model's INVARIANTS are checkable: the
  // oracle replays the exact integer sufficient statistics (per-dim n /
  // Σ floor(x·2^20) / Σ floor(x²·2^20) — the same fixed-point sums
  // FixedGramAgg accumulates, so DuckDB's doubles reproduce them
  // bit-for-bit), and three spectral identities that must hold of any
  // correct decomposition ride along as flag columns checked driver-side
  // at tight tolerance: Σ eigenvalues == trace(cov) (rotation preserves
  // trace), the basis is orthonormal, and the per-component variance of
  // the projected corpus equals its eigenvalue. A broken eigensolver,
  // drifted aggregation, or wrong projection flips a flag (or an integer)
  // and breaks the hash; the rotation itself stays pinned by PcaSpec.
  private def dEmbedPca(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Embeddings
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val k = 8
    val m = Embeddings.pcaTrain(emb, "embedding", k = k)
    val stats = emb.select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        col("x").cast("double").as("x"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x") * (1L << 20)).cast("long")).as("sum_fp"),
        sum(floor(col("x") * col("x") * (1L << 20)).cast("long")).as("gram_fp"))
    // invariant 1: trace preservation. Recompute cov's trace from the SAME
    // integer statistics with the SAME expression shape pcaTrain uses
    // (gram/scale/n - mean², mean = sum/scale/n), then compare against the
    // full eigenvalue sum. d rows collect — bounded by dimensionality.
    val s = stats.orderBy("dim").collect()
    val scale = (1L << 20).toDouble
    val trace = s.map { r =>
      val n = r.getAs[Long]("n").toDouble
      val mean = r.getAs[Long]("sum_fp") / scale / n
      r.getAs[Long]("gram_fp") / scale / n - mean * mean
    }.sum
    val eigSum = m.eigvals.sum
    val traceOk = math.abs(eigSum - trace) <= 1e-9 * math.max(1.0, math.abs(trace))
    // invariant 2: orthonormal basis (B·Bᵀ == I over the kept k rows)
    val orthoOk = (0 until k).forall { a =>
      (a until k).forall { b =>
        val dot = m.basis(a).zip(m.basis(b)).map { case (x, y) => x * y }.sum
        math.abs(dot - (if (a == b) 1.0 else 0.0)) <= 1e-9
      }
    }
    // invariant 3: per-component projected variance == eigenvalue (float
    // projection, so a looser relative tolerance)
    val varRows = Embeddings.pcaProject(emb, "embedding", m)
      .select(posexplode(col("pca")).as(Seq("component", "y")))
      .select(col("component"), col("y").cast("double").as("y"))
      .groupBy("component")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
        sum(col("y") * col("y")).as("ss"))
      .collect() // k rows
    val projOk = varRows.forall { r =>
      val n = r.getAs[Long]("n").toDouble
      val mean = r.getAs[Double]("s") / n
      val v = r.getAs[Double]("ss") / n - mean * mean
      val ev = m.eigvals(r.getAs[Int]("component"))
      math.abs(v - ev) <= 1e-3 * math.max(1e-9, ev)
    }
    stats.withColumn("trace_ok", lit(if (traceOk) 1L else 0L))
      .withColumn("ortho_ok", lit(if (orthoOk) 1L else 0L))
      .withColumn("proj_ok", lit(if (projOk) 1L else 0L))
  }

  private val dEmbedPcaSql =
    """WITH e AS (
      | SELECT CAST(u.i AS BIGINT) AS dim,
      |  CAST(embedding[CAST(u.i + 1 AS INT)] AS DOUBLE) AS x
      | FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i))
      |SELECT dim, COUNT(*) AS n,
      | CAST(SUM(CAST(FLOOR(x * 1048576) AS BIGINT)) AS BIGINT) AS sum_fp,
      | CAST(SUM(CAST(FLOOR(x * x * 1048576) AS BIGINT)) AS BIGINT) AS gram_fp,
      | CAST(1 AS BIGINT) AS trace_ok, CAST(1 AS BIGINT) AS ortho_ok,
      | CAST(1 AS BIGINT) AS proj_ok
      |FROM e GROUP BY dim""".stripMargin

  // ------------------------------------------------------ d_heavy_hitters
  // Exact frequent-token report through a bounded-memory sketch: pass 1 is
  // a Misra–Gries TypedImperativeAggregate (capacity 800 counters per
  // partition — the exchange is fixed-size no matter the vocabulary), pass
  // 2 recounts the bounded candidate set exactly. capacity+1 ≥ denom makes
  // the sketch a PROVEN superset of the true hitters, so the DuckDB oracle
  // can replay the answer with a plain GROUP BY/HAVING — exact answers,
  // sketch-bounded shuffle.
  private def dHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Corpus.heavyHitterTokens(Tables.documents(spark, dir), "text",
      denom = 200, capacity = 800)

  private val dHeavyHittersSql =
    """WITH toks AS (
      | SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS tok
      | FROM documents)
      |SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
      |HAVING COUNT(*) * 200 > (SELECT COUNT(*) FROM toks)""".stripMargin

  // lazy: references dCurationPipelineSql declared below (a strict val
  // here would read it as null during object init — the Verify NPE trap)
  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("d_top_ngrams", dTopNgrams, Some(dTopNgramsSql)),
    QueryDef("d_inverted_index", dInvertedIndex, Some(dInvertedIndexSql)),
    QueryDef("d_weighted_sample", dWeightedSample, Some(dWeightedSampleSql)),
    QueryDef("d_substring_dedup", dSubstringDedup, Some(dSubstringDedupSql)),
    QueryDef("d_substring_rewrite", dSubstringRewrite, Some(dSubstringRewriteSql)),
    QueryDef("d_embed_centroid", dEmbedCentroid, Some(dEmbedCentroidSql)),
    QueryDef("d_doc_chunk", dDocChunk, Some(dDocChunkSql)),
    QueryDef("d_curation_pipeline", dCurationPipeline, Some(dCurationPipelineSql)),
    QueryDef("d_split", dSplit, Some(dSplitSql)),
    QueryDef("d_shuffle", dShuffle, Some(dShuffleSql)),
    QueryDef("d_bpe_train", dBpeTrain, None),
    QueryDef("d_vocab_coverage", dVocabCoverage, Some(dVocabCoverageSql)),
    QueryDef("d_token_budget", dTokenBudget, Some(dTokenBudgetSql)),
    QueryDef("d_source_mix", dSourceMix, Some(dSourceMixSql)),
    QueryDef("d_mix_calibrate", dMixCalibrate, Some(dMixCalibrateSql)),
    QueryDef("d_bigram_fluency", dBigramFluency, Some(dBigramFluencySql)),
    QueryDef("d_url_dedup", dUrlDedup, Some(dUrlDedupSql)),
    QueryDef("d_bpe_encode", dBpeEncode, None),
    QueryDef("d_bpe_roundtrip", dBpeRoundtrip, Some(dBpeRoundtripSql)),
    QueryDef("d_heavy_hitters", dHeavyHitters, Some(dHeavyHittersSql)),
    QueryDef("d_embed_pca", dEmbedPca, Some(dEmbedPcaSql))
  )

  // ------------------------------------------------------- d_shuffle
  // Seeded deterministic global shuffle (Corpus.deterministicShuffle) —
  // the reproducible training-order permutation, position-assigned by the
  // distributed dense rank (no single-task global window). The oracle
  // replays the affine-permutation key in exact integer SQL and ranks
  // with a window — identical bit-for-bit because the key arithmetic
  // never leaves the long domain. A wrong mod-sign, a boundary-sampling
  // nondeterminism in the rank, or a tie-break drift breaks the hash.
  private def dShuffle(spark: SparkSession, dir: String): DataFrame =
    Corpus.deterministicShuffle(
      Tables.documents(spark, dir).select("doc_id"), "doc_id", seed = 42L)

  private val dShuffleSql =
    "SELECT doc_id, row_number() OVER (ORDER BY " +
      Corpus.shuffleKeySql("doc_id", 42L) +
      ", doc_id) - 1 AS pos FROM documents"

  // ------------------------------------------------------- d_split
  // Deterministic train/val/test assignment (80/10/10 by hash range) with
  // per-split counts — pure per-row function of the id, so the split
  // reproduces across runs, partitionings, and engines.
  private def dSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Corpus.splitAssign(col("doc_id")).as("split"))
      .groupBy("split").agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))

  private val dSplitSql =
    """SELECT CASE WHEN (((doc_id % 1000003 + 1000003) % 1000003 * 2654435761 % 1000003 + 1000003) % 1000003) % 1000 < 800 THEN 'train'
      |            WHEN (((doc_id % 1000003 + 1000003) % 1000003 * 2654435761 % 1000003 + 1000003) % 1000003) % 1000 < 900 THEN 'val'
      |            ELSE 'test' END AS split,
      | COUNT(*) AS n, CAST(MIN(doc_id) AS BIGINT) AS min_id,
      | CAST(MAX(doc_id) AS BIGINT) AS max_id
      |FROM documents GROUP BY 1""".stripMargin

  // ----------------------------------------------- d_curation_pipeline
  // The end-to-end curation composition a reference user actually runs:
  // markup strip → token-count quality gate → within-batch exact dedup →
  // sliding-window chunking. Markup and exact duplicates are planted so
  // every stage demonstrably fires; the oracle replays all four stages in
  // one CTE. Stage shapes are the proven ones: per-row strip/count (no
  // shuffle), hash-grouped dedup (8-byte keys), zero-shuffle chunking —
  // the pipeline's exchanges are the content-hash groupBy plus the
  // survivor semi-join (broadcast here; id-keyed hash join once the
  // survivor set outgrows the broadcast threshold at corpus scale).
  private def dCurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val wrapped = docs.select(col("doc_id"),
      concat(lit("<div>"), col("text"), lit("</div>")).as("text"))
    val withDups = wrapped.unionByName(
      wrapped.filter(col("doc_id") < 40)
        .withColumn("doc_id", col("doc_id") + 200000L))
    val clean = withDups.select(col("doc_id"), stripMarkup(col("text")).as("clean"))
    val kept = clean.filter(tokenCount(col("clean")) >= 30L)
    val unique = Dedup.exactRows(kept, "clean", "doc_id")
    Corpus.chunkSliding(unique, "doc_id", "clean", chunkSize = 64, stride = 48)
  }

  private val dCurationPipelineSql =
    """WITH w AS (
      | SELECT doc_id, '<div>' || text || '</div>' AS text FROM documents
      | UNION ALL
      | SELECT doc_id + 200000, '<div>' || text || '</div>' FROM documents WHERE doc_id < 40),
      |c AS (
      | SELECT doc_id, trim(regexp_replace(
      |   replace(replace(replace(replace(replace(replace(
      |     regexp_replace(text, '<[^>]*>', ' ', 'g'),
      |     '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |     '&apos;', ''''), '&#39;', ''''), '&amp;', '&'),
      |   '\s+', ' ', 'g')) AS clean
      | FROM w),
      |k AS (
      | SELECT doc_id, clean FROM c
      | WHERE len(list_filter(string_split_regex(lower(clean), '\s+'), x -> len(x) > 0)) >= 30),
      |u AS (
      | SELECT MIN(doc_id) AS keep_id FROM k
      | GROUP BY regexp_replace(lower(clean), '\s+', ' ', 'g')),
      |s AS (SELECT k.doc_id, k.clean FROM k JOIN u ON k.doc_id = u.keep_id),
      |t AS (
      | SELECT doc_id, list_filter(string_split_regex(lower(clean), '\s+'), x -> len(x) > 0) AS toks
      | FROM s)
      |SELECT doc_id, CAST(st.s // 48 AS BIGINT) AS chunk_id,
      | CAST(len(toks[CAST(st.s + 1 AS INT):CAST(st.s + 64 AS INT)]) AS BIGINT) AS n_tokens,
      | array_to_string(toks[CAST(st.s + 1 AS INT):CAST(st.s + 64 AS INT)], ' ') AS chunk
      |FROM t, UNNEST(range(0, len(toks), 48)) AS st(s)
      |WHERE len(toks) > 0""".stripMargin

}
