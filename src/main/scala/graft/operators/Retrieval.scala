package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Lexical retrieval over a document corpus: BM25 ranking (Robertson &
  * Spärck Jones probabilistic relevance framework, the Okapi BM25 form),
  * a query-likelihood language-model ranker, and reciprocal-rank fusion
  * (Cormack, Clarke & Büttcher, SIGIR'09) — the hybrid-retrieval stack a
  * training-data pipeline runs for corpus search, contamination probes and
  * retrieval-augmented curation.
  *
  * Cross-engine exactness discipline (SURVEY §6): every ranking score is
  * built ONLY from IEEE double `+ - * /` over integer aggregates, with a
  * documented literal for each constant — any engine computes the same bit
  * pattern when it evaluates the same operation tree, where `ln` would hang
  * the ranking on libm rounding. The BM25 idf therefore ships in its
  * log-free odds form `(N - df + 0.5) / (df + 0.5)` when `logIdf = false`
  * (the registered oracle query); `logIdf = true` gives the standard
  * `ln(1 + odds)` Lucene/ATIRE shape for library callers who don't need an
  * external replay. Cross-term sums are folded in FIXED qrank order (left
  * to right), never through a float SUM aggregate whose combine order the
  * scheduler owns.
  *
  * 100 TB shape: tokenization explodes map-side; tf / df / dl are
  * partial-combined keyed aggregates; the query-term table is
  * vocab-bounded (its ranking window is global but runs over distinct
  * TERMS, not documents) and broadcasts to the tf join; per-document
  * scores pivot inside one keyed aggregate; the final top-k is
  * `orderBy(...).limit(k)` = TakeOrderedAndProject — a per-partition heap
  * plus a k-row driver merge, never a global sort.
  */
object Retrieval {

  /** Corpus-wide lexical statistics bundle, computed once and shared by
    * every ranker: per-(doc, term) frequency, per-doc length, per-term
    * document frequency, and one-row totals (docs with >= 1 token, total
    * token count).
    */
  final case class LexStats(tf: DataFrame, df: DataFrame, totals: DataFrame)

  /** Tokenize `textCol` into lowercased maximal `[a-z]+` runs of at least
    * `minTokenLen` chars (the [[Corpus.tfIdfTopK]] tokenizer) and aggregate
    * the tf / dl / df / totals tables. `tf` carries `dl` denormalized via a
    * per-document window so downstream rankers join once.
    */
  def lexStats(docs: DataFrame, idCol: String, textCol: String,
               minTokenLen: Int = 3): LexStats = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("token"))
      .filter(length(col("token")) >= minTokenLen)
    val tf0 = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val tf = tf0.withColumn("dl",
      sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
    // df DERIVES FROM tf0, not tok: tf0 holds exactly one row per
    // (doc, token), so rows-per-token IS the distinct-document count —
    // and because tf/df/totals then all consume the SAME (doc_id, token)
    // exchange, ReuseExchange runs the tokenize + shuffle once per plan
    // instead of once per aggregate (r16: the BM25 family computed the
    // token explosion twice; measured cut below).
    val dfT = tf0.groupBy("token").agg(count(lit(1)).as("df"))
    val totals = tf0.agg(count_distinct(col("doc_id")).as("n_docs"),
      sum(col("tf")).as("total_tok"))
    LexStats(tf, dfT, totals)
  }

  /** INCREMENTAL corpus extension — the index-update shape: extend an
    * existing [[LexStats]] with newly arrived documents by tokenizing ONLY
    * the new docs and merging the aggregates (tf rows union — documents
    * are per-doc-local so dl needs no recompute; df full-outer sums;
    * totals add). At 100 TB this is the difference between re-tokenizing
    * the corpus on every batch and paying only for the delta. Exact, not
    * approximate: every merged aggregate is integer arithmetic, so
    * `extendLexStats(lexStats(a), b)` equals `lexStats(a ∪ b)` value-for-
    * value (spec-pinned). `newDocs` must be id-disjoint from the corpus
    * `stats` was built over — a re-ingested id would double-count df/tf.
    */
  def extendLexStats(stats: LexStats, newDocs: DataFrame, idCol: String,
                     textCol: String, minTokenLen: Int = 3): LexStats = {
    val n = lexStats(newDocs, idCol, textCol, minTokenLen)
    val tf = stats.tf.unionByName(n.tf)
    val df = stats.df.select(col("token"), col("df").as("__da"))
      .join(n.df.select(col("token"), col("df").as("__db")),
        Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("__da"), lit(0L)) + coalesce(col("__db"), lit(0L))).as("df"))
    val totals = stats.totals
      .select(col("n_docs").as("__na"), col("total_tok").as("__ta"))
      .crossJoin(n.totals
        .select(col("n_docs").as("__nb"), col("total_tok").as("__tb")))
      .select((col("__na") + col("__nb")).as("n_docs"),
        (col("__ta") + col("__tb")).as("total_tok"))
    LexStats(tf, df, totals)
  }

  /** Pick a deterministic multi-term query from the corpus itself: the
    * terms ranked `offset+1 .. offset+nTerms` by (df DESC, token ASC).
    * Self-contained at any scale factor — no fixture vocabulary to ship.
    * The cut is orderBy+limit (TakeOrderedAndProject — per-partition heaps
    * merging offset+nTerms rows on the driver), so a real corpus's
    * multi-million-term vocabulary never funnels through a single-partition
    * ranking window; the row_number then runs over ≤ offset+nTerms rows.
    */
  def queryTermsByDf(dfTable: DataFrame, nTerms: Int, offset: Int): DataFrame =
    dfTable.orderBy(col("df").desc, col("token").asc).limit(offset + nTerms)
      .withColumn("qrank",
        row_number().over(Window.orderBy(col("df").desc, col("token").asc)))
      .filter(col("qrank") > offset)
      .select(col("token"), col("df"), col("qrank"))

  /** Per-(document, query-term) BM25 contribution.
    *
    * score = idf(df) * (tf * (k1+1)) / ((tf + k1*(1-b)) + (k1*b*dl) / avgdl)
    * with avgdl = total_tok / n_docs. Every derived coefficient
    * (k1+1, k1*(1-b), k1*b) is computed ONCE here in Scala; oracle writers
    * interpolate the same doubles into their SQL so both engines run
    * identical constants — never re-derive `k1*b` in SQL (1.2*0.75 rounds
    * differently from the literal 0.9).
    */
  def bm25PerTerm(stats: LexStats, qterms: DataFrame,
                  k1: Double = 1.2, b: Double = 0.75,
                  logIdf: Boolean = false): DataFrame = {
    val k1p1 = k1 + 1.0
    val k1omb = k1 * (1.0 - b)
    val k1b = k1 * b
    val odds = (col("n_docs").cast(DoubleType) - col("df") + lit(0.5)) /
      (col("df").cast(DoubleType) + lit(0.5))
    val idf = if (logIdf) log(lit(1.0) + odds) else odds
    val avgdl = col("total_tok").cast(DoubleType) / col("n_docs")
    val den = (col("tf").cast(DoubleType) + lit(k1omb)) +
      (lit(k1b) * col("dl").cast(DoubleType)) / avgdl
    stats.tf.join(broadcast(qterms), "token")
      .crossJoin(broadcast(stats.totals))
      .select(col("doc_id"), col("qrank"), col("tf"), col("dl"),
        (idf * ((col("tf").cast(DoubleType) * lit(k1p1)) / den)).as("s"))
  }

  /** Per-(document, query-term) query-likelihood contribution — the
    * unsmoothed language-model ranker `tf / dl` (Ponte & Croft, SIGIR'98,
    * in its rank-equivalent linear form): one IEEE division per pair.
    */
  def qlPerTerm(stats: LexStats, qterms: DataFrame): DataFrame =
    stats.tf.join(broadcast(qterms), "token")
      .select(col("doc_id"), col("qrank"), col("tf"), col("dl"),
        (col("tf").cast(DoubleType) / col("dl")).as("s"))

  /** Fold per-term scores into one per-document score in FIXED qrank order
    * (((s_1 + s_2) + s_3) ...), missing terms contributing +0.0 — the
    * combine order is part of the result's bit pattern, so it must not ride
    * a float SUM aggregate. Also surfaces per-term tf columns (`tf_<q>`,
    * absent = 0) and dl for integer-exact output. One keyed aggregate.
    */
  def fuseFixedOrder(perTerm: DataFrame, qranks: Seq[Int]): DataFrame = {
    val aggs = qranks.flatMap { q =>
      Seq(max(when(col("qrank") === q, col("s"))).as(s"s_$q"),
        max(when(col("qrank") === q, col("tf"))).as(s"tf0_$q"))
    } :+ max(col("dl")).as("dl")
    val fused = perTerm.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val score = qranks.map(q => coalesce(col(s"s_$q"), lit(0.0)))
      .reduceLeft(_ + _)
    val tfCols = qranks.map(q =>
      coalesce(col(s"tf0_$q"), lit(0L)).cast(LongType).as(s"tf_$q"))
    fused.select(col("doc_id") +: tfCols :+ col("dl") :+ score.as("score"): _*)
  }

  /** Top-k by (score DESC, doc_id ASC) with a dense `rk` column. The cut is
    * orderBy+limit (TakeOrderedAndProject — no global sort); the rank
    * window then runs over k rows only.
    */
  def topK(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id").asc))
        .cast(LongType))

  /** One-call BM25 retrieval: corpus-derived query terms (df ranks
    * `offset+1 .. offset+nTerms`), per-term scoring, fixed-order fusion,
    * top-k with ranks. `logIdf = true` (default) is the standard
    * Lucene/ATIRE ln(1+odds) form; pass false for the cross-engine-exact
    * odds form the oracle queries use.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               nTerms: Int = 3, offset: Int = 10, k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75,
               logIdf: Boolean = true, minTokenLen: Int = 3): DataFrame = {
    val stats = lexStats(docs, idCol, textCol, minTokenLen)
    val qterms = queryTermsByDf(stats.df, nTerms, offset)
    topK(fuseFixedOrder(bm25PerTerm(stats, qterms, k1, b, logIdf),
      (offset + 1) to (offset + nTerms)), k)
  }

  /** One-call hybrid retrieval: BM25 and query-likelihood rankers over the
    * SAME lexical statistics (one tokenize/aggregate pass feeds both),
    * fused by reciprocal rank.
    */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
                 nTerms: Int = 3, offset: Int = 10, listK: Int = 50,
                 k: Int = 20, kRrf: Double = 60.0,
                 k1: Double = 1.2, b: Double = 0.75,
                 logIdf: Boolean = true, minTokenLen: Int = 3): DataFrame = {
    val stats = lexStats(docs, idCol, textCol, minTokenLen)
    val qterms = queryTermsByDf(stats.df, nTerms, offset)
    val qranks = (offset + 1) to (offset + nTerms)
    val bm25 = topK(fuseFixedOrder(
      bm25PerTerm(stats, qterms, k1, b, logIdf), qranks), listK)
    val ql = topK(fuseFixedOrder(qlPerTerm(stats, qterms), qranks), listK)
    rrfFuse(bm25, ql, kRrf, k)
  }

  /** One-call dense⊕lexical HYBRID retrieval — the RAG/curation retrieval
    * shape: RRF-fuse the corpus's BM25 lexical top-`listKLex` with the IVF
    * ANN dense top-`listKDense` of ONE query vector over a shared id
    * space. The lexical leg runs this object's BM25 stack (corpus-derived
    * query terms, fixed-order fusion, TakeOrderedAndProject cut); the
    * dense leg probes a prebuilt [[Similarity.IvfIndex]] (offline build,
    * nProbe cells per query, exact cosine inside the cells); the fusion is
    * [[rrfFuse]]'s exact-integer-rank arithmetic — two IEEE divisions and
    * a fixed-order add per document, replayable bit-for-bit.
    *
    * `queryVec` must carry exactly ONE query row (`qIdCol`, `vecCol`):
    * dense ranks are per-query, and fusing several queries' rank lists
    * into one lexical ranking would interleave unrelated ranks. Run one
    * fusion per query (the lexical leg reuses across calls via its own
    * `lexStats`). `extraDocs`, when set, is an id-disjoint document DELTA
    * merged via [[extendLexStats]] — the incremental-indexing shape:
    * query-term selection stays frozen on `docs`' own df ranking while
    * scoring sees the extended corpus, and only the delta tokenizes.
    *
    * 100 TB shape: both legs are list-sized before the fusion touches
    * them — the lexical cut is a per-partition heap merge, the dense leg
    * exchanges only (cell, id, vector) candidates from nProbe cells — so
    * the full-outer fusion join runs over ≤ listKLex + listKDense rows.
    */
  def hybridDenseTopK(docs: DataFrame, idCol: String, textCol: String,
                      index: Similarity.IvfIndex, queryVec: DataFrame,
                      vecCol: String, qIdCol: String,
                      nTerms: Int = 3, offset: Int = 10,
                      listKLex: Int = 50, listKDense: Int = 10,
                      k: Int = 20, kRrf: Double = 60.0, nProbe: Int = 4,
                      k1: Double = 1.2, b: Double = 0.75,
                      logIdf: Boolean = true, minTokenLen: Int = 3,
                      extraDocs: Option[DataFrame] = None): DataFrame = {
    val baseStats = lexStats(docs, idCol, textCol, minTokenLen)
    val stats = extraDocs.fold(baseStats)(
      extendLexStats(baseStats, _, idCol, textCol, minTokenLen))
    val qterms = extraDocs match {
      case None => queryTermsByDf(stats.df, nTerms, offset)
      case Some(_) =>
        // selection by the BASE ranking, df/idf from the extended corpus
        queryTermsByDf(baseStats.df, nTerms, offset)
          .select(col("token"), col("qrank")).join(stats.df, "token")
    }
    val qranks = (offset + 1) to (offset + nTerms)
    val lex = topK(fuseFixedOrder(
      bm25PerTerm(stats, qterms, k1, b, logIdf), qranks), listKLex)
    val dense = Similarity
      .ivfQuery(index, queryVec, vecCol, qIdCol, k = listKDense, nProbe = nProbe)
      .select(col("corpus_id").as("doc_id"), col("rk"))
    rrfFuse(lex.select(col("doc_id"), col("rk")), dense, kRrf, k)
  }

  /** PER-QUERY reciprocal-rank fusion — the serving-side face of
    * [[rrfFuse]]: fuse ONE shared lexical rank list (`lex`: doc_id, rk —
    * a static offline artifact) with per-query dense rank lists (`dense`:
    * query_id, doc_id, rk) in a single plan, one fused top-`k` per
    * query_id. Same exact arithmetic as [[rrfFuse]] (integer ranks, two
    * IEEE divisions, fixed-order add; absent-from-list contributes +0.0).
    *
    * Scale shape: the cross join replicates the list-K-bounded `lex`
    * (≤ listK rows, broadcast) once per distinct query id — irreducible
    * for fusion (every query fuses against the full lexical list) and
    * output-sized, never corpus-sized; the rank window partitions by
    * query_id over ≤ listKLex + listKDense rows per query.
    */
  def rrfFusePerQuery(lex: DataFrame, dense: DataFrame, kRrf: Double = 60.0,
                      k: Int = 20): DataFrame = {
    val qids = dense.select(col("query_id")).distinct()
    val l = qids.crossJoin(broadcast(
      lex.select(col("doc_id"), col("rk").as("r_a"))))
    val d = dense.select(col("query_id"), col("doc_id"), col("rk").as("r_b"))
    val j = l.join(d, Seq("query_id", "doc_id"), "full_outer")
    def contrib(c: Column): Column =
      when(c.isNotNull, lit(1.0) / (lit(kRrf) + c.cast(DoubleType)))
        .otherwise(lit(0.0))
    j.select(col("query_id"), col("doc_id"),
        coalesce(col("r_a"), lit(0L)).cast(LongType).as("r_a"),
        coalesce(col("r_b"), lit(0L)).cast(LongType).as("r_b"),
        (contrib(col("r_a")) + contrib(col("r_b"))).as("score"))
      .withColumn("rk", row_number()
        .over(Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc))
        .cast(LongType))
      .filter(col("rk") <= k)
      .drop("score")
  }

  /** Reciprocal-rank fusion of two rankings (Cormack et al., SIGIR'09):
    * fused(d) = 1/(kRrf + r_a(d)) + 1/(kRrf + r_b(d)), a document absent
    * from one list contributing +0.0 from that list. Ranks are exact
    * integers, each contribution is ONE IEEE division, and the two-term add
    * is a fixed-order expression — the fusion replays bit-for-bit in any
    * engine. Inputs are (doc_id, rk) frames already cut to their top lists,
    * so the fusion itself is list-sized, not corpus-sized.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, kRrf: Double = 60.0,
              k: Int = 20): DataFrame = {
    val l = a.select(col("doc_id"), col("rk").as("r_a"))
    val r = b.select(col("doc_id"), col("rk").as("r_b"))
    val j = l.join(r, Seq("doc_id"), "full_outer")
    def contrib(c: Column): Column =
      when(c.isNotNull, lit(1.0) / (lit(kRrf) + c.cast(DoubleType)))
        .otherwise(lit(0.0))
    val fused = j.select(col("doc_id"),
      coalesce(col("r_a"), lit(0L)).cast(LongType).as("r_a"),
      coalesce(col("r_b"), lit(0L)).cast(LongType).as("r_b"),
      (contrib(col("r_a")) + contrib(col("r_b"))).as("score"))
    fused.orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id").asc))
        .cast(LongType))
      .drop("score")
  }
}
