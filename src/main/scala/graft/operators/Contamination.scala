package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening for training corpora (SURVEY.md §2e):
  * find corpus documents sharing ≥ `minShared` word k-shingles with any
  * benchmark document — the standard n-gram-overlap decontamination check.
  *
  * Shape: collapse each side to DISTINCT shingle sets (documents with
  * identical sets overlap identically — the simhashPairs/embeddingPairs
  * exact-collapse scheme), explode shingle HASHES of the representatives,
  * ONE equi-join shuffle on 8-byte keys, a rep-pair-count aggregation,
  * then an output-sized expansion back to document pairs. On replicated
  * corpora the overlap join shrinks by the square of the copy
  * multiplicity. Hashing shrinks the shuffle ~4-8× versus string shingles
  * and cannot move a ≥minShared count (64-bit collisions), so the
  * string-based DuckDB oracle still matches exactly.
  */
object Contamination {

  /** `excludeSelfPairs` — drop pairs whose ids are equal. Correct ONLY
    * when the benchmark rows are drawn from the corpus id space (the
    * screening-your-own-snapshot shape this operator's queries use); with
    * INDEPENDENT id domains a coincidental id collision would silently
    * hide a true contamination pair — pass false there. Null ids never
    * pair either way (the comparison is null-propagating).
    */
  def sharedShingles(corpus: DataFrame, bench: DataFrame,
                     textCol: String, idCol: String,
                     k: Int = 3, minShared: Int = 3,
                     excludeSelfPairs: Boolean = true): DataFrame = {
    // canonical distinct-sorted shingle-hash set per document (map-side,
    // one fused pass — the builder emits SORTED DISTINCT hashes itself; no
    // text or token array ever crosses the wire)
    def sets(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"${side}_id"),
        graft.functions.ShingleHash
          .wordShingleHashes(col(textCol), k, sorted = true).as("set"))
    // no checkpoints: the grouping exchange canonicalizes identically for
    // every consumer, so ReuseExchange materializes it once per side
    def collapse(s: DataFrame, side: String): (DataFrame, DataFrame) = {
      val g = s.groupBy(col("set")).agg(min(col(s"${side}_id")).as(s"${side}_rep"))
      val members = s.join(g, "set")
        .select(col(s"${side}_id"), col(s"${side}_rep"))
      val reps = g.select(col(s"${side}_rep"), col("set"))
      (reps, members)
    }
    val (cReps, cMembers) = collapse(sets(corpus, "corpus"), "corpus")
    val (bReps, bMembers) = collapse(sets(bench, "bench"), "bench")
    // rep-level overlap counts (identical-set rep pairs flow through the
    // same join — their overlap is the full set, no special case)
    val repPairs = cReps.select(col("corpus_rep"), explode(col("set")).as("sh"))
      .join(bReps.select(col("bench_rep"), explode(col("set")).as("sh")), "sh")
      .groupBy(col("corpus_rep"), col("bench_rep"))
      // plain count: each rep's set is distinct by construction, so
      // (corpus_rep, bench_rep, sh) rows are already unique
      .agg(count(col("sh")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // expand to document pairs — output-sized; the self-pair exclusion
    // applies at the MEMBER level, exactly like the uncollapsed join did
    val expanded = repPairs
      .join(cMembers, "corpus_rep")
      .join(bMembers, "bench_rep")
    (if (excludeSelfPairs) expanded.filter(col("corpus_id") =!= col("bench_id"))
     else expanded)
      .select(col("corpus_id"), col("bench_id"), col("n_shared"))
  }
}
