package graft

import graft.operators.{Corpus, FuzzyJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 analytics operators: blocked fuzzy linkage, tf/df keyword
  * extraction, ordered funnel composition.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fuzzy join links within blocks by edit distance, with exact distances") {
    val left = Seq((1L, "alpha-01"), (2L, "gamma-77"), (3L, "delta-02"))
      .toDF("id", "name")
    val right = Seq((10L, "alpha-02"), (20L, "gamma-99"), (30L, "alphx-01"))
      .toDF("id", "name")
    // block on the alphabetic stem so only same-stem pairs are candidates
    val got = FuzzyJoin.byEditDistance(left, "id", "name", right, "id", "name",
        blockKey = c => regexp_replace(c, "[^a-z]", ""), maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    // alpha-01~alpha-02 dist1; alpha-01~alphx-01 would be dist1 but the
    // stem differs -> different block; gamma-77~gamma-99 dist2
    assert(got == Set((1L, 10L, 1L), (2L, 20L, 2L)))
  }

  test("fuzzy join plan is a keyed equi-join — no cartesian product") {
    val df = Seq((1L, "aa"), (2L, "ab")).toDF("id", "name")
    val plan = FuzzyJoin.byEditDistance(df, "id", "name", df, "id", "name",
        blockKey = c => substring(c, 1, 1), maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("tfIdfTopK ranks distinctive terms above ubiquitous ones, ties on token") {
    val docs = Seq(
      (1L, "spark spark spark common"),
      (2L, "duck duck common common"),
      (3L, "common words here here")
    ).toDF("doc_id", "text")
    val got = Corpus.tfIdfTopK(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._5) -> (r._2, r._3, r._4)).toMap
    // doc 1: spark tf3 df1 -> 3.0 beats common tf1 df3
    assert(got((1L, 1L)) == ("spark", 3L, 1L))
    assert(got((1L, 2L)) == ("common", 1L, 3L))
    // doc 2: duck tf2 df1 -> 2.0 beats common tf2 df3
    assert(got((2L, 1L)) == ("duck", 2L, 1L))
    // doc 3: here tf2 df1 -> 2.0; words tf1 df1 -> 1.0 beats common 1/3
    assert(got((3L, 1L)) == ("here", 2L, 1L))
    assert(got((3L, 2L)) == ("words", 1L, 1L))
  }

  test("tfIdfTopK drops short tokens and is deterministic on score ties") {
    val docs = Seq((1L, "zz bb aa ccc aaa bbb")).toDF("doc_id", "text")
    val got = Corpus.tfIdfTopK(docs, "doc_id", "text", k = 3)
      .orderBy("rk").as[(Long, String, Long, Long, Long)].collect()
    // 2-char tokens gone; aaa/bbb/ccc all tf1 df1 -> tie broken by token asc
    assert(got.map(_._2).toSeq == Seq("aaa", "bbb", "ccc"))
  }

  test("funnel stages require temporal order, not mere event presence") {
    // build a tiny events table through the registered query path by
    // replaying its semantics: user 1 completes in order; user 2 clicked
    // BEFORE viewing (click must not count); user 3 views only
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "click", 100L), (2L, "view", 200L), (2L, "purchase", 300L),
      (3L, "view", 100L)
    ).toDF("user_id", "event_type", "us")
    val viewed = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val clicked = ev.filter(col("event_type") === "click")
      .join(viewed, "user_id").where(col("us") >= col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val purchased = ev.filter(col("event_type") === "purchase")
      .join(clicked, "user_id").where(col("us") >= col("t2"))
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    assert(viewed.count() == 3)
    assert(clicked.as[(Long, Long)].collect().toSet == Set((1L, 200L)))
    assert(purchased.as[(Long, Long)].collect().toSet == Set((1L, 300L)))
  }

  test("histogram buckets values equi-width, clamps the top edge, drops out-of-range") {
    val df = Seq(0.0, 1.0, 2.5, 4.9, 5.0, 9.9, 10.0, -1.0, 11.0).toDF("v")
    val got = graft.operators.Profiling.histogram(df, "v", 0.0, 10.0, 5)
      .as[(Long, Double, Double, Long)].collect().toSet
    assert(got == Set(
      (0L, 0.0, 2.0, 2L),   // 0.0, 1.0
      (1L, 2.0, 4.0, 1L),   // 2.5
      (2L, 4.0, 6.0, 2L),   // 4.9, 5.0
      (4L, 8.0, 10.0, 2L)   // 9.9 and 10.0 (hi clamps into the last bucket)
    ), got.toString)
  }

  test("corrExact is exactly 1 on linear data and sign-correct on inverse data") {
    val lin = (1 to 20).map(i => (i.toDouble, 2.0 * i)).toDF("x", "y")
    val (n, c) = graft.operators.Profiling.corrExact(lin, "x", "y")
      .as[(Long, Double)].collect()(0)
    assert(n == 20L && c == 1.0, s"($n, $c)")
    val inv = (1 to 20).map(i => (i.toDouble, -3.0 * i + 100)).toDF("x", "y")
    val c2 = graft.operators.Profiling.corrExact(inv, "x", "y")
      .as[(Long, Double)].collect()(0)._2
    assert(c2 == -1.0, c2.toString)
  }

  test("corrExact drops one-sided DECIMAL-overflow rows from ALL moments") {
    // y = 1e13 exceeds DECIMAL(18,6)'s 12 integral digits while x fits:
    // before the r9 fix that row left n/sx/sxx/sxy but stayed in sy/syy,
    // silently skewing the correlation. With the row filtered everywhere,
    // the result equals corrExact over the clean subset alone.
    val clean = (1 to 20).map(i => (i.toDouble, 2.0 * i + 5))
    val dirty = clean :+ (3.5, 1.0e13)
    val got = graft.operators.Profiling.corrExact(dirty.toDF("x", "y"), "x", "y")
      .as[(Long, Double)].collect()(0)
    val want = graft.operators.Profiling.corrExact(clean.toDF("x", "y"), "x", "y")
      .as[(Long, Double)].collect()(0)
    assert(got == want && got._1 == 20L, s"got $got want $want")
  }

  test("registered analytics queries return rows at sf0.001") {
    val dir = TestSpark.sf
    Seq("q29_fuzzy_link", "d_tfidf", "q30_funnel").foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
