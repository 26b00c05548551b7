package graft

import graft.operators.Embeddings
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jacobiEigen recovers a known spectrum") {
    // diag(5,2,1) rotated by a known orthogonal matrix stays {5,2,1}
    val theta = 0.3
    val r = Array(
      Array(math.cos(theta), -math.sin(theta), 0.0),
      Array(math.sin(theta), math.cos(theta), 0.0),
      Array(0.0, 0.0, 1.0))
    val diag = Array(Array(5.0, 0, 0), Array(0.0, 2, 0), Array(0.0, 0, 1))
    def mul(a: Array[Array[Double]], b: Array[Array[Double]]) =
      Array.tabulate(3, 3)((i, j) => (0 until 3).map(k => a(i)(k) * b(k)(j)).sum)
    val m = mul(mul(r, diag), r.map(_.clone()).transpose)
    val (vals, _) = Embeddings.jacobiEigen(m)
    assert(vals.sorted.zip(Array(1.0, 2.0, 5.0)).forall {
      case (got, want) => math.abs(got - want) < 1e-10
    }, vals.toSeq.toString)
  }

  test("jacobiEigen diagonalizes equal-diagonal matrices (theta = 0 rotation)") {
    // regression (r8 review): math.signum(0.0) == 0 made the rotation a
    // NO-OP whenever the two diagonal entries were equal — [[1,.5],[.5,1]]
    // (any standardized pair) returned eigenvalues {1,1} instead of
    // {1.5, 0.5} with no error
    val (vals, vecs) = Embeddings.jacobiEigen(
      Array(Array(1.0, 0.5), Array(0.5, 1.0)))
    assert(vals.sorted.zip(Array(0.5, 1.5)).forall {
      case (got, want) => math.abs(got - want) < 1e-12
    }, vals.toSeq.toString)
    // eigenvectors are the +-45-degree directions
    assert(vecs.forall(v => math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-12))
  }

  test("pcaTrain finds planted principal directions; basis orthonormal; eigvals ordered") {
    val rnd = new scala.util.Random(5)
    // variance 9 along axis0, 1 along axis1, ~0.01 along axis2/3
    val data = (1 to 800).map { i =>
      (i.toLong, Array(rnd.nextGaussian() * 3, rnd.nextGaussian(),
        rnd.nextGaussian() * 0.1, rnd.nextGaussian() * 0.1).map(_.toFloat).toSeq)
    }.toDF("id", "v")
    val m = Embeddings.pcaTrain(data, "v", k = 4, scaleBits = 24)
    // ordered eigenvalues
    assert(m.eigvals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(math.abs(m.eigvals(0) - 9.0) < 1.5 && math.abs(m.eigvals(1) - 1.0) < 0.3)
    // top component is the planted axis0 (up to sign, pinned positive)
    assert(math.abs(m.basis(0)(0)) > 0.99, m.basis(0).toSeq.toString)
    // orthonormality
    for (i <- m.basis.indices; j <- m.basis.indices) {
      val dot = m.basis(i).zip(m.basis(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"basis($i)·basis($j)=$dot")
    }
  }

  test("fixed-point Gram makes the model bit-identical across partitionings") {
    val e = Tables.embeddings(spark, TestSpark.sf).select("vec_id", "embedding")
    val m1 = Embeddings.pcaTrain(e.repartition(1), "embedding", k = 8)
    val m32 = Embeddings.pcaTrain(e.repartition(32), "embedding", k = 8)
    assert(m1.mean.toSeq == m32.mean.toSeq)
    assert(m1.eigvals.toSeq == m32.eigvals.toSeq)
    assert(m1.basis.map(_.toSeq).toSeq == m32.basis.map(_.toSeq).toSeq)
  }

  test("whitened projection has unit per-component variance") {
    val e = Tables.embeddings(spark, TestSpark.sf).select("vec_id", "embedding")
    val m = Embeddings.pcaTrain(e, "embedding", k = 4)
    val stats = Embeddings.pcaProject(e, "embedding", m, whiten = true)
      .select(posexplode(col("pca")).as(Seq("c", "y")))
      .groupBy("c").agg(variance(col("y")).as("var"))
      .as[(Int, Double)].collect()
    stats.foreach { case (c, v) =>
      assert(math.abs(v - 1.0) < 0.1, s"component $c whitened variance $v")
    }
  }

  test("OPQ-style composition: PCA-truncate -> PQ index serves with usable recall") {
    val e = Tables.embeddings(spark, TestSpark.sf).select("vec_id", "embedding")
      .filter(col("vec_id") < 400)
    val m = Embeddings.pcaTrain(e, "embedding", k = 32)
    val proj = Embeddings.pcaProject(e, "embedding", m, outCol = "pv")
      .select(col("vec_id"), col("pv").as("embedding"))
      .localCheckpoint() // three consumers: train, index, queries
    val queries = proj.filter(col("vec_id") < 5)
    val truth = graft.operators.Similarity
      .bruteForceTopK(proj, queries, "embedding", "vec_id", k = 10)
      .select("query_id", "corpus_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val books = graft.operators.Similarity.pqTrain(proj, "embedding", m = 8, ksub = 16)
    val got = graft.operators.Similarity
      .pqTopK(proj, queries, "embedding", "vec_id", 10, books)
      .select("query_id", "corpus_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = truth.keys.map { q =>
      got.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble / truth(q).size
    }.toSeq
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"PCA->PQ recall@10 too low: $mean")
  }

  test("projection variance matches eigenvalues; pcaProject is shuffle-free") {
    val e = Tables.embeddings(spark, TestSpark.sf).select("vec_id", "embedding")
    val m = Embeddings.pcaTrain(e, "embedding", k = 4)
    val proj = Embeddings.pcaProject(e, "embedding", m)
    // per-component sample variance ~ eigenvalue (population vs sample: n large)
    val stats = proj.select(posexplode(col("pca")).as(Seq("c", "y")))
      .groupBy("c").agg(variance(col("y")).as("var"), avg(col("y")).as("mu"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    stats.foreach { case (c, v, mu) =>
      assert(math.abs(mu) < 0.05, s"component $c not centered: $mu")
      val ev = m.eigvals(c)
      assert(math.abs(v - ev) / math.max(ev, 1e-9) < 0.1,
        s"component $c: var $v vs eigval $ev")
    }
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = proj.queryExecution.executedPlan
    assert(plan.collect { case ex: ShuffleExchangeExec => ex }.isEmpty,
      s"projection must be per-row work:\n$plan")
  }
}
