package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {

  private def eval1(c: org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    Seq(1).toDF("x").select(c).head().getDouble(0)
  }

  private def vecs(a: Seq[Double], b: Seq[Double]) = (typedlit(a), typedlit(b))

  test("l2 hand-computed") {
    val (a, b) = vecs(Seq(1.0, 2.0, 3.0), Seq(4.0, 6.0, 3.0))
    assert(eval1(l2(a, b)) == 5.0) // sqrt(9 + 16 + 0)
  }

  test("dot and cosine hand-computed") {
    val (a, b) = vecs(Seq(1.0, 0.0), Seq(0.0, 1.0))
    assert(eval1(dot(a, b)) == 0.0)
    assert(eval1(cosine(a, b)) == 0.0)
    val (c, d) = vecs(Seq(2.0, 0.0), Seq(1.0, 0.0))
    assert(eval1(cosine(c, d)) == 1.0)
  }

  // property checks over seeded random vectors (batch-evaluated in one job)
  private val rnd = new scala.util.Random(42)
  private def randVec(n: Int): Seq[Double] = Seq.fill(n)(rnd.nextDouble() * 20 - 10)
  private val pairs: Seq[(Seq[Double], Seq[Double])] =
    Seq.fill(25)((randVec(8), randVec(8)))

  test("metric axioms: non-negativity, identity, symmetry") {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      l2($"a", $"b").as("dab"), l2($"b", $"a").as("dba"), l2($"a", $"a").as("daa")
    ).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0)
      assert(r.getDouble(0) == r.getDouble(1)) // symmetric term-by-term squares
      assert(r.getDouble(2) == 0.0)
    }
  }

  test("cosine bounded in [-1, 1]") {
    import spark.implicits._
    val rows = pairs.toDF("a", "b").select(cosine($"a", $"b")).collect()
    rows.foreach(r => assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9))
  }

  test("normalize yields unit norm") {
    val v = typedlit(Seq(3.0, 4.0))
    assert(eval1(norm(normalize(v))) == 1.0)
  }

  test("dimIs guards mismatched dims") {
    import spark.implicits._
    val df = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("v")
    assert(df.filter(dimIs($"v", 2)).count() == 1)
  }

  test("random projection: sign matrix is balanced and projection matches driver fold") {
    import spark.implicits._
    // roughly half the 64×8 signs should be negative (fixed formula, not random)
    val neg = (for (i <- 0 until 64; j <- 0 until 8) yield randProjSign(i, j))
      .count(_ < 0)
    assert(neg > 64 * 8 / 4 && neg < 64 * 8 * 3 / 4)
    // projecting a constant vector through the Column chain equals the
    // driver-side fold bit for bit (same association)
    val v = (0 until 64).map(i => ((i * 37) % 100) / 100.0 - 0.5)
    val expected = randProjectQuery(v, 8)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(randProject($"v", 64, 8)).head.getSeq[Double](0)
    assert(got == expected)
  }

  test("random projection preserves L2 within JL distortion on real embeddings") {
    val emb: Seq[(Long, Seq[Double])] =
      graft.tables.Tables.embeddings(spark, sf0001)
        .limit(40).collect().toSeq
        .map { r =>
          val i = r.fieldIndex("embedding")
          (r.getAs[Long]("vec_id"), r.getSeq[Float](i).map(_.toDouble))
        }
    def l2d(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    def proj(v: Seq[Double]): Seq[Double] =
      (0 until 8).map(j => v.indices.map(i =>
        if (randProjSign(i, j) > 0) v(i) else -v(i)).sum / math.sqrt(8.0))
    val ratios = for {
      (ai, av) <- emb; (bi, bv) <- emb if ai < bi
      orig = l2d(av, bv) if orig > 1e-9
    } yield l2d(proj(av), proj(bv)) / orig
    // 8-of-64 JL is coarse; assert the distortion is bounded, not tight
    assert(ratios.nonEmpty)
    assert(ratios.count(r => r > 0.2 && r < 3.0).toDouble / ratios.size > 0.95)
  }
}
