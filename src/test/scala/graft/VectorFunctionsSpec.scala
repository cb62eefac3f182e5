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
}
