package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Stats power sums must stay exact where 64-bit accumulation would
  * overflow — the DECIMAL(38,0) path is the 100 TB story.
  */
class StatsSpec extends SparkSpec {

  test("powerSums exact beyond long overflow (sum of squares > 2^63)") {
    import spark.implicits._
    // 4000 rows of ~3e9-cent values: per-row square ~9e18 fits a long,
    // but the SUM of squares is ~3.6e22 — 4000x past Long.MaxValue.
    val vals = (0 until 4000).map(i => 3000000000L + i * 1001L)
    val df = vals.toDF("q").withColumn("d", col("q") % 97)
    val row = Stats.powerSums(df, lit(1), col("q"), col("d")).collect().head

    val exp = vals.map(BigInt(_))
    val expD = vals.map(v => BigInt(v % 97))
    assert(row.getAs[Long]("n") == 4000L)
    assert(BigInt(row.getAs[java.math.BigDecimal]("sq").toBigInteger) == exp.sum)
    assert(BigInt(row.getAs[java.math.BigDecimal]("sqq").toBigInteger) ==
      exp.map(x => x * x).sum)
    assert(exp.map(x => x * x).sum > BigInt(Long.MaxValue),
      "fixture must actually exceed long capacity")
    assert(BigInt(row.getAs[java.math.BigDecimal]("sqd").toBigInteger) ==
      exp.zip(expD).map { case (a, b) => a * b }.sum)
  }

  test("moments from decimal sums match BigDecimal-exact derivation") {
    import spark.implicits._
    val vals = (1 to 1000).map(i => (i % 13).toLong * 100L)
    val df = vals.toDF("q").withColumn("d", (col("q") * 7) % 31)
    val row = Stats.powerSums(df, lit(1), col("q"), col("d"))
      .select(Stats.sampleVar(col("n"), col("sqq"), col("sq"), 10000.0).as("v"),
        Stats.corrFromSums(col("n"), col("sq"), col("sd"),
          col("sqq"), col("sdd"), col("sqd")).as("c"))
      .collect().head

    val n = vals.size
    val q = vals.map(BigInt(_)); val d = vals.map(v => BigInt((v * 7) % 31))
    val (sq, sqq) = (q.sum, q.map(x => x * x).sum)
    val (sd, sdd) = (d.sum, d.map(x => x * x).sum)
    val sqd = q.zip(d).map { case (a, b) => a * b }.sum
    val expVar = (BigInt(n) * sqq - sq * sq).toDouble / (n.toLong * (n - 1)).toDouble / 10000.0
    val expCorr = (BigInt(n) * sqd - sq * sd).toDouble /
      (math.sqrt((BigInt(n) * sqq - sq * sq).toDouble) *
        math.sqrt((BigInt(n) * sdd - sd * sd).toDouble))
    assert(row.getAs[Double]("v") == expVar)
    assert(row.getAs[Double]("c") == expCorr)
  }
}
