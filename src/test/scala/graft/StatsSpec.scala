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

  test("tableStats reports counts, ndv, and numeric min/max per column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Option(2.0), Option("a")), (2L, Option(4.0), Option("a")),
      (3L, Option.empty[Double], Option.empty[String])).toDF("k", "x", "s")
    val out = graft.operators.Stats.tableStats(df, Seq("k", "x"), Seq("s"))
      .orderBy(col("col_name")).collect()
    val byName = out.map(r => r.getString(0) -> r).toMap
    assert(byName("k").getLong(1) == 3 && byName("k").getLong(2) == 3 &&
      byName("k").getLong(3) == 3 && byName("k").getDouble(4) == 1.0 &&
      byName("k").getDouble(5) == 3.0)
    assert(byName("x").getLong(2) == 2 && byName("x").getLong(3) == 2 &&
      byName("x").getDouble(4) == 2.0 && byName("x").getDouble(5) == 4.0)
    assert(byName("s").getLong(2) == 2 && byName("s").getLong(3) == 1 &&
      byName("s").isNullAt(4) && byName("s").isNullAt(5))
  }

  test("equiDepthHistogram bins have equal depth and ordered bounds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 80).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
    val h = graft.operators.Stats.equiDepthHistogram(df, col("v"), col("id"), 8)
      .collect()
    assert(h.length == 8)
    assert(h.forall(_.getLong(1) == 10)) // 80 rows / 8 buckets
    // bucket ranges tile the domain in order without overlap
    val sorted = h.sortBy(_.getLong(0))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) < b.getDouble(2))
    }
  }

  test("equiDepthHistogramBy: per-group depths, partitioned window only") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 120).map(i => ((i % 3).toLong, i.toLong, i * 1.5))
      .toDF("g", "id", "v")
    val out = graft.operators.Stats.equiDepthHistogramBy(
      df, col("g"), col("v"), col("id"), buckets = 4)
    // the scale contract: the ntile window partitions by group — a
    // single-partition sort of the whole relation must never appear
    val windows = planNodes(out).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "window must partition by grp")
    val rows = out.collect()
    assert(rows.length == 12) // 3 groups x 4 buckets
    assert(rows.forall(_.getLong(2) == 10)) // 40 rows per group / 4
    // within each group, bucket ranges tile in order without overlap
    rows.groupBy(_.getLong(0)).values.foreach { grp =>
      grp.sortBy(_.getLong(1)).sliding(2).foreach { case Array(a, b) =>
        assert(a.getDouble(4) < b.getDouble(3))
      case _ => ()
      }
    }
  }

  test("equiDepthHistogramApprox: empty buckets surface as flag=false rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // constant column → all sketch boundaries coincide → every row bins
    // into bucket 1 and buckets 2..8 are EMPTY: they must still appear,
    // flagged false, so an "all flags true" consumer fails honestly
    val df = Seq.fill(100)(42.0).toDF("v")
    val rows = graft.operators.Stats.equiDepthHistogramApprox(
      df, col("v"), buckets = 8, accuracy = 10000, tol = 0.05)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L),
      "every bucket row must be present even when empty")
    assert(!rows.head.getBoolean(1), "overfull bucket 1 out of tolerance")
    assert(rows.tail.forall(!_.getBoolean(1)), "empty buckets flag false")
  }

  test("equiDepthHistogramApprox: depths within tol, no window in plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 8000).map(i => ((i * 2654435761L) % 100003).toDouble)
      .toDF("v")
    val h = graft.operators.Stats.equiDepthHistogramApprox(
      df, col("v"), buckets = 8, accuracy = 10000, tol = 0.05)
    val plan = h.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"approx histogram must not sort through a window:\n$plan")
    val rows = h.collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    assert(rows.forall(_.getBoolean(1)), "every bucket depth within tol")
  }
}
