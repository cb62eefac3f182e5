package graft

class SketchSpec extends SparkSpec {

  test("approx_count_distinct estimate lands within rsd bounds of exact") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val exact = graft.tables.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val flag = r.getString(0)
      val est = r.getLong(1).toDouble
      val ex = exact(flag).toDouble
      // rsd 0.02 → allow generous 5x band
      assert(math.abs(est - ex) / ex < 0.10, s"$flag: est=$est exact=$ex")
    }
  }
}
