package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Knn}
import graft.oracle.OracleGen.QueryVec
import graft.plans.LshKnnRule
import graft.tables.Tables

class LshKnnRuleSpec extends SparkSpec {

  private def knnDf = Knn.knn(Tables.embeddings(spark, sf0001),
    col("embedding"), col("vec_id"), QueryVec.values, 5)

  test("rule off by default: plan keeps the full scan") {
    LshKnnRule.install(spark)
    spark.conf.unset("spark.graft.ann.autoLsh")
    val plan = knnDf.queryExecution.optimizedPlan.toString
    assert(!plan.contains("dot_product")) // no bucket filter injected
    assert(knnDf.count() == 5)
  }

  test("rule on: injects the LSH bucket filter and matches annLsh output") {
    LshKnnRule.install(spark)
    spark.conf.set("spark.graft.ann.autoLsh", "true")
    try {
      val df = knnDf
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("dot_product")) // bucket CASE chain present
      val rewritten = df.collect().map(_.getAs[Long]("vec_id")).toSeq
      val direct = Ann.annLsh(Tables.embeddings(spark, sf0001), col("embedding"),
          col("vec_id"), QueryVec.values, 5)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(rewritten == direct)
      assert(rewritten.nonEmpty)
    } finally spark.conf.unset("spark.graft.ann.autoLsh")
  }
}
