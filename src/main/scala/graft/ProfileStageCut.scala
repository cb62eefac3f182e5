package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway repro (r21): does a localCheckpoint preserve the
  * outputPartitioning of a preceding repartition(col)? The iterative
  * operators' "pre-partitioned once, rounds reuse the exchange" design
  * depends on it, and the executed q_pagerank_personalized plan shows
  * `ExistingRDD, UnknownPartitioning(0)` + a fresh per-round Exchange.
  * Tries the variants: AQE on/off, explicit numPartitions, and prints
  * whether a downstream groupBy(col) plans an Exchange.
  */
object ProfileStageCut {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def probe(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val cut = mk
      val downstream = cut.groupBy(col("k")).count()
      val plan = downstream.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val scan = plan.linesIterator.find(_.contains("ExistingRDD"))
        .getOrElse("?")
      println(s"[cut] $tag: downstreamExchanges=$nEx  scan=${scan.trim.take(120)}")
    }
    val base = spark.range(100000)
      .select((col("id") % 1000).as("k"), col("id").as("v"))
    probe("repartition(k).localCheckpoint, AQE on") {
      base.repartition(col("k")).localCheckpoint()
    }
    probe("repartition(8,k).localCheckpoint, AQE on") {
      base.repartition(8, col("k")).localCheckpoint()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    probe("repartition(k).localCheckpoint, AQE off") {
      base.repartition(col("k")).localCheckpoint()
    }
    probe("repartition(8,k).localCheckpoint, AQE off") {
      base.repartition(8, col("k")).localCheckpoint()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
