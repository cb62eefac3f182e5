package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the graph-ANN streaming pair (round-19
  * closure of the top-2 bench drains): splits q_stream_graph_ann into its
  * build / append / policy-compact / final-walk / recall-row phases and
  * q_stream_graph_serve into stage / drain / assemble, so the next fix
  * targets the measured concentration instead of the suspected one.
  */
object ProfileGraphAnn {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.GraphAnnIndex
    import graft.tables.Tables
    // replicate the drain's batch split (3 slices by vec_id range)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val mm = emb.agg(min(col("vec_id")), max(col("vec_id"))).head()
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val width = (mx - mn) / 3 + 1
    val slices = (0 until 3).map { i =>
      val lo = mn + width * i
      emb.filter(col("vec_id") >= lo &&
        (if (i == 2) lit(true) else col("vec_id") < lo + width))
    }
    println(s"[profile] rows per slice: ${slices.map(_.count()).mkString(", ")}")
    for (round <- 1 to 2) {
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft_prof_gann_$round").toString + "/idx"
      time(s"r$round build (slice 0)") {
        GraphAnnIndex.build(slices(0), col("vec_id"), col("embedding"), idx)
      }
      for (i <- 1 to 2) {
        time(s"r$round append (slice $i)") {
          GraphAnnIndex.append(slices(i), col("vec_id"), col("embedding"), idx)
        }
        time(s"r$round compactIfFragmented after slice $i") {
          val fired = GraphAnnIndex.compactIfFragmented(spark, idx)
          println(s"[profile]   fired=$fired")
        }
      }
      val visited = time(s"r$round final walk (query)") {
        GraphAnnIndex.query(spark, idx, graft.oracle.OracleGen.QueryVec.values,
          beam = 16, hops = 6).localCheckpoint()
      }
      val qs = Seq(2L, 4L, 6L, 8L).map(b =>
        (b, graft.oracle.OracleGen.QueryVec.shiftedValues(b.toInt)))
      import spark.implicits._
      val qdf = qs.toDF("q_id", "q_vec")
      time(s"r$round queryBatch COLD-ish (post-walk, cache warm)") {
        GraphAnnIndex.queryBatch(spark, idx, qdf).collect()
      }
      time(s"r$round queryBatch WARM") {
        GraphAnnIndex.queryBatch(spark, idx, qdf).collect()
      }
      time(s"r$round queryBatch WARM, AQE off") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try GraphAnnIndex.queryBatch(spark, idx, qdf).collect()
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      time(s"r$round queryBatch WARM, shuffle=4") {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try GraphAnnIndex.queryBatch(spark, idx, qdf).collect()
        finally spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
      time(s"r$round queryBatch WARM, AQE off + shuffle=4") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try GraphAnnIndex.queryBatch(spark, idx, qdf).collect()
        finally {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          spark.conf.set("spark.sql.shuffle.partitions", "32")
        }
      }
      time(s"r$round recall row (exact knn compare)") {
        val approx = visited.orderBy(col("distance").asc, col("id").asc)
          .limit(10).select(col("id")).collect().map(_.getLong(0)).toSet
        val exact = graft.operators.Knn.knn(emb, col("embedding"),
            col("vec_id"), graft.oracle.OracleGen.QueryVec.values, 10)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        println(s"[profile]   recall=${(approx & exact).size / 10.0}")
      }
    }
    spark.stop()
  }
}
