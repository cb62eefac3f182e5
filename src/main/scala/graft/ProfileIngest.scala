package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the LSM ingest drains (the remaining
  * bench leaders after the graph-ANN rework): splits
  * q_stream_postings_ingest / q_stream_windows_ingest into stage /
  * per-append / final-compact / query phases over the same 3-slice
  * document split the bench queries drain, so the next fix targets the
  * measured concentration. Cf. [[ProfileGraphAnn]].
  */
object ProfileIngest {
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
    import graft.operators.Retrieval
    import graft.tables.Tables
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val width = (mx - mn) / 3 + 1
    val slices = (0 until 3).map { i =>
      val lo = mn + width * i
      docs.filter(col("doc_id") >= lo &&
        (if (i == 2) lit(true) else col("doc_id") < lo + width))
    }
    val q = "customer order data".split(" ").toSeq
    for (round <- 1 to 2) {
      val post = java.nio.file.Files
        .createTempDirectory(s"graft_prof_post_$round").toString + "/s"
      time(s"r$round postings stage (slice 0)") {
        Retrieval.stagePostings(slices(0), col("doc_id"), col("text"), post)
      }
      for (i <- 1 to 2) time(s"r$round postings append (slice $i)") {
        Retrieval.appendPostings(slices(i), col("doc_id"), col("text"), post)
      }
      time(s"r$round postings final compact") {
        Retrieval.compactPostings(spark, post)
      }
      time(s"r$round bm25 query") {
        Retrieval.bm25FromStage(spark, post, q).count()
      }
      val win = java.nio.file.Files
        .createTempDirectory(s"graft_prof_win_$round").toString + "/s"
      time(s"r$round windows stage (slice 0)") {
        Retrieval.stageWindows(slices(0), col("doc_id"), col("text"), win)
      }
      for (i <- 1 to 2) time(s"r$round windows append (slice $i)") {
        Retrieval.appendWindows(slices(i), col("doc_id"), col("text"), win)
      }
      time(s"r$round windows final compact (no GC)") {
        Retrieval.compactWindows(spark, win, gcOrphans = false)
      }
      time(s"r$round maxsim query") {
        Retrieval.maxSimPrunedFromStage(spark, win, q).count()
      }
    }
    spark.stop()
  }
}
