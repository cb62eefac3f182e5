package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Throwaway job-level profiler for the LSM ingest drains (r20): registers
  * a listener that logs every Spark job's wall-clock and description during
  * a replicated 3-slice postings/windows drain, so the per-append cost
  * decomposes into named jobs + driver-side gaps instead of one opaque
  * number. Cf. [[ProfileIngest]] (phase-level), [[ProfileGraphAnn]].
  */
object ProfileAppendJobs {
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var lastEnd = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name.take(80)))
          .getOrElse("?")
        val gap = (System.nanoTime() - lastEnd) / 1e6
        starts.put(js.jobId, (System.nanoTime(), desc))
        if (gap > 50) println(f"[jobs]   (driver gap ${gap}%.0f ms)")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        lastEnd = System.nanoTime()
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          println(f"[jobs] job ${je.jobId}%3d ${ms}%7.0f ms  $desc")
        }
      }
    })
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(30) // let job-end events flush before the banner
      println(f"[profile] ==== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
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
    // one warm round (no logging detail needed) then one logged round
    for (round <- 1 to 2) {
      println(s"[profile] ######## ROUND $round ########")
      val post = java.nio.file.Files
        .createTempDirectory(s"graft_profj_post_$round").toString + "/s"
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
        .createTempDirectory(s"graft_profj_win_$round").toString + "/s"
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
