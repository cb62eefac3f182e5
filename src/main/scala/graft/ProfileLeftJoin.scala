package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Throwaway profiler for the stream-stream join drains (r21, VERDICT
  * task 1): runs q_stream_left_join / q_stream_join exactly as the bench
  * does, with (a) a job listener logging every Spark job's wall-clock +
  * description + driver gaps (the ProfileAppendJobs pattern) and (b) a
  * StreamingQueryListener dumping each micro-batch's durationMs
  * decomposition (addBatch / getBatch / walCommit / commitOffsets /
  * queryPlanning / triggerExecution) and state-store operator metrics
  * (commit time, state rows, memory) — the per-batch evidence the
  * verdict asks for: is the ~6 s fixed micro-batch machinery, and
  * where inside a batch does it go?
  */
object ProfileLeftJoin {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LISTING_PAR_THRESHOLD", "128"))
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
    // registered on each CLONED streaming session below (the manager is
    // per-session, so a root-session registration would miss the drains)
    val progressListener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[batch] id=${p.batchId} rows=${p.numInputRows} $dur")
        p.stateOperators.foreach { so =>
          println(s"[state]   op=${so.operatorName} commitMs=${so.commitTimeMs}" +
            s" rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated}" +
            s" removed=${so.numRowsRemoved} memUsed=${so.memoryUsedBytes}")
        }
      }
    }
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(60) // let listener events flush before the banner
      println(f"[profile] ==== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.tables.Tables
    // ---- identical construction to q_stream_left_join in SparkEntry ----
    val parts = sys.env.get("GRAFT_PROF_PARTS").map(_.toInt).getOrElse(4)
    val noData = !sys.env.contains("GRAFT_PROF_NODATA_OFF")
    println(s"[profile] config: partitions=$parts noDataBatches=$noData")
    def runLeftJoin(tag: String): Unit = {
      val s = graft.streaming.Streaming.streamSession(spark, partitions = parts)
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        noData.toString)
      s.streams.addListener(progressListener)
      val schema = Tables.events(s, dir).schema
      val staged = graft.streaming.Streaming.stageSplitSourceWithFlush(
        s, dir, "events", "ts", "flushlj",
        (df, mx) => df.limit(1).select(
          lit(-1L).as("event_id"),
          lit(mx + 365L * 24 * 3600 * 1000000000L).as("ts"),
          lit(-1L).as("user_id"),
          explode(array(lit("purchase"), lit("error"))).as("event_type"),
          lit(0.0).as("value"), lit("").as("props")))
      def src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_event"),
          timestamp_micros(expr("ts div 1000")).as("p_ts"))
      val errors = src.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("event_id").as("e_event"),
          timestamp_micros(expr("ts div 1000")).as("e_ts"))
      val joined = graft.streaming.Streaming.intervalJoinKeys(
          purchases, errors, "p_user", "e_user", "p_ts", "e_ts",
          within = "1 hour", watermarkDelay = "2 hours",
          joinType = "left_outer")
        .select(col("p_user").as("user_id"), col("p_event"), col("e_event"),
          unix_micros(col("p_ts")).as("p_us"), unix_micros(col("e_ts")).as("e_us"))
      val n = time(s"$tag drain") {
        graft.streaming.Streaming.drainAppendToParquet(joined,
            "profljoin_" + Integer.toHexString(dir.hashCode))
          .filter(col("p_event") =!= -1L).count()
      }
      println(s"[profile] $tag rows=$n")
    }
    def runInnerJoin(tag: String): Unit = {
      val s = graft.streaming.Streaming.streamSession(spark, partitions = parts)
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        noData.toString)
      s.streams.addListener(progressListener)
      val schema = Tables.events(s, dir).schema
      val staged = graft.streaming.Streaming.stageSplitSource(s, dir, "events", "ts")
      def src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_event"),
          timestamp_micros(expr("ts div 1000")).as("p_ts"))
      val errors = src.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("event_id").as("e_event"),
          timestamp_micros(expr("ts div 1000")).as("e_ts"))
      val joined = graft.streaming.Streaming.intervalJoinKeys(
          purchases, errors, "p_user", "e_user", "p_ts", "e_ts",
          within = "1 hour", watermarkDelay = "2 hours")
        .select(col("p_user").as("user_id"), col("p_event"), col("e_event"),
          unix_micros(col("p_ts")).as("p_us"), unix_micros(col("e_ts")).as("e_us"))
      val n = time(s"$tag drain") {
        graft.streaming.Streaming.drainAppendToParquet(joined,
          "profjoin_" + Integer.toHexString(dir.hashCode)).count()
      }
      println(s"[profile] $tag rows=$n")
    }
    // warm round then measured rounds (the bench itself is min-of-2 warm)
    for (round <- 1 to 3) {
      println(s"[profile] ######## ROUND $round ########")
      runLeftJoin(s"r$round left_join")
      runInnerJoin(s"r$round inner_join")
    }
    spark.stop()
  }
}
