package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for q_stream_conversation_rag's per-batch
  * residue (round-16 closure of the 2x criterion): measures (a) the full
  * drained query, (b) the identical streaming pipeline with a NO-OP sink
  * (stateful resolve + state-store commits + machinery, zero retrieval),
  * and (c) the one-shot batch retrieval over the same resolved turns.
  */
object ProfileConv {
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
    // warm stage + caches once
    val _ = SparkEntry.queries("q_stream_conversation_rag")(spark, dir).collect()
    for (round <- 1 to 2) {
      time(s"full q_stream_conversation_rag (round $round)") {
        SparkEntry.queries("q_stream_conversation_rag")(spark, dir).collect()
      }
      // no-op sink: same source, same stateful resolve, zero retrieval
      time(s"stream resolve only, no-op sink (round $round)") {
        val s = graft.streaming.Streaming.streamSession(spark)
        import s.implicits._
        val src = s.readStream
          .schema(graft.tables.Tables.documents(s, dir).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(graft.streaming.Streaming.stageSplitSource(s, dir,
            "documents", "doc_id"))
        val turns = graft.operators.Conversation.deriveTurns(src)
          .as[graft.streaming.Streaming.TurnC]
        val resolved = graft.streaming.Streaming.resolveConversation(turns).toDF()
        val q = resolved.writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         _: Long) => { val _ = b.count(); () })
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // one-shot batch retrieval over the same resolved turns
      time(s"one-shot batch retrieval (round $round)") {
        SparkEntry.queries("q_conversation_rag")(spark, dir).collect()
      }
    }
    spark.stop()
  }
}
