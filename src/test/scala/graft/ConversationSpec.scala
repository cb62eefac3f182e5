package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Conversation
import graft.streaming.Streaming

/** Multi-turn conversation state: follow-up resolution semantics, the
  * df-cap scale guard on per-turn retrieval, and batch/stateful-twin
  * agreement on the derived driver corpus.
  */
class ConversationSpec extends SparkSpec {

  private def turnsDf(rows: Seq[(Long, Long, String)]) = {
    val schema = StructType(Seq(
      StructField("conv_id", LongType), StructField("turn_no", LongType),
      StructField("utterance", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
      schema)
  }

  test("follow-ups inherit the most recent preceding anchor; leading follow-ups stand alone") {
    val turns = turnsDf(Seq(
      (1L, 1L, "what about red"),                      // follow-up, NO anchor yet
      (1L, 2L, "show me waterproof hiking boots for winter trails"),
      (1L, 3L, "what about blue"),                     // inherits turn 2
      (1L, 4L, "any cheap lightweight trail running shoes in stock"),
      (1L, 5L, "what about green"),                    // inherits turn 4 (not 2)
      (2L, 1L, "list all winter jackets with a hood today"),
      (2L, 2L, "cheaper ones")))                       // other conv: own anchor
    val got = Conversation.resolveTurns(turns)
      .orderBy(col("conv_id"), col("turn_no"))
      .select(col("is_followup"), col("resolved_query"))
      .collect().map(r => (r.getBoolean(0), r.getString(1)))
    assert(got(0) === (true, "what about red")) // unresolvable: stays as-is
    assert(got(1)._1 === false)
    assert(got(2) === (true,
      "show me waterproof hiking boots for winter trails what about blue"))
    assert(got(4) === (true,
      "any cheap lightweight trail running shoes in stock what about green"))
    assert(got(6) === (true,
      "list all winter jackets with a hood today cheaper ones"))
  }

  test("retrieveForTurns df-cap drops hot tokens before the join") {
    val resolved = turnsDf(Seq((1L, 1L, "stopword rareword")))
      .withColumn("is_followup", lit(false))
      .withColumn("resolved_query", col("utterance"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        // "stopword" in all 4 docs, "rareword" only in doc 3
        Seq(Row(1L, "stopword alpha"), Row(2L, "stopword beta"),
          Row(3L, "stopword rareword"), Row(4L, "stopword gamma"))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    val capped = Conversation.retrieveForTurns(resolved, docs, k = 10, maxDf = 2)
      .collect()
    // stopword (df=4) is pruned; only doc 3 matches via rareword
    assert(capped.map(_.getAs[Long]("doc_id")).toSeq === Seq(3L))
    val uncapped = Conversation.retrieveForTurns(resolved, docs, k = 10)
    assert(uncapped.count() === 4) // all docs match via stopword
    // doc 3 ranks first: it matches both tokens and rareword's idf is higher
    assert(uncapped.orderBy(col("rank")).first().getAs[Long]("doc_id") === 3L)
  }

  test("retrieveForTurns maxPostings keeps each token's top-N by (tf desc, doc_id) and stays exact for surviving docs") {
    val resolved = turnsDf(Seq((1L, 1L, "term")))
      .withColumn("is_followup", lit(false))
      .withColumn("resolved_query", col("utterance"))
    // tf per doc: doc1=3, doc2=2, doc3=2, doc4=1 — maxPostings=2 must keep
    // docs 1 and 2 (tf desc, then doc_id breaks the 2-vs-2 tie)
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, "term term term"), Row(2L, "term term x"),
          Row(3L, "term term y"), Row(4L, "term z"))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    val got = Conversation.retrieveForTurns(resolved, docs, k = 10,
        maxPostings = 2)
      .orderBy(col("rank")).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    // scores of survivors match the untruncated run exactly (idf is over
    // the FULL df, so truncation only removes tail docs, never rescoring)
    val full = Conversation.retrieveForTurns(resolved, docs, k = 10)
      .orderBy(col("rank")).collect()
    assert(full.take(2).map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("score_fp"))).toSeq ===
      got.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_fp"))).toSeq)
  }

  test("broadcastTermsMaxRows conf forces the shuffle-merge path at 0 with identical rows") {
    val resolved = turnsDf(Seq((1L, 1L, "alpha rareword")))
      .withColumn("is_followup", lit(false))
      .withColumn("resolved_query", col("utterance"))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, "alpha beta"), Row(2L, "alpha rareword"),
          Row(3L, "gamma rareword"))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    def run() = Conversation.retrieveForTurns(resolved, docs, k = 10)
    val broadcastRows = run().orderBy(col("rank"), col("doc_id"))
      .collect().map(_.toString).toSeq
    assert(run().queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    spark.conf.set(Conversation.BroadcastTermsMaxRowsConf, "0")
    try {
      val df = run()
      // the bound is a plan decision only — rows must be identical
      assert(df.orderBy(col("rank"), col("doc_id"))
        .collect().map(_.toString).toSeq === broadcastRows)
      // and at 0 the terms side must NOT broadcast: a constrained
      // deployment lowering the conf gets the estimate-free merge join
      assert(df.queryExecution.executedPlan.toString
        .contains("SortMergeJoin"))
    } finally spark.conf.unset(Conversation.BroadcastTermsMaxRowsConf)
  }

  test("stateful resolver (fMGWS twin) agrees with the batch window on the derived corpus") {
    import spark.implicits._
    val turns = Conversation.deriveTurns(
      spark.read.parquet(s"$sf0001/documents.parquet"))
    val batch = Conversation.resolveTurns(turns)
      .select(col("conv_id"), col("turn_no"), col("is_followup"), col("resolved_query"))
      .orderBy(col("conv_id"), col("turn_no")).collect().toSeq
    val stateful = Streaming.resolveConversation(turns.as[Streaming.TurnC]).toDF()
      .orderBy(col("conv_id"), col("turn_no")).collect().toSeq
    assert(stateful === batch)
    // the derived corpus genuinely exercises carry-over: some follow-up
    // got an anchor PREPENDED (its elliptical text is now mid-string)
    assert(batch.exists(r => r.getBoolean(2) &&
      r.getString(3).contains(" what about ")))
  }
}
