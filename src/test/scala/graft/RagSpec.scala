package graft

import org.apache.spark.sql.functions._

import graft.operators.Rag

class RagSpec extends SparkSpec {

  test("intent routing: 3 classes + fallback (rag.py:93-123)") {
    assert(Rag.intentOf("customer order please") == "product_search")
    assert(Rag.intentOf("why is it slow") == "niche_advice")
    assert(Rag.intentOf("customer query is slow") == "mixed")
    assert(Rag.intentOf("nothing matching at all") == "product_search") // fallback
  }

  test("retrieval path returns k results with ascending distance") {
    import graft.tables.Tables
    val corpus = Rag.embedCorpus(Tables.documents(spark, sf0001), col("text"))
    val topk = Rag.retrieve(corpus, col("doc_id"), "table data scan", 7).collect()
    assert(topk.length == 7)
    val dists = topk.map(_.getAs[Double]("distance"))
    assert(dists.sameElements(dists.sorted))
  }

  test("context assembly joins docs with blank line in distance order (rag.py:189)") {
    import spark.implicits._
    val topk = Seq((0.5, 2L, "second"), (0.1, 1L, "first"), (0.9, 3L, "third"))
      .toDF("distance", "id", "doc")
    val ctx = Rag.assembleContext(topk, $"distance", $"id", $"doc").head().getString(0)
    assert(ctx == "first\n\nsecond\n\nthird")
  }

  test("embedBatched: batch-call path equals the expression path, no shuffle") {
    import graft.tables.Tables
    import graft.operators.BatchedInference
    val docs = Tables.documents(spark, sf0001)
    val viaExpr = Rag.embedCorpus(docs, col("text"))
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // batchSize 7 forces many batches per partition plus a remainder tail
    val batched = BatchedInference.embedBatched(docs, "doc_id", "text",
      new BatchedInference.HashEmbedScorer(64), batchSize = 7)
    val viaBatch = batched.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaBatch == viaExpr,
      "batched scorer must be bit-identical to the HashEmbed expression")
    // the inference stage is narrow — a shuffle here would mean the
    // boundary broke the one-stage plan real models rely on
    assert(!planNodes(batched).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "batched inference must stay one narrow stage")
  }

  test("ragQuery takes advisory path for niche_advice intent (rag.py:187-191)") {
    import graft.tables.Tables
    val corpus = Rag.embedCorpus(Tables.documents(spark, sf0001), col("text"))
    val out = Rag.ragQuery(corpus, col("doc_id"), col("text"), "why so slow", 5).head()
    assert(out.getAs[String]("intent") == "niche_advice")
    assert(out.getAs[String]("context") == "General niche advice requested.")
  }

  test("shapeResponse emits the M2 JSON contract (rag.py:136-141)") {
    import spark.implicits._
    val df = Seq(("answer", Seq("p1", "p2"), "more?")).toDF("r", "p", "f")
    val json = Rag.shapeResponse(df, $"r", $"p", $"f").head().getString(0)
    assert(json == """{"response":"answer","products":["p1","p2"],"follow-up_question":"more?"}""")
  }
}
