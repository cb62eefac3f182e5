package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.HashEmbed
import graft.functions.TextFunctions

/** The reference's E3 flagship pipeline (reference `rag.py:169-196`),
  * re-expressed as composable DataFrame stages:
  * classify intent (M1) → conditional retrieval (T2 KNN) → ordered context
  * assembly (A2). The LLM generation step (M2) is out of engine scope — the
  * engine delivers the assembled context and a JSON response shape.
  */
object Rag {

  /** Embed a corpus: adds `embedding` (ARRAY<DOUBLE>) from `textCol`.
    * Narrow projection — distributes perfectly (contrast the reference's
    * driver-side row-at-a-time loop, `rag.py:46-50`).
    */
  def embedCorpus(df: DataFrame, textCol: Column, dim: Int = 64): DataFrame =
    df.withColumn("embedding", TextFunctions.hashEmbed(textCol, dim))

  /** Retrieval (T2, `rag.py:65-90`): embed the query driver-side (it's one
    * string — exactly what the reference does at `rag.py:72-73`), then exact
    * KNN over the corpus.
    */
  def retrieve(corpus: DataFrame, idCol: Column, queryText: String, k: Int,
               dim: Int = 64): DataFrame = {
    val qVec = HashEmbed.embed(queryText, dim).toSeq
    Knn.knn(corpus, col("embedding"), idCol, qVec, k, Knn.L2)
  }

  /** Maximal-marginal-relevance re-ranking: greedily pick `k` results
    * maximizing λ·relevance − (1−λ)·redundancy, where relevance is the
    * negated retrieval distance and redundancy is the max dot-product
    * similarity to the already-selected set. The standard diversity stage
    * between retrieval and context assembly — near-duplicate hits (which
    * a near-dup-heavy corpus produces constantly) stop crowding out
    * coverage of the query's other aspects.
    *
    * `candidates` is the SMALL retrieval head (top-N of an ANN/KNN stage),
    * so the whole greedy loop runs as ONE imperative aggregate
    * ([[graft.expressions.MmrGreedy]], the VectorSumFp UDAF pattern): the
    * only distributed work is folding the ≤ N head rows into the
    * aggregation buffer — one job, versus the former k-step
    * select/broadcast/localCheckpoint driver loop whose job-launch latency
    * dominated (never the corpus — the scale-bearing stage is the
    * retrieval upstream). Determinism: score ties break on lowest id (so
    * the selection is a pure function of the row set, not buffer order);
    * every arithmetic step is the same left-associated double chain in
    * the SQL oracle. Requires an integral id.
    * Output: (rnk 1..k, id, dist) in selection order.
    */
  def mmrSelect(candidates: DataFrame, idCol: Column, vecCol: Column,
                distCol: Column, k: Int, lambda: Double = 0.5): DataFrame = {
    val cand = candidates.select(
      struct(idCol.cast("long").as("id"),
        vecCol.cast("array<double>").as("vec"),
        distCol.cast("double").as("dist")).as("c"))
    val agg = org.apache.spark.sql.GraftBridge.column(
      graft.expressions.MmrGreedy(
        org.apache.spark.sql.GraftBridge.expression(col("c")), k, lambda)
        .toAggregateExpression())
    cand.agg(agg.as("sel"))
      .select(explode(col("sel")).as("s"))
      .select(col("s.rnk").as("rnk"), col("s.id").as("id"),
        col("s.dist").as("dist"))
  }

  /** Ordered context assembly (A2, `rag.py:189`): join the top-k documents
    * with "\n\n", in ascending distance order (tie-broken by id so the
    * result is reproducible). Single-pass: sort_array over collected
    * (distance, id, doc) structs — k is small, so the collect_list is O(k).
    */
  def assembleContext(topk: DataFrame, distCol: Column, idCol: Column,
                      docCol: Column): DataFrame =
    topk.agg(
      array_join(
        transform(
          array_sort(collect_list(struct(distCol.as("d"), idCol.as("i"), docCol.as("doc")))),
          x => x.getField("doc")),
        "\n\n").as("context"))

  /** M2 prompt-template stage (reference `rag.py:149`): compose the RAG
    * generation prompt "Context:\n{context}\n\nQuestion: {query}" from
    * the assembled context — the last engine-side stage before the
    * out-of-scope LLM call.
    */
  def promptOf(contextCol: Column, queryText: String): Column =
    concat(lit("Context:\n"), contextCol, lit("\n\nQuestion: "), lit(queryText))

  /** Full conditional pipeline (E3): intent on the query string decides
    * whether to retrieve (product_search / mixed) or emit the canned
    * advisory context (reference `rag.py:187-191`); the output carries
    * the composed M2 generation prompt (`rag.py:149`).
    */
  def ragQuery(corpus: DataFrame, idCol: Column, docCol: Column,
               queryText: String, k: Int, dim: Int = 64): DataFrame = {
    val intent = intentOf(queryText)
    val base =
      if (intent == "product_search" || intent == "mixed") {
        val topk = retrieve(corpus, idCol, queryText, k, dim)
        assembleContext(topk, col("distance"), idCol, docCol)
      } else {
        corpus.sparkSession.sql("SELECT 'General niche advice requested.' AS context")
      }
    base.select(lit(queryText).as("query"), lit(intent).as("intent"), col("context"),
      promptOf(col("context"), queryText).as("prompt"))
  }

  /** Driver-side intent of a single query string — same rules as the
    * column-level TextFunctions.classifyIntent.
    */
  def intentOf(queryText: String,
               productWords: Seq[String] = TextFunctions.ProductWords,
               adviceWords: Seq[String] = TextFunctions.AdviceWords): String = {
    val t = queryText.toLowerCase(java.util.Locale.ROOT)
    val p = productWords.exists(t.contains)
    val a = adviceWords.exists(t.contains)
    if (p && a) "mixed" else if (a) "niche_advice" else "product_search"
  }

  /** M2 response shaping: the strict-JSON contract of the reference's
    * generator (`rag.py:136-141`) — {response, products, follow-up_question}.
    */
  def shapeResponse(df: DataFrame, responseCol: Column, productsCol: Column,
                    followUpCol: Column): DataFrame =
    df.select(to_json(struct(
      responseCol.as("response"),
      productsCol.as("products"),
      followUpCol.as("follow-up_question"))).as("json"))
}
