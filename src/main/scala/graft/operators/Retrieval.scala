package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Lexical and hybrid retrieval over a document corpus — the classic
  * complement to the vector path (Rag.retrieve / Knn): BM25 term scoring
  * and reciprocal-rank fusion of lexical and vector rankings. The
  * reference's RAG pipeline (rag.py:65-90) retrieves by embedding only;
  * production retrieval almost always fuses a lexical signal with the
  * dense one, so both are first-class here.
  *
  * Scale design: BM25 is two corpus passes (one tokenize→aggregate for
  * per-doc length, one for query-term tf) plus broadcast-size side
  * tables (per-term df, global N/total) — no shuffle keyed on anything
  * hotter than doc_id, and the query-term filter prunes the tf relation
  * to |docs matching any term| before the join. RRF is a full-outer join
  * of two top-depth rank lists (tiny) — broadcast both ways.
  *
  * Determinism: every score is computed in integer fixed-point (scale
  * 1e6; rank fusion at 1e9) with integer DIV, so results are exact and
  * engine-independent — no float summation order, no ln() rounding.
  * With k1 = 6/5 and b = 3/4 (the textbook defaults), the BM25 term
  * factor tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) multiplied through by
  * 20·total is the integer ratio
  *   44·tf·total / (20·tf·total + 6·total + 18·dl·N)
  * and the Robertson idf (N−df+0.5)/(df+0.5) doubled is
  * (2N−2df+1)/(2df+1) — both single exact integer divisions after
  * fixed-point scaling. Long arithmetic holds to ~sf100 (44·tf·total·1e6
  * ≤ 2e18); beyond that switch the two products to DECIMAL(38,0) as in
  * Stats.powerSums.
  */
object Retrieval {

  /** Integer fixed-point BM25 scores (scale 1e6·1e6 = 1e12 per term,
    * summed exactly per doc) of every document matching ≥1 query term.
    * Output: (doc_id, n_terms, score_fp), score descending.
    */
  def bm25(docs: DataFrame, idCol: Column, textCol: Column,
           queryTerms: Seq[String]): DataFrame = {
    val toks = docs.select(idCol.as("doc_id"),
      TextFunctions.tokens(textCol).as("tk"))
    // per-doc length and global (N, total) — one aggregate, broadcast back
    val dl = toks.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
    val globals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total"))
    // tf over query terms only — the isin filter prunes before the shuffle
    val tf = toks.select(col("doc_id"), explode(col("tk")).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    // document frequency per term = row count of tf (one row per doc,term)
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(globals))
      .withColumn("idf_fp",
        expr("(1000000L * (2L*n_docs - 2L*df + 1L)) DIV (2L*df + 1L)"))
      .withColumn("tfpart_fp",
        expr("(1000000L * 44L * tf * total) DIV " +
          "(20L * tf * total + 6L * total + 18L * dl * n_docs)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("idf_fp") * col("tfpart_fp")).as("score_fp"))
  }

  /** Reciprocal-rank fusion of two (id, rank) lists: for each id present
    * in either list, rrf_fp = Σ 1e9 DIV (k + rank) over the lists that
    * rank it (the standard RRF with k = 60, in exact integer fixed-point).
    * Both inputs are top-`depth` lists — broadcast-size by construction.
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int = 60): DataFrame = {
    val l = lex.select(col("doc_id"), col("rank").as("lex_rank"))
    val v = vec.select(col("doc_id"), col("rank").as("vec_rank"))
    l.join(v, Seq("doc_id"), "full_outer")
      .withColumn("rrf_fp",
        coalesce(expr(s"1000000000L DIV (${k}L + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000L DIV (${k}L + vec_rank)"), lit(0L)))
  }
}
