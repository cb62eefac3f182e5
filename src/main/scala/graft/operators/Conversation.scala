package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multi-turn conversation state — the follow-up-aware context carry-over
  * of the reference's interactive chat loop (reference `rag.py:169-196`:
  * `start_conversation()` reads ONE query, classifies, retrieves, answers;
  * a real deployment loops, and a follow-up turn like "what about the
  * cheaper one?" cannot be retrieved standalone — it inherits the
  * entities of the conversation's last substantive turn).
  *
  * Engine formulation (batch): a conversation log is rows
  * (conv_id, turn_no, utterance). Resolution is ONE window pass — no
  * join, no per-turn driver loop:
  *   - a turn is a FOLLOW-UP iff its token count ≤ maxFollowTokens
  *     (elliptical turns are short; anchors carry their own entities);
  *   - the carry-over source is the most recent PRECEDING anchor turn in
  *     the same conversation: `last(anchor, ignoreNulls) OVER
  *     (PARTITION BY conv_id ORDER BY turn_no ROWS UNBOUNDED
  *     PRECEDING TO 1 PRECEDING)`;
  *   - resolved query = anchor terms ++ own terms (follow-up with an
  *     available anchor), else the utterance itself.
  *
  * Per-turn retrieval is then ONE distributed inverted-index equi-join
  * (turn terms ⋈ corpus postings on token), never a per-turn loop and
  * never a cartesian: scores are exact integer tf·idf fixed-point
  * (Retrieval.bm25's idf), top-k per turn via a window.
  *
  * Scale: conversations shard by conv_id (the window partitions cleanly;
  * a conversation is small by nature). The retrieval join has two
  * guards: the document-frequency cap `maxDf` (stop-words with huge
  * posting lists drop BEFORE the join) and the impact-ordered posting
  * truncation `maxPostings` (each surviving token keeps its top-N
  * entries by tf — the guard that keeps the join LINEAR when both the
  * turn set and the corpus grow together; see retrieveForTurns). The
  * streaming twin keeps one (turn_no, utterance) pair per live
  * conversation via flatMapGroupsWithState — state is O(1) per
  * conversation, evictable by timeout in production.
  */
object Conversation {

  /** Deterministic conversation log derived from `documents`: every 5th
    * doc is a turn, rotated across `nConvs` conversations. Stateless
    * arithmetic only (no window): conv_id = (doc_id/5) % nConvs,
    * turn_no = (doc_id/5) DIV nConvs + 1 — dense per conversation and
    * ordered by doc_id, so the SAME derivation runs unchanged in a
    * streaming source. Every third turn (doc_id ≡ 10 (mod 15)) is an
    * elliptical follow-up ("what about <tok3> <tok4>"); anchors are the
    * doc's first 8 tokens.
    */
  def deriveTurns(docs: DataFrame, nConvs: Int = 8): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val slot = expr("doc_id DIV 5")
    docs.filter(col("doc_id") % 5 === 0)
      .select(
        pmod(slot, lit(nConvs)).cast("long").as("conv_id"),
        (expr(s"(doc_id DIV 5) DIV $nConvs") + 1).cast("long").as("turn_no"),
        when(pmod(col("doc_id"), lit(15)) === 10,
          concat_ws(" ", lit("what about"), array_join(slice(toks, 3, 2), " ")))
          .otherwise(array_join(slice(toks, 1, 8), " ")).as("utterance"))
  }

  /** Follow-up resolution: adds `is_followup` and `resolved_query`.
    * One window pass per conversation; first-turn follow-ups (no
    * preceding anchor) resolve to themselves.
    */
  def resolveTurns(turns: DataFrame, maxFollowTokens: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_no"))
      .rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("is_followup",
        size(TextFunctions.tokens(col("utterance"))) <= maxFollowTokens)
      .withColumn("prev_anchor",
        last(when(!col("is_followup"), col("utterance")), ignoreNulls = true).over(w))
      .withColumn("resolved_query",
        when(col("is_followup") && col("prev_anchor").isNotNull,
          concat_ws(" ", col("prev_anchor"), col("utterance")))
          .otherwise(col("utterance")))
      .drop("prev_anchor")
  }

  /** Batched per-turn lexical retrieval over `docs`: explode each turn's
    * DISTINCT resolved terms, join corpus postings (doc_id, tok, tf) on
    * token, score = Σ tf·idf_fp (idf_fp = Retrieval.bm25's exact integer
    * Robertson idf over the doc corpus), top-`k` docs per turn.
    *
    * TWO scale guards, and both are needed because BOTH join sides grow
    * with the corpus (turns derive from docs): `maxDf` drops stop-word
    * tokens entirely, and `maxPostings` truncates every surviving
    * token's posting list to its `maxPostings` highest-impact entries
    * (tf DESC, doc_id — deterministic, SQL-replayable) BEFORE the join.
    * Without the truncation the join emits Σ terms(tok)·df(tok) rows,
    * which is QUADRATIC in corpus scale (ScaleBench measured 37× time
    * at 10× data); with it the join is ≤ |terms|·maxPostings — linear.
    * This is classic impact-ordered posting truncation (the WAND-family
    * index layout): a doc outside a token's top-N by tf can only enter
    * the turn's top-k through its OTHER terms, which it still can. idf
    * stays exact over the full df (computed before truncation).
    * Output: (conv_id, turn_no, is_followup, rank, doc_id, score_fp).
    */
  def retrieveForTurns(resolved: DataFrame, docs: DataFrame, k: Int,
                       maxDf: Long = Long.MaxValue,
                       maxPostings: Long = Long.MaxValue,
                       stage: Stage = Stage.Local): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("tk"))
    val nDocs = toks.agg(count(lit(1)).as("n_docs"))
    // the postings index feeds BOTH consumers below (df table + posting
    // lists); without a cut each branch re-runs the corpus tokenize +
    // explode + (tok, doc) aggregation — the expensive half of the whole
    // query, twice. Build the index once, read it twice. (The durable
    // form of this cut is [[retrieveForTurnsFromStage]], which reads a
    // Retrieval.stagePostings artifact built once per corpus.)
    val postings = stage.cut(
      toks.select(col("doc_id"), explode(col("tk")).as("tok"))
        .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf")),
      "conv_postings")
    retrieveCore(resolved, postings, nDocs, k, maxDf, maxPostings)
  }

  /** [[retrieveForTurns]] served from a persisted postings index
    * (Retrieval.stagePostings) — row-identical to the from-corpus path
    * (same oracle), with EVERY corpus-derived artifact amortized into
    * the one-time stage: tokenize + postings build, the per-term df
    * aggregation (read from the staged dfreq table instead of a
    * corpus-wide groupBy over postings), the impact-ordered truncation
    * (`rank <= maxPostings` filters the staged per-token rank instead of
    * running a corpus-wide row_number window per query), and n_docs
    * (one staged globals row instead of a doclens count). What remains
    * per query is exactly the query-dependent work: the terms ⋈ postings
    * equi-join, the per-(turn, doc) score sum and the per-turn top-k.
    */
  def retrieveForTurnsFromStage(resolved: DataFrame,
                                spark: org.apache.spark.sql.SparkSession,
                                stagePath: String, k: Int,
                                maxDf: Long = Long.MaxValue,
                                maxPostings: Long = Long.MaxValue): DataFrame = {
    val (plist, dfreq) = servingSide(spark, stagePath, maxDf, maxPostings)
    scoreTerms(termsOf(resolved), plist, dfreq, k)
  }

  /** The query-INDEPENDENT serving side of staged retrieval: the
    * rank-capped posting list and the idf table, as lazy plans over the
    * stage. A serving loop (streaming micro-batches — [[graft.streaming
    * .Streaming.drainRetrieveFromStage]]) materializes these ONCE
    * (localCheckpoint) and reuses them every batch instead of re-reading
    * and re-deriving the stage per batch — the in-memory index every
    * serving system pins.
    */
  def servingSide(spark: org.apache.spark.sql.SparkSession,
                  stagePath: String, maxDf: Long = Long.MaxValue,
                  maxPostings: Long = Long.MaxValue): (DataFrame, DataFrame) = {
    val st = Retrieval.readStage(spark, stagePath)
    // n_docs inlined as a literal (driver-side metadata read — see
    // PostingsStage.nDocs; a 1-row cross join would plan as a
    // BroadcastNestedLoopJoin)
    val dfreq = st.dfreq
      .filter(col("df") <= maxDf)
      .withColumn("idf_fp",
        expr(s"(1000000L * (2L*${st.nDocs}L - 2L*df + 1L)) DIV (2L*df + 1L)"))
      .select(col("tok"), col("idf_fp"))
    val plist =
      if (maxPostings == Long.MaxValue) st.postings
      else st.postings.filter(col("rank") <= maxPostings)
    (plist.select(col("tok"), col("doc_id"), col("tf")), dfreq)
  }

  /** Per-batch retrieval against a pre-materialized serving side (see
    * [[servingSide]]) — row-identical to [[retrieveForTurnsFromStage]].
    *
    * `broadcastTerms = Some(true)` skips the counted broadcast decision:
    * the decision exists because the BATCH terms side can grow with the
    * corpus, but a streaming micro-batch is request-sized by the drain's
    * declaration, so counting it every batch charged two driver
    * round-trips (localCheckpoint + count) per micro-batch to re-learn a
    * constant answer. Results are join-strategy-invariant either way.
    */
  def retrieveWithServingSide(resolved: DataFrame, plist: DataFrame,
                              dfreq: DataFrame, k: Int,
                              broadcastTerms: Option[Boolean] = None)
      : DataFrame =
    scoreTerms(termsOf(resolved), plist, dfreq, k, broadcastTerms)

  /** The retrieval core over an already-materialized postings relation:
    * df-cap + impact-ordered truncation guards, the terms ⋈ postings
    * equi-join, exact integer tf·idf, per-turn top-k.
    */
  private def retrieveCore(resolved: DataFrame, postings: DataFrame,
                           nDocs: DataFrame, k: Int, maxDf: Long,
                           maxPostings: Long): DataFrame = {
    val terms = termsOf(resolved)
    val dfreq = postings.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_fp",
        expr("(1000000L * (2L*n_docs - 2L*df + 1L)) DIV (2L*df + 1L)"))
      .select(col("tok"), col("idf_fp"))
    val plist =
      if (maxPostings == Long.MaxValue) postings
      else {
        val pw = Window.partitionBy(col("tok"))
          .orderBy(col("tf").desc, col("doc_id"))
        postings.withColumn("_pr", row_number().over(pw))
          .filter(col("_pr") <= maxPostings).drop("_pr")
      }
    scoreTerms(terms, plist.select(col("tok"), col("doc_id"), col("tf")),
      dfreq, k)
  }

  private def termsOf(resolved: DataFrame): DataFrame =
    resolved.select(col("conv_id"), col("turn_no"), col("is_followup"),
      explode(array_distinct(TextFunctions.tokens(col("resolved_query")))).as("tok"))

  /** The query-dependent scoring tail shared by the from-corpus and
    * from-stage paths: terms ⋈ postings on token, exact integer tf·idf
    * sum per (turn, doc), per-turn top-k.
    *
    * Deliberately NOT served from a pre-joined (postings ⋈ idf) index:
    * an A/B of that fusion (pin the joined relation once, reuse per
    * query/batch) measured SLOWER on the batch queries (q_conversation_rag
    * 1.9 → 2.9 s at sf0.1) and a tie on the 3-batch streaming drain —
    * the fusion pays the idf join over the FULL posting list up front,
    * while this shape streams postings once through two broadcast-hash
    * probes and drops non-query tokens at the probe, so per-query cost
    * follows the query's token footprint, not the corpus. The fusion
    * only amortizes when one pinned index serves very many batches,
    * and even then saves just the idf probe, not the scan.
    *
    * ONE exchange serves both keyed stages: the joined contributions are
    * repartitioned by (conv_id, turn_no) once, which satisfies BOTH the
    * score aggregation's clustered distribution (its key set contains
    * the partition key) AND the top-k window's — without it the plan
    * shuffles the full contribution relation twice (agg key, then
    * window key; measured 1.2× end-to-end at sf0.1). Keys are
    * well-spread (every turn its own group) so the repartition has no
    * skew hazard.
    */
  /** Deterministic broadcast decision for the terms ⋈ postings join:
    * the terms side GROWS with the corpus (turns derive from docs —
    * deriveTurns keeps every 5th doc), so at mid scales its estimated
    * size sits exactly on AQE's broadcast threshold and the chosen
    * strategy FLAPS run-to-run (measured: the ScaleBench ×10 decade ran
    * 6.8–57 s on identical code — broadcast-hash on the fast runs,
    * sort-merge on the slow). The builder knows the size law, so the
    * decision is made HERE on a counted row bound, not left to
    * estimate sampling: ≤ the bound broadcasts explicitly, above it the
    * hint forces the shuffle join. The bound is set from BROADCAST
    * CAPACITY, not the optimizer's default 10 MB threshold: a terms row
    * is a compact (conv_id, turn_no, is_followup, tok) tuple (~50 B —
    * 4M rows ≈ 200 MB, well inside executor memory), and the join key
    * is VOCABULARY-bounded (~1k distinct tokens in corpus text), so the
    * shuffle path concentrates thousands of terms rows per key on top
    * of the per-token posting groups — skew the broadcast-hash plan
    * never sees (measured: forcing shuffle-merge at the ScaleBench ×100
    * decade, 800k terms rows, ran 230 s vs ~15 s broadcast).
    */
  private val BroadcastTermsMaxRowsDefault = 4000000L

  /** The row bound above, overridable per session: 4M rows ≈ 200 MB
    * assumes a driver/executor heap sized like the bench's (128 GiB
    * local[32]); a constrained deployment can lower it
    * (`spark.conf.set(...)`) without a code change, keeping the
    * counted-row decision deterministic either way.
    */
  val BroadcastTermsMaxRowsConf = "graft.conversation.broadcastTermsMaxRows"

  private def broadcastTermsMaxRows(spark: SparkSession): Long =
    spark.conf.getOption(BroadcastTermsMaxRowsConf).map(_.toLong)
      .getOrElse(BroadcastTermsMaxRowsDefault)

  private def scoreTerms(terms: DataFrame, plist: DataFrame,
                         dfreq: DataFrame, k: Int,
                         broadcastDecision: Option[Boolean] = None)
      : DataFrame = {
    // a caller-declared decision (request-sized micro-batches) skips the
    // checkpoint + count entirely — terms is then consumed exactly once
    val (termsSide, nTerms) = broadcastDecision match {
      case Some(true) => (broadcast(terms), 0L)
      case Some(false) => (terms.hint("shuffle_merge"), Long.MaxValue)
      case None =>
        val t = terms.localCheckpoint() // feeds the row count AND the join
        val n = t.count()
        (if (n <= broadcastTermsMaxRows(t.sparkSession)) broadcast(t)
         else t.hint("shuffle_merge"), n)
    }
    // the scoring shuffle's width scales with the batch: the join emits
    // up to |terms| × maxPostings candidate rows through this ONE
    // exchange (it serves the aggregation AND the top-k window), and a
    // fixed default width makes each task sort a 10×-decade more rows
    // until it spills — super-linear wall-clock on linear work
    // (measured: the ×100 ScaleBench decade at 32 fixed partitions ran
    // 213 s; the width below keeps per-task sorts memory-resident).
    // ~2k terms rows per partition ⇒ a few M joined rows per task.
    // (nTerms = 0 under a declared-broadcast caller keeps the session
    // default width — micro-batches never need the widening.)
    val width = math.max(
      terms.sparkSession.sessionState.conf.numShufflePartitions,
      math.min(2048L, nTerms / 2000L).toInt)
    val scored = plist.join(broadcast(dfreq), "tok")
      .join(termsSide, "tok")
      .repartition(width, col("conv_id"), col("turn_no"))
      .groupBy(col("conv_id"), col("turn_no"), col("is_followup"), col("doc_id"))
      .agg(sum(col("tf") * col("idf_fp")).as("score_fp"))
    val w = Window.partitionBy(col("conv_id"), col("turn_no"))
      .orderBy(col("score_fp").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("conv_id"), col("turn_no"), col("is_followup"),
        col("rank"), col("doc_id"), col("score_fp"))
  }

  /** Per-turn ordered context assembly (A2 per conversation turn,
    * reference `rag.py:189`): join the per-turn top-k back to the doc
    * texts and concatenate in rank order. Output one row per turn:
    * (conv_id, turn_no, is_followup, n_docs, context).
    */
  def assemblePerTurn(topk: DataFrame, docs: DataFrame): DataFrame =
    topk.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .groupBy(col("conv_id"), col("turn_no"), col("is_followup"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("rank").as("r"), col("text").as("t")))),
            x => x.getField("t")),
          "\n\n").as("context"))
}
