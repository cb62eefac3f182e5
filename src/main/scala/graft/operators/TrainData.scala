package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-data pipeline operators over document/event corpora: vocabulary
  * builds, deterministic dataset splits, sessionization. The reference's
  * pipeline stops at embed-and-store (`rag.py:46-59`); these are the
  * standard preprocessing stages a large-scale corpus pipeline adds.
  *
  * Scale notes (100 TB):
  *  - vocab: explode → partial map-side count → shuffle by token. The
  *    token key space is Zipf-skewed but partial aggregation absorbs the
  *    head before the shuffle; no row ever carries more than (token, n).
  *  - hashSplit: narrow projection, no shuffle — split assignment is a
  *    pure function of the id, so it is stable under re-partitioning,
  *    re-runs, and incremental appends (the property that matters for
  *    train/test hygiene).
  *  - sessionize: one shuffle by user, then two window passes and a
  *    two-level aggregate inside the same partitioning.
  */
object TrainData {

  /** Term + document frequency table, most-frequent first.
    *
    * Two-level aggregation for exact df without a distinct-set hot key:
    * level one groups by (token, doc) — no skew, partial counts absorb
    * within-doc repeats map-side; level two sums tf and counts rows per
    * token, where partial aggregation absorbs the Zipf head because the
    * carried state is two longs, never a set of doc ids (the shape
    * `count_distinct(id)` cannot give: its partial state for "the" is
    * every doc id in the corpus).
    *
    * @param minTf drop tokens with global count below this (noise floor)
    */
  def vocab(df: DataFrame, idCol: Column, textCol: Column,
            minTf: Long = 1L, topN: Int = 100): DataFrame =
    df.select(idCol.as("id"), explode(TextFunctions.tokens(textCol)).as("tok"))
      .groupBy(col("tok"), col("id"))
      .agg(count(lit(1)).as("tf_doc"))
      .groupBy(col("tok"))
      .agg(sum(col("tf_doc")).as("tf"), count(lit(1)).as("df"))
      .filter(col("tf") >= minTf)
      .orderBy(col("tf").desc, col("tok").asc)
      .limit(topN)

  /** id * 2654435761 mod 2^32, computed EXACTLY for any non-negative
    * Long id without ever overflowing (ANSI mode throws on wrap): reduce
    * the id mod 2^32 first (id*k ≡ (id mod 2^32)*k (mod 2^32)), then
    * split-multiply in 16-bit halves — every intermediate stays below
    * 2^49. Bit-for-bit equal to unbounded-precision engines (the DuckDB
    * oracle's HUGEINT math) over the whole Long domain, where a naive
    * `id * k % 2^32` wraps at ids >= ~3.47e9.
    */
  private def knuth32(idCol: Column): Column = {
    val k = lit(2654435761L)
    val a = pmod(idCol.cast("long"), lit(4294967296L))
    val hi = shiftright(a, 16)
    val lo = a.bitwiseAND(lit(65535L))
    pmod(pmod(hi * k, lit(65536L)) * lit(65536L) + lo * k, lit(4294967296L))
  }

  /** Knuth multiplicative-hash bucket in [0, 100) of a non-negative id —
    * deterministic, engine-independent integer math (no RNG, no seed),
    * total over the entire Long id domain (see [[knuth32]]).
    */
  def hashBucket(idCol: Column): Column =
    pmod(knuth32(idCol), lit(100L))

  /** Direct shard assignment in [0, shards) from the 32-bit hash — for
    * EXPORT ROUTING (shard manifests), where balance matters: hashing
    * into [0,100) first and then mod-8 would give shards 0-3 a 13/100
    * slice of the hash space and shards 4-7 a 12/100 slice (100 % 8 ≠ 0),
    * a systematic ~8% writer-task imbalance. Requires a power-of-two
    * shard count so 2^32 divides evenly and every shard owns exactly
    * 2^32/shards of the hash space.
    */
  def shardOf(idCol: Column, shards: Int): Column = {
    require(shards > 0 && (shards & (shards - 1)) == 0,
      s"shards must be a power of two for an even hash-space split, got $shards")
    pmod(knuth32(idCol), lit(shards.toLong))
  }

  /** Stable train/val/test assignment: 80/10/10 by hash bucket of the id.
    * A sample's split never changes when the corpus grows — the invariant
    * that keeps held-out data held out across pipeline re-runs.
    */
  def hashSplit(idCol: Column): Column = {
    val b = hashBucket(idCol)
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  /** CCNet-style perplexity bucketing: score every document against a
    * reference LM trained on the trusted slice (`refPred`, CCNet's
    * Wikipedia stand-in), then split the corpus into tail/middle/head
    * thirds by score — the standard "keep the head, audit the tail"
    * curation gate. The score is the log-free fixed-point surrogate the
    * LM family already uses: per doc, mean add-one-smoothed reference
    * term frequency (`⌊Σ(ref_tf+1)·1000 / n_tok⌋` — OOV tokens
    * contribute exactly 1), so LOW score = far from the reference =
    * high perplexity = tail.
    *
    * The tertile thresholds are HISTOGRAM quantiles, not a global sort:
    * scores bin into `bins` equal-width cells of [0, max] (max is a
    * 1-row broadcast), the cumulative count over the ≤`bins`-row cell
    * relation (partition-less window over a fixed-cardinality relation —
    * the house pattern) yields the smallest bins b33/b66 whose cumulative
    * mass reaches ⌈N/3⌉/⌈2N/3⌉, and bucket assignment is a broadcast
    * comparison. Ties share a bin, so the thirds are approximate the way
    * production histogram-quantiles are — and exactly replayable.
    *
    * Scale shape: token explode → one shuffle for the reference TF table
    * (Zipf head absorbed by partial aggregation) → equi-join back → one
    * per-doc aggregation; everything after the per-doc score relation is
    * bounded (histogram cells) or 1-row broadcasts. No global sort, no
    * per-corpus window.
    *
    * Zero-token documents cannot be scored (no tokens ⇒ no LM
    * evidence); they land in an explicit audit bucket 'empty' (scores
    * reported as 0) rather than silently vanishing — a curation gate
    * must account for every input doc, so Σ n_docs over the output
    * always equals the corpus size. The tertile cuts are computed over
    * the SCORED docs only: unscorable docs carry no evidence about
    * where the head/tail boundary lies.
    *
    * Output (one row per non-empty bucket): (bucket, n_docs, sum_ids,
    * sum_score_fp, min_score, max_score).
    */
  def perplexityBuckets(df: DataFrame, idCol: Column, textCol: Column,
                        refPred: Column, bins: Int = 256): DataFrame = {
    val base = df.select(idCol.as("id"), textCol.as("text"),
      refPred.as("is_ref"))
    val toks = base.select(col("id"), col("is_ref"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val refTf = toks.filter(col("is_ref"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val scored = toks.join(refTf, Seq("tok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(coalesce(col("tf"), lit(0L)) + lit(1L)).as("sum_tf1"))
      .withColumn("score_fp", expr("sum_tf1 * 1000 DIV n_tok"))
    val mx = scored.agg(max(col("score_fp")).as("mx"),
      count(lit(1)).as("n_total"))
    val binned = scored.crossJoin(broadcast(mx))
      .withColumn("bin", expr(s"(score_fp * $bins) DIV (mx + 1)"))
    // limit(bins) is a no-op (bin ∈ [0, bins) by construction: score ≤ mx
    // ⇒ score·bins DIV (mx+1) < bins) that makes the boundedness PROVABLE
    // in the physical plan: the unpartitioned cumulative window below
    // demonstrably sorts a ≤`bins`-row cell relation, never the corpus.
    val cum = binned.groupBy(col("bin"), col("n_total"))
      .agg(count(lit(1)).as("c"))
      .limit(bins)
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cuts = cum.agg(
      min(when(col("cum") * 3 >= col("n_total"), col("bin"))).as("b33"),
      min(when(col("cum") * 3 >= col("n_total") * 2, col("bin"))).as("b66"))
    val buckets = binned.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("bin") <= col("b33"), "tail")
          .when(col("bin") <= col("b66"), "middle")
          .otherwise("head"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("id")).as("sum_ids"),
        sum(col("score_fp")).as("sum_score_fp"),
        min(col("score_fp")).as("min_score"),
        max(col("score_fp")).as("max_score"))
    // zero-token docs never reach `scored` (explode emits nothing) — a
    // narrow filter finds them without a join, and the HAVING-style
    // filter keeps the row out entirely when the corpus has none
    val emptyRow = base
      .filter(size(TextFunctions.tokens(col("text"))) === 0)
      .agg(count(lit(1)).as("n_docs"), sum(col("id")).as("sum_ids"))
      .filter(col("n_docs") > 0)
      .select(lit("empty").as("bucket"), col("n_docs"), col("sum_ids"),
        lit(0L).as("sum_score_fp"), lit(0L).as("min_score"),
        lit(0L).as("max_score"))
    buckets.unionByName(emptyRow).orderBy(col("bucket"))
  }

  /** Temperature-based source mixing (α = 1/2): distribute a sampling
    * `budget` across sources proportionally to cnt^α instead of cnt —
    * the standard rebalancing that keeps head sources (e.g. English at
    * web scale) from drowning tail sources in a training mix. Quotas are
    * exact integers: per-source weight w = ⌊√cnt·1e6⌋ (IEEE sqrt is
    * correctly rounded, so the weight is engine-identical), quota =
    * ⌊budget·w / Σw⌋. Row selection inside each source is the md5-hash
    * ranking of the id — deterministic, seedless, and stable under
    * re-partitioning.
    *
    * Scale shape: one count aggregation (tiny), quotas broadcast back,
    * one per-source window for the hash rank (the only shuffle touching
    * the corpus; partitioned by source, and a skewed head source is
    * exactly what the quota caps). Output: the kept (source, id) rows.
    */
  def sourceMix(df: DataFrame, sourceCol: Column, idCol: Column,
                budget: Long): DataFrame = {
    val cnts = df.groupBy(sourceCol.as("source")).agg(count(lit(1)).as("cnt"))
      .withColumn("w_fp",
        floor(sqrt(col("cnt").cast("double")) * lit(1000000.0)).cast("long"))
    val tot = cnts.agg(sum(col("w_fp")).as("w_total"))
    val quota = cnts.crossJoin(broadcast(tot))
      .withColumn("n_target", expr(s"(${budget}L * w_fp) DIV w_total"))
    val ranked = df.select(sourceCol.as("source"), idCol.as("id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(md5(col("id").cast("string")), col("id"))).cast("long"))
    ranked.join(broadcast(quota), "source")
      .filter(col("rk") <= col("n_target"))
      .select(col("source"), col("id"), col("rk"), col("cnt"), col("n_target"))
  }

  /** UniMax-style budget allocation (waterfill with an epoch cap): given
    * a total training budget of `budget` docs and per-source corpus
    * sizes, allocate as UNIFORMLY across sources as the cap allows —
    * each source holds at most `epochsCap` passes over its data
    * (capacity = n·cap), small sources are taken whole (capped), and
    * their unused share redistributes to the rest. This is the mixing
    * rule that fixes [[sourceMix]]'s silent under-fill: a temperature
    * quota larger than a tail source's size just truncates, while the
    * waterfill provably re-spends the remainder (total alloc = budget
    * whenever Σ capacity ≥ budget, flagged `underfilled` otherwise).
    *
    * Exact integer waterfill on the per-source relation: sources sorted
    * by capacity ascending (rank j of L), a source is capped iff
    * c_j·(L−j+1) ≤ budget − prefix_j (monotone in j), uncapped sources
    * get ⌊(budget − Σ capped capacity)/m⌋ with the remainder granted to
    * the first `rem` uncapped sources in capacity order — fully
    * deterministic, replayable in any engine.
    *
    * Scale shape: ONE corpus-wide count aggregation; everything after is
    * windows and aggregates over the ≤|sources| relation (fixed
    * cardinality — the house pattern) plus 1-row broadcasts. Output per
    * source: (source, n_docs, capacity, capped, alloc, epochs_fp,
    * underfilled).
    */
  def unimaxAlloc(df: DataFrame, sourceCol: Column, budget: Long,
                  epochsCap: Int = 2, maxSources: Int = 1024): DataFrame = {
    require(budget >= 0, s"unimaxAlloc: budget must be non-negative, got $budget")
    val cnts = df.groupBy(sourceCol.as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("capacity", col("n_docs") * lit(epochsCap.toLong))
    // A mixing table is a curated handful of sources, but the bound is
    // semantic, not structural — so it is ENFORCED, not assumed: `tot`
    // counts the un-truncated relation and raise_error()s past
    // `maxSources` (every output row crossJoins it, so the error cannot
    // be planned away), and only then does limit(maxSources) make the
    // boundedness of the unpartitioned rank/prefix windows provable in
    // the physical plan (a ≤`maxSources`-row sort, never the corpus).
    val tot = cnts.agg(count(lit(1)).as("n_src0"),
        sum(col("capacity")).as("cap_total"))
      .withColumn("n_src",
        when(col("n_src0") > maxSources, raise_error(concat(
          lit(s"unimaxAlloc: more than $maxSources sources ("),
          col("n_src0"), lit(") — raise maxSources"))))
          .otherwise(col("n_src0")))
      .drop("n_src0")
    val w = Window.orderBy(col("capacity"), col("source"))
    val ranked = cnts.limit(maxSources)
      .withColumn("j", row_number().over(w).cast("long"))
      .withColumn("prefix", coalesce(sum(col("capacity")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val flagged = ranked.crossJoin(broadcast(tot))
      .withColumn("capped",
        col("capacity") * (col("n_src") - col("j") + 1) <=
          lit(budget) - col("prefix"))
    val cappedAgg = flagged.agg(
      sum(when(col("capped"), col("capacity")).otherwise(0L)).as("capped_cap"),
      sum(when(col("capped"), 1L).otherwise(0L)).as("n_capped"))
    flagged.crossJoin(broadcast(cappedAgg))
      .withColumn("m", col("n_src") - col("n_capped"))
      .withColumn("pool", lit(budget) - col("capped_cap"))
      // m = 0 ⇒ every source is capped and the `otherwise` branch is
      // dead, but greatest(m, 1) keeps the division total so the
      // expression is safe under spark.sql.ansi.enabled too
      .withColumn("alloc",
        when(col("capped"), col("capacity"))
          .otherwise(expr("pool DIV greatest(m, 1L)") +
            when(col("j") - col("n_capped") <= expr("pool % greatest(m, 1L)"), 1L)
              .otherwise(0L)))
      .withColumn("epochs_fp", expr("alloc * 1000 DIV n_docs"))
      .withColumn("underfilled", col("cap_total") < lit(budget))
      .select(col("source"), col("n_docs"), col("capacity"), col("capped"),
        col("alloc"), col("epochs_fp"), col("underfilled"))
      .orderBy(col("source"))
  }

  /** Deterministic stratified sampling: keep `pct(class)` percent of rows
    * per class by hash bucket of the id — no RNG, no shuffle, and a row's
    * membership is stable under corpus growth and re-partitioning (the
    * same invariant as hashSplit). Classes absent from `pct` keep
    * `defaultPct`. At 100 TB this is a narrow filter the scan absorbs.
    */
  def stratifiedSample(df: DataFrame, classCol: Column, idCol: Column,
                       pct: Map[String, Int], defaultPct: Int): DataFrame = {
    val b = hashBucket(idCol)
    val rate = pct.foldLeft(lit(defaultPct)) { case (acc, (cls, p)) =>
      when(classCol === cls, lit(p)).otherwise(acc)
    }
    df.filter(b < rate)
  }

  /** Concat-and-chunk sequence packing (the GPT-style pretraining data
    * layout): documents are routed to `shards` deterministic shards
    * (multiplicative hash of the id), concatenated in id order within
    * each shard, and the token stream is cut into fixed `seqLen` chunks.
    * A document's bin is the chunk index of its first token — computed
    * from the exclusive running token sum, so the whole packing is one
    * shuffle on the shard key plus one window pass, all integer-exact.
    *
    * Scale: shard count is the parallelism lever — each shard's window
    * sort is a per-partition external sort, so shards are sized to
    * executor memory, not corpus size. Assignment is hash-stable: an
    * appended corpus only extends bins at each shard's tail.
    *
    * Output: one row per (shard, bin): n_docs, sum_tokens, min/max doc id.
    */
  def packSequences(df: DataFrame, idCol: Column, textCol: Column,
                    seqLen: Long, shards: Int): DataFrame = {
    require(seqLen > 0 && shards > 0, "seqLen and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select((hashBucket(idCol) % shards).as("shard"), idCol.as("id"),
        TextFunctions.tokenCount(textCol).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) div $seqLen"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
  }

  /** Per-user session stats with a gap timeout: a new session starts when
    * the gap to the previous event exceeds `gapUs`. Emits one row per user:
    * (user, n_sessions, n_events, max_session_events).
    */
  def sessionize(df: DataFrame, userCol: Column, tsUsCol: Column,
                 tieCol: Column, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsUsCol.asc, tieCol.asc)
    val prev = lag(tsUsCol, 1).over(w)
    // two projections: the running sum windows over the materialized flag
    // (nesting a window inside a window expression is not allowed)
    val sessioned = df
      .withColumn("new_session",
        when(prev.isNull || tsUsCol - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned
      .groupBy(userCol.as("user"), col("session_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user"))
      .agg(max(col("session_id")).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_session_events"))
  }

  /** Leakage-aware split: assign train/val/test by the near-dup GROUP,
    * not the document — a near-duplicate of a held-out document must not
    * land in train (the eval-contamination bug a per-document split
    * cannot prevent). `components` is Dedup.connectedComponents output
    * (id, comp) over candidate pairs; documents outside any component
    * keep their own id as group label. One left join on id plus the same
    * multiplicative-hash split as [[hashSplit]], so every member of a
    * component inherits its group's split by construction and the
    * assignment stays stable as the corpus grows. Adds (group_id, split).
    */
  def groupedSplit(docs: DataFrame, idCol: Column,
                   components: DataFrame): DataFrame = {
    val comp = components.select(col("id").as("_gid"), col("comp").as("_comp"))
    docs.join(comp, idCol === col("_gid"), "left")
      .withColumn("group_id", coalesce(col("_comp"), idCol.cast("long")))
      .withColumn("split", hashSplit(col("group_id")))
      .drop("_gid", "_comp")
  }

  /** K-fold cross-validation fold of an id, 0..k-1 — the same seedless
    * multiplicative hash as [[hashBucket]], so fold membership is stable
    * under corpus growth and engine-independent; total over the entire
    * Long id domain (see [[knuth32]]).
    */
  def kfoldAssign(idCol: Column, k: Int): Column =
    pmod(knuth32(idCol), lit(k.toLong))

  /** Deterministic per-row weighted subsampling: keep a row iff its hash
    * bucket (0..99) is below its OWN keep-percentage column — quality- or
    * source-weighted downsampling as one narrow filter the scan absorbs
    * (the generalization of [[stratifiedSample]] from per-class constants
    * to a per-row weight). Seedless and re-partition-stable like every
    * sampler here.
    */
  def weightedSample(df: DataFrame, idCol: Column, pctCol: Column): DataFrame =
    df.filter(hashBucket(idCol) < pctCol)

  /** Unigram-LM quality proxy: score each document by the average corpus
    * frequency of its tokens — the classic cheap pretraining filter
    * (gibberish / OCR noise is rare-token-heavy and scores low; natural
    * text tracks the corpus distribution). Kept log-free so the score is
    * exact integer arithmetic an independent engine replays bit-for-bit:
    * lm_fp = (Σ tf(token) over the doc's tokens) * 1000 DIV n_tokens —
    * the integer-scaled mean corpus term frequency. Two keyed shuffles
    * (corpus tf count, per-doc sum); the tf relation joins on the token
    * key, never broadcast-assumed (a 100 TB vocab is not small).
    * Empty documents have no tokens and drop out, like every
    * token-explode consumer here. Output: (id, n_tok, sum_tf, lm_fp).
    */
  def unigramLmScore(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    import graft.functions.TextFunctions
    val toks = df.select(idCol.as("id"),
      explode(TextFunctions.tokens(textCol)).as("tok"))
    val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    toks.join(tf, "tok")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("tf")).as("sum_tf"))
      .withColumn("lm_fp", expr("sum_tf * 1000 DIV n_tok"))
  }

  /** Bigram-LM fluency scorer — the conditional twin of
    * [[unigramLmScore]]: per document, the average corpus-conditional
    * bigram likelihood c(w₁w₂)/c(w₁·) in 1e-6 fixed point (integer
    * division end to end — no log, no float association, exact in any
    * partitioning). Unigram frequency scores WHAT words a document uses;
    * this scores whether they follow each other the way the corpus does
    * — shuffled or garbled text keeps its unigram score and loses this
    * one, which is why curation stacks run both.
    *
    * Shape: one narrow self-zip per document (no materialized n-gram
    * blowup), two count aggregations (bigram table, bigram-prefix
    * table), two equi-joins back, one per-doc aggregation. The Zipf head
    * of both count tables is absorbed by map-side partial aggregation.
    * Output: (id, n_pairs, sum_p_fp, bigram_lm_fp) per document with ≥ 2
    * tokens.
    */
  def bigramLmScore(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    import graft.functions.TextFunctions
    val tks = df.select(idCol.as("id"), TextFunctions.tokens(textCol).as("tk"))
      .filter(size(col("tk")) >= 2)
    val pairs = tks.select(col("id"),
      explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("bg")))).as("p"))
      .select(col("id"), col("p.w1").as("w1"), col("p.bg").as("bg"))
    val c1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c12 = pairs.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    pairs.join(c12, "bg").join(c1, "w1")
      .withColumn("p_fp", expr("c12 * 1000000 DIV c1"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("p_fp")).as("sum_p_fp"))
      .withColumn("bigram_lm_fp", expr("sum_p_fp DIV n_pairs"))
  }

  /** Lexical diversity per document as the Gini–Simpson index
    * 1 − Σᵢ(cᵢ/n)², computed entirely in integers:
    * gini_fp = (n² − Σcᵢ²)·10⁶ DIV n² — the log-free diversity score
    * (Shannon entropy needs `log`, which is not correctly rounded across
    * engines; Gini–Simpson ranks the same pathologies). Near 0 = one
    * token repeated (the SEO-spam / boilerplate signature even when the
    * repeated token is corpus-frequent, so unigram/bigram LM scores stay
    * high); near 1 = every token distinct. Two keyed aggregations, no
    * join. n ≤ ~3M tokens/doc before n²·10⁶ overflows Long — far beyond
    * any chunked training document.
    * Output: (id, n_tok, n_types, gini_fp) for non-empty documents.
    */
  def lexicalDiversity(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    import graft.functions.TextFunctions
    df.select(idCol.as("id"), explode(TextFunctions.tokens(textCol)).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_tok"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sumsq"))
      .withColumn("gini_fp",
        expr("(n_tok * n_tok - sumsq) * 1000000 DIV (n_tok * n_tok)"))
      .select(col("id"), col("n_tok"), col("n_types"), col("gini_fp"))
  }

  /** Adjacent-token-pair (bigram) frequencies — the merge-candidate
    * statistic of a BPE-training round (the highest-count adjacent pair
    * is the next merge). One narrow zip of each token list with its own
    * tail, one count aggregation whose Zipf head the map-side partial
    * aggregation absorbs; topN bounds the result to the merge table.
    */
  def bigrams(df: DataFrame, textCol: Column, topN: Int): DataFrame = {
    import graft.functions.TextFunctions
    val tks = df.select(TextFunctions.tokens(textCol).as("tk"))
      .filter(size(col("tk")) >= 2)
    val pairs = zip_with(
      slice(col("tk"), lit(1), size(col("tk")) - 1),
      slice(col("tk"), lit(2), size(col("tk")) - 1),
      (a, b) => concat(a, lit(" "), b))
    tks.select(explode(pairs).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(topN)
  }

  /** Default PII patterns. The email pattern is the ONE shared constant
    * ([[graft.functions.TextFunctions.EmailRe]] — also used by redactPii
    * and emitted verbatim into the oracle SQL), so a future pattern fix
    * propagates to every scrub path. The phone pattern here is the
    * parenthesized US form; TextFunctions.PhoneRe covers the dashed form.
    * Both are deliberately RE2-safe (no backreferences, no lookaround) so
    * the same string runs identically under Java regex (Spark) and RE2
    * (DuckDB/production scanners).
    */
  val EmailPattern: String = graft.functions.TextFunctions.EmailRe
  val PhonePattern = "\\(\\d{3}\\) \\d{3}-\\d{4}"

  /** PII scrubbing — the redaction pass every shareable training corpus
    * needs: replace email addresses and phone numbers with typed
    * placeholder tags and keep per-document audit counts (matches found
    * BEFORE redaction), so the scrub is reviewable and its coverage is a
    * queryable statistic, not a hope. Purely narrow per-row regex work —
    * codegen'd, no shuffle, perfectly distributed at any corpus size.
    * Output: (id, n_emails, n_phones, clean) with emails → `<EMAIL>`,
    * phones → `<PHONE>`.
    */
  def piiScrub(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("id"),
        size(regexp_extract_all(textCol, lit(EmailPattern), lit(0))).as("n_emails"),
        size(regexp_extract_all(textCol, lit(PhonePattern), lit(0))).as("n_phones"),
        regexp_replace(regexp_replace(textCol, EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>").as("clean"))

  /** C4-style boilerplate line removal: a line that occurs in at least
    * `dfCap` DISTINCT documents (nav menus, cookie banners, footers) is
    * corpus boilerplate; drop it from every document, preserving each
    * document's remaining line order. Shape at 100 TB: one line-level
    * document-frequency aggregation, then the boilerplate SET — heavy
    * hitters by construction, so it is small — broadcasts back over the
    * corpus as a membership filter inside a narrow per-row array filter;
    * the corpus itself is never re-shuffled or exploded a second time.
    * Output: (id, n_kept, n_dropped, clean) with clean = surviving lines
    * re-joined by newline.
    */
  def dropBoilerplate(df: DataFrame, idCol: Column, textCol: Column,
                      dfCap: Int): DataFrame = {
    val lines = df.select(idCol.as("id"),
      explode(split(textCol, "\n")).as("line"))
    val boiler = lines.groupBy(col("line"))
      .agg(countDistinct(col("id")).as("ndocs"))
      .filter(col("ndocs") >= dfCap)
      .agg(coalesce(collect_list(col("line")),
        array().cast("array<string>")).as("bl"))
    df.select(idCol.as("id"), split(textCol, "\n").as("ls"))
      .crossJoin(broadcast(boiler))
      .select(col("id"),
        filter(col("ls"), x => !array_contains(col("bl"), x)).as("kept"),
        size(col("ls")).as("n_lines"))
      .select(col("id"), size(col("kept")).as("n_kept"),
        (col("n_lines") - size(col("kept"))).as("n_dropped"),
        array_join(col("kept"), "\n").as("clean"))
  }

  /** Deterministic token-budget sampling: keep documents in seedless
    * md5-hash order until the running token total reaches `budget` — the
    * "give me exactly N training tokens" cut every run configuration
    * needs, stable under corpus growth (a doc's rank never changes) and
    * re-partitioning.
    *
    * The global prefix sum is two-level, never a global sort: documents
    * bucket by their hash's first two hex chars (256 fixed buckets),
    * per-bucket token totals aggregate to a 256-row relation whose
    * exclusive prefix offsets come from an ordered running-sum window
    * over that relation (unpartitioned, but over a CONSTANT 256-row
    * metadata relation — never the data), and the
    * within-bucket running sum is a window PARTITIONED by bucket. A doc
    * is kept iff its exclusive global cumulative is below the budget, so
    * the kept set is the exact hash-order prefix that first reaches it.
    *
    * Output: the surviving rows of `df` plus (n_tokens, cum_before).
    */
  def tokenBudgetSample(df: DataFrame, idCol: Column, textCol: Column,
                        budget: Long): DataFrame = {
    require(budget > 0, "tokenBudgetSample: budget must be positive")
    val base = df
      .withColumn("_tbs_id", idCol)
      .withColumn("n_tokens", TextFunctions.tokenCount(textCol))
      .withColumn("_tbs_rk", md5(idCol.cast("string")))
      .withColumn("_tbs_bk", substring(col("_tbs_rk"), 1, 2))
    // limit(256) is a no-op (the bucket key is two hex chars, ≤ 256
    // groups) that makes the boundedness PROVABLE in the physical plan:
    // the unpartitioned running-sum window below demonstrably sorts a
    // ≤ 256-row metadata relation, never the data.
    val perB = base.groupBy(col("_tbs_bk")).agg(sum(col("n_tokens")).as("_tbs_btoks"))
      .limit(256)
    val wb = Window.orderBy(col("_tbs_bk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = perB
      .withColumn("_tbs_off", coalesce(sum(col("_tbs_btoks")).over(wb), lit(0L)))
      .select(col("_tbs_bk"), col("_tbs_off"))
    val w = Window.partitionBy(col("_tbs_bk"))
      .orderBy(col("_tbs_rk").asc, col("_tbs_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offs), "_tbs_bk")
      .withColumn("cum_before",
        col("_tbs_off") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") < budget)
      .drop("_tbs_id", "_tbs_rk", "_tbs_bk", "_tbs_off")
  }

  /** N-gram novelty: the fraction (fp3) of a document's DISTINCT 3-gram
    * shingles that occur in no other document — high novelty marks
    * original content, near-zero marks template/boilerplate-dominated
    * docs; the complement of near-dup signals, and a useful memorization
    * screen. Exact integer arithmetic (count ratios), so hash-checkable.
    *
    * Scale shape: one shingle-level document-frequency aggregation
    * (two-level, like [[vocab]] — partial counts absorb within-doc
    * repeats before the shuffle) and one join back on the shingle key;
    * the corpus is never self-joined pairwise.
    */
  def noveltyScore(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    noveltyFromShingleArrays(df.select(idCol.as("id"),
      TextFunctions.shingles(textCol, 3, distinct = true).as("tk")))

  /** [[noveltyScore]] over a pre-built (id, tk) relation of per-document
    * DISTINCT shingle arrays (the staged doc-shingle artifact path —
    * skips re-tokenization). The document-frequency aggregation stays
    * here: df is relative to the corpus slice being scored, not a
    * property of the artifact.
    *
    * Shape: a df = 1 shingle belongs to EXACTLY one document, so its
    * owner rides through the frequency aggregation itself (max(id) of a
    * one-row group is that row) — the per-doc unique count is then a
    * re-aggregation of only the df = 1 survivors, and the corpus-wide
    * join BACK on the shingle string (the full shingle volume through a
    * second wide shuffle) disappears. Measured 27.8 s → about half at
    * 500k docs; per-doc totals come narrow from the array length.
    */
  def noveltyFromShingleArrays(toks: DataFrame): DataFrame = {
    val sh = toks.select(col("id"), explode(col("tk")).as("sh"))
    val uniq = sh.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"), max(col("id")).as("owner"))
      .filter(col("df") === 1L)
      .groupBy(col("owner").as("id"))
      .agg(count(lit(1)).as("n_unique"))
    toks.select(col("id"), size(col("tk")).cast("long").as("n_shingles"))
      .filter(col("n_shingles") > 0L) // shingle-less docs never had rows
      .join(uniq, Seq("id"), "left")
      .na.fill(0L, Seq("n_unique"))
      .select(col("id"), col("n_shingles"), col("n_unique"),
        expr("n_unique * 1000L DIV n_shingles").as("novelty_fp"))
  }

  /** Weight clamp bound for [[lrQualityTrain]] (fp3: ±8.0). */
  val LrWClamp = 8000L
  /** Hard-sigmoid offset making every division dividend non-negative
    * (|z_fp6| ≤ 4·LrWClamp·1000 = 3.2e7 < 4e7; 4e7 is a multiple of the
    * 4000 divisor so the shift is exact).
    */
  val LrZOffset = 40000000L
  /** Offset constant for the floor-division-via-truncation identity in
    * the weight update (K·b dominates any |gradient·lrNum| here).
    */
  val LrKOffset = 10000000L

  /** Model-based quality filtering: a tiny logistic-regression quality
    * classifier TRAINED IN THE ENGINE by full-batch gradient descent —
    * the filtering stage (à la C4/CCNet quality classifiers) that comes
    * after heuristic scoring in a large-scale corpus pipeline. Entirely
    * integer fixed-point, so training is bit-replayable by the SQL
    * oracle:
    *
    *  - features per document, each in fp3 [0, 1000]: bias, saturated
    *    token count (cap 200), stopword density, capped mean token
    *    length (cap 20 chars);
    *  - hard-sigmoid link p = clamp(z/4 + 1/2, 0, 1) instead of the
    *    libm sigmoid — exp() is not exactly-rounded and would diverge
    *    between engines at the last ulp; the hard-sigmoid is pure
    *    integer arithmetic (all divisions offset to non-negative
    *    dividends, where truncation = floor in every engine);
    *  - full-batch gradient g_j = Σ (p − y)·x_j (exact integer in any
    *    partitioning/order), update w ← clamp(w − ⌊g·lrNum / (n·1000·
    *    lrDen)⌋, ±8.0), weights carried as fp3 longs.
    *
    * Scale shape: features are a narrow projection computed once and
    * staged ([[Stage]]); each step is ONE aggregation over n rows
    * producing 4 longs to the driver (the k-means centroid-collect
    * discipline — the model is driver-sized, the data never is). Steps
    * are a fixed unroll, the oracle replays each exactly.
    *
    * Output row: (w0_fp..w3_fp, n_docs, n_correct, acc_fp) at the final
    * weights, n_correct counting sign-agreement of p ≥ 1/2 with y.
    */
  /** The LR quality classifier's fp3 feature projection — (id, f1, f2,
    * f3[, y]) — shared by [[lrQualityTrain]] (with the label) and
    * [[lrQualityScore]] (without), so a model trained on one corpus
    * scores another with bit-identical feature math.
    */
  private def lrFeatureFrame(df: DataFrame, idCol: Column, textCol: Column,
                             labelCol: Option[Column]): DataFrame = {
    val toks = TextFunctions.tokens(textCol)
    val stopList = Seq("the", "a", "of", "and", "to", "in")
    df.select(Seq(
        idCol.as("id"),
        size(toks).cast("long").as("n_tok"),
        size(filter(toks, t => t.isin(stopList.map(_.asInstanceOf[Any]): _*)))
          .cast("long").as("stop"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("sum_len")) ++
        labelCol.map(l => when(l, lit(1000L)).otherwise(lit(0L)).as("y")): _*)
      .selectExpr(Seq("id") ++ labelCol.map(_ => "y") ++ Seq(
        "least(n_tok, 200L) * 5L AS f1",
        "CASE WHEN n_tok > 0 THEN stop * 1000L DIV n_tok ELSE 0L END AS f2",
        """least(CASE WHEN n_tok > 0 THEN sum_len * 1000L DIV n_tok
          |      ELSE 0L END, 20000L) DIV 20L AS f3""".stripMargin): _*)
  }

  /** Apply a trained LR quality model: (id, p_fp) with p_fp the fp3
    * hard-sigmoid probability — the FILTERING half of the model-based
    * quality stage ([[lrQualityTrain]] is the training half; weights are
    * four fp3 scalars, broadcast-class by construction). Integer-exact,
    * same link as training, so keep/drop decisions replay in SQL.
    */
  def lrQualityScore(df: DataFrame, idCol: Column, textCol: Column,
                     w: Seq[Long]): DataFrame = {
    require(w.length == 4, s"lrQualityScore: 4 weights expected, got ${w.length}")
    lrFeatureFrame(df, idCol, textCol, None)
      .withColumn("z", lit(w(0)) * lit(1000L) + lit(w(1)) * col("f1") +
        lit(w(2)) * col("f2") + lit(w(3)) * col("f3"))
      .withColumn("p_fp", expr(
        s"least(greatest((z + $LrZOffset) DIV 4000L - ${LrZOffset / 4000} + 500L, 0L), 1000L)"))
      .select(col("id"), col("p_fp"))
  }

  def lrQualityTrain(df: DataFrame, idCol: Column, textCol: Column,
                     labelCol: Column, steps: Int = 3,
                     lrNum: Long = 1L, lrDen: Long = 2L,
                     stage: Stage = Stage.Local): DataFrame = {
    require(steps > 0 && lrNum > 0 && lrDen > 0,
      "lrQualityTrain: steps and learning rate must be positive")
    val feats = stage.cut(
      lrFeatureFrame(df, idCol, textCol, Some(labelCol)), "lrq_feats")
    val n = feats.count()
    require(n > 0, "lrQualityTrain: empty corpus")
    var w = Array(0L, 0L, 0L, 0L)
    def withP(ws: Array[Long]): DataFrame = feats
      .withColumn("z", lit(ws(0)) * lit(1000L) + lit(ws(1)) * col("f1") +
        lit(ws(2)) * col("f2") + lit(ws(3)) * col("f3"))
      .withColumn("p", expr(
        s"least(greatest((z + $LrZOffset) DIV 4000L - ${LrZOffset / 4000} + 500L, 0L), 1000L)"))
    for (_ <- 0 until steps) {
      val g = withP(w)
        .agg(sum((col("p") - col("y")) * lit(1000L)).as("g0"),
          sum((col("p") - col("y")) * col("f1")).as("g1"),
          sum((col("p") - col("y")) * col("f2")).as("g2"),
          sum((col("p") - col("y")) * col("f3")).as("g3"))
        .head()
      val b = n * 1000L * lrDen
      w = w.indices.map { j =>
        val step = Math.floorDiv(g.getLong(j) * lrNum, b)
        Math.max(-LrWClamp, Math.min(LrWClamp, w(j) - step))
      }.toArray
    }
    withP(w)
      .agg(count(lit(1)).as("n_docs"),
        sum(when((col("p") >= 500L) === (col("y") === 1000L), 1L)
          .otherwise(0L)).as("n_correct"))
      .select(lit(w(0)).as("w0_fp"), lit(w(1)).as("w1_fp"),
        lit(w(2)).as("w2_fp"), lit(w(3)).as("w3_fp"),
        col("n_docs"), col("n_correct"),
        expr("n_correct * 1000L DIV n_docs").as("acc_fp"))
  }
}
