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
    // per-doc length; tf over query terms only — the isin filter prunes
    // before the shuffle
    val dl = toks.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
    val tf = toks.select(col("doc_id"), explode(col("tk")).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    bm25Score(tf, dl)
  }

  /** The BM25 scoring tail shared by the from-corpus and from-stage
    * paths: `tf` = (doc_id, tok, tf) over the query terms, `dl` =
    * (doc_id, dl) for EVERY document (globals derive from it).
    */
  private def bm25Score(tf: DataFrame, dl: DataFrame): DataFrame = {
    val globals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total"))
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

  // ---- persisted postings index ----
  //
  // Every lexical-retrieval path here starts from the same derived
  // relations: the postings table (tok, doc_id, tf), the doc-length
  // table (doc_id, dl), the per-term document frequencies (tok, df) and
  // the corpus globals (n_docs, Σdl). Rebuilding any of them per query
  // re-runs the expensive half of the whole plan — corpus tokenize +
  // explode + corpus-wide aggregations/windows — exactly the way the
  // reference would re-index its searchable table per query if it didn't
  // persist it (rag.py:30-38 builds the table once and queries it many
  // times). stagePostings lands ALL of them on disk ONCE, including the
  // per-token IMPACT RANK (row_number by tf DESC, doc_id — the
  // WAND-family impact-ordered layout), so a capped query filters
  // `rank <= maxPostings` instead of running a corpus-wide window.
  //
  // Layout under `path` (every relation hash-bucket-partitioned so
  // maintenance touches only affected partitions — the GraphAnnIndex
  // discipline):
  //
  //   postings/ pb=N/ (tok, doc_id, tf, rank, gen)  pb = crc32(tok) % 64
  //   dfreq/    pb=N/ (tok, df, gen)                same key as postings
  //   doclens/  db=N/ (doc_id, dl, gen, tomb)       db = crc32(id str) % 64
  //   fwd/      db=N/ (doc_id, pb)                  forward sidecar: the
  //             token buckets each doc has postings in — [[deletePostings]]
  //             learns the victims' pb set from an id-hash-pruned lookup
  //             instead of scanning the postings relation (the IvfIndex
  //             ids/ discipline). Append-only SUPERSET: rows of deleted
  //             docs are retained (they prune extra, empty buckets —
  //             harmless) and GC'd by [[compactPostings]].
  //   _GEN            "G nDocs totalDl" — the COMMIT POINT (see below)
  //   _POSTINGS_DONE  done marker, written last at build via atomic rename
  //   _APPENDING      maintenance-intent marker (crash ⇒ detected, healed
  //                   by [[recoverPostings]])
  //
  // EVERY relation is LSM under maintenance: append/delete only ever add
  // new files carrying rows at generation g = G+1 — deletion is a doclens
  // TOMBSTONE row and a df-decremented (possibly 0 = dead) dfreq row, and
  // no live partition is ever rewritten outside [[compactPostings]]. The
  // atomic `_GEN` rename is the single commit point: rows above the
  // committed G are invisible to [[readStage]]'s resolution, so a writer
  // crash at ANY point before the rename leaves the stage readable at
  // exactly its pre-maintenance state, and [[recoverPostings]] heals by
  // garbage-collecting the orphaned generation (identifiable: gen > G)
  // and clearing the intent — never a rebuild. Resolution: dfreq's
  // per-token row of maximal generation is authoritative (df = 0 ⇒ the
  // token is dead and every surviving stale postings row of it is
  // invisible); a postings row is current iff (tok, gen) matches that
  // authoritative row; a doclens row is current iff it is the doc's
  // maximal-generation row and not a tombstone. A fresh or compacted
  // stage (G = 0) is single-generation by construction and skips the
  // resolution plan entirely. Without the LSM, a realistic text batch
  // touches most of the 64 token buckets and each append rewrote nearly
  // the whole relation — cost ∝ corpus, the named 100 TB scale-killer.
  //
  // crc32 (not Spark's murmur `hash`) because a literal query term's
  // bucket is trivially computable driver-side, so single-query lookups
  // partition-prune the postings scan to |terms| buckets. At 100 TB the
  // pb-partitioning doubles as the bucketed-on-tok layout that
  // co-locates term joins.

  private[operators] val NumTokBuckets = 64

  /** The token-hash partition key, computed identically as a Column (for
    * staging) and driver-side (for literal query terms → partition
    * pruning): CRC32 of the UTF-8 bytes, mod [[NumTokBuckets]].
    */
  private def pbCol(tok: Column): Column =
    pmod(crc32(tok), lit(NumTokBuckets.toLong)).cast("int")

  private[operators] def pbOf(tok: String): Int = {
    val c = new java.util.zip.CRC32()
    c.update(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (c.getValue % NumTokBuckets).toInt
  }

  private def dbCol(id: Column): Column =
    pmod(crc32(id.cast("string")), lit(NumTokBuckets.toLong)).cast("int")

  private def postingsMarker(path: String) =
    java.nio.file.Paths.get(path, "_POSTINGS_DONE")
  private def intentFile(path: String) =
    java.nio.file.Paths.get(path, "_APPENDING")
  private def genFile(path: String) =
    java.nio.file.Paths.get(path, "_GEN")

  /** The committed state (G, nDocs, totalDl) — read from the atomic
    * `_GEN` commit file, falling back to the legacy `globals/` parquet
    * relation for stages written before the generation-commit protocol
    * (those are READ back-compatibly; incremental maintenance on them is
    * refused with a rebuild prescription, not silently mixed in).
    */
  private def readCommitted(spark: org.apache.spark.sql.SparkSession,
                            path: String): (Long, Long, Long) =
    if (java.nio.file.Files.exists(genFile(path))) {
      val p = java.nio.file.Files.readString(genFile(path)).trim.split(" ")
      (p(0).toLong, p(1).toLong, p(2).toLong)
    } else {
      val r = spark.read.parquet(s"$path/globals").collect().head
      (if (r.length > 2) r.getLong(2) else 0L, r.getLong(0), r.getLong(1))
    }

  /** THE commit point of every maintenance pass: generation high-water
    * mark + corpus globals advance together in one atomic rename. A
    * reader sees either the whole pass or none of it.
    */
  private def writeCommitted(path: String, g: Long, nDocs: Long,
                             total: Long): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Paths.get(path, "_GEN_TMP")
    Files.writeString(tmp, s"$g $nDocs $total")
    graft.tables.Staging.atomicPublish(tmp, genFile(path))
  }

  private def requireGenCommitted(path: String, op: String): Unit =
    require(java.nio.file.Files.exists(genFile(path)),
      s"postings stage at $path predates the generation-committed layout " +
        s"— rebuild with stagePostings() (or run compactPostings(), the " +
        s"in-place migration) before $op")

  /** Done-marker `key=value` properties: build parameters and the
    * written schema of each relation. Legacy markers carry the bare
    * string "ok" → empty map; consumers treat absent keys as "legacy
    * stage" (reads fall back to schema inference, knob validation is
    * skipped), so pre-existing stages stay readable.
    */
  private def markerProps(marker: java.nio.file.Path): Map[String, String] =
    if (!java.nio.file.Files.exists(marker)) Map.empty
    else java.nio.file.Files.readString(marker).linesIterator
      .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap

  /** Read a staged relation with the schema recorded at build time.
    * Without it, a relation whose every partition was deleted (e.g.
    * deletePostings of the last remaining docs) or whose build wrote
    * zero rows is a fileless directory that parquet schema inference
    * REFUSES — the stage would be torn-by-emptiness while its done
    * marker says healthy. The recorded schema makes the empty relation
    * read as an empty DataFrame, which is the honest answer.
    */
  private def readRel(spark: org.apache.spark.sql.SparkSession, path: String,
                      rel: String, marker: java.nio.file.Path): DataFrame =
    markerProps(marker).get(s"schema.$rel") match {
      case Some(j) => spark.read.schema(org.apache.spark.sql.types.DataType
          .fromJson(j).asInstanceOf[org.apache.spark.sql.types.StructType])
        .parquet(s"$path/$rel")
      case None => spark.read.parquet(s"$path/$rel")
    }

  /** True iff a completed postings stage exists at `path` (marker is
    * written last).
    */
  def postingsExist(path: String): Boolean =
    java.nio.file.Files.exists(postingsMarker(path))

  /** Run the INDEPENDENT Spark jobs of one committed pass concurrently
    * (each lands in its own relation directory; nothing any of them
    * writes is visible until the pass's single atomic `_GEN` commit, so
    * overlap changes wall-clock, never crash-safety). The point is the
    * streaming drains: a micro-batch append is 3-4 small write jobs
    * whose cost at micro-batch size is mostly fixed per-job scheduling
    * — sequential launches made job count the drain's bottleneck
    * (VERDICT r17: "the lever left is fixed per-micro-batch planning
    * overhead"). All tasks are awaited; the first failure rethrows
    * AFTER every task settles, so the caller's intent-marker rollback
    * sees a quiesced stage.
    */
  private def concurrently(tasks: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = tasks.map(t => Future(t()))
    val settled = fs.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    settled.collectFirst { case scala.util.Failure(e) => throw e }
  }

  /** The per-token impact rank: 1 = the token's highest-tf posting
    * (ties by doc_id). Staged at build time so capped retrieval is a
    * FILTER, not a corpus-wide window.
    *
    * The window keys on (pb, tok), which is semantically identical to
    * (tok) — pb is a pure function of tok — but declares pb so that a
    * pb-partitioned input satisfies the window's clustering requirement:
    * `repartition(pb) → rank → partitionBy(pb) write` plans ONE exchange
    * end-to-end (guide §2.4 "two operations keyed the same way share one
    * exchange") where the r19 shape paid three (groupBy key, window key,
    * write key). Callers feed it pb-partitioned rows and write WITHOUT a
    * further repartition; a pb's rows all sit in one task, so the
    * one-file-per-partition-dir small-files guard still holds.
    */
  private def withImpactRank(postings: DataFrame): DataFrame = {
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pb"), col("tok"))
      .orderBy(col("tf").desc, col("doc_id"))
    postings.withColumn("rank", row_number().over(pw).cast("long"))
  }

  /** Build the postings stage (see layout above). The corpus is
    * tokenized exactly once (lineage cut feeds every relation);
    * zero-token docs keep their doclens row so staged n_docs matches
    * the corpus count. Done-marker written last.
    */
  def stagePostings(docs: DataFrame, idCol: Column, textCol: Column,
                    path: String): Unit = {
    deleteStage(path)
    val toks = docs.select(idCol.as("doc_id"),
        TextFunctions.tokens(textCol).as("tk"))
      .localCheckpoint()
    val doclensW = toks.select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        lit(0L).as("gen"), lit(false).as("tomb"),
        dbCol(col("doc_id")).as("db"))
    // ONE exchange for the whole postings side (r20, guide §2.4): the
    // exploded tokens hash-partition by pb once, and because pb rides
    // every downstream key — the (pb, tok, doc_id) aggregate, the
    // (pb, tok) rank window, the (pb, tok) dfreq aggregate, the
    // (doc_id, pb) fwd distinct, and the partitionBy("pb") writes — the
    // localCheckpoint's preserved outputPartitioning satisfies every
    // consumer's clustering with NO further shuffle (the r19 shape paid
    // a groupBy, a window and a write exchange per relation). The
    // map-side partial agg this forgoes shuffles raw token occurrences
    // (~1.5x the (tok, doc) pairs) instead of 3x the pairs — strictly
    // fewer bytes at any tf distribution.
    val postings = toks.select(col("doc_id"), explode(col("tk")).as("tok"))
      .withColumn("pb", pbCol(col("tok")))
      .repartition(col("pb"))
      .groupBy(col("pb"), col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // pb-partitioned: feeds ranked postings, dfreq AND fwd
    val postingsW = withImpactRank(postings)
      .withColumn("gen", lit(0L)) // LSM generation (see layout comment)
      .select(col("tok"), col("doc_id"), col("tf"), col("rank"), col("gen"),
        col("pb"))
    val dfreqW = postings.groupBy(col("pb"), col("tok"))
      .agg(count(lit(1)).as("df"))
      .withColumn("gen", lit(0L))
      .select(col("tok"), col("df"), col("gen"), col("pb"))
    val fwdW = postings
      .select(col("doc_id"), col("pb")).distinct()
      .withColumn("db", dbCol(col("doc_id")))
    // the four relation writes + the globals aggregate are independent
    // (checkpointed inputs, distinct dirs, nothing visible before the
    // done marker lands last) — run them concurrently; in a streaming
    // drain this is the first micro-batch's cost (cf. appendImpl)
    @volatile var g0: org.apache.spark.sql.Row = null
    concurrently(
      () => doclensW
        .repartition(col("db")) // one task per bucket -> one file per dir,
        // not one per (task, bucket) pair — the small-files guard every
        // partitioned stage write here applies
        .write.mode("overwrite").partitionBy("db").parquet(s"$path/doclens"),
      // postings/dfreq write WITHOUT a repartition: the checkpointed
      // relation is already pb-partitioned (one pb wholly inside one
      // task), so the write is exchange-free and still lands one file
      // per partition dir
      () => postingsW
        .write.mode("overwrite").partitionBy("pb").parquet(s"$path/postings"),
      () => dfreqW
        .write.mode("overwrite").partitionBy("pb").parquet(s"$path/dfreq"),
      () => fwdW
        .repartition(col("db"))
        .write.mode("overwrite").partitionBy("db").parquet(s"$path/fwd"),
      // globals computed from the same checkpointed plan that fed the
      // doclens write and committed via the atomic _GEN rename
      () => { g0 = toks.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("tk")).cast("long")), lit(0L)).as("total"))
        .collect().head })
    writeCommitted(path, 0L, g0.getLong(0), g0.getLong(1))
    // each relation's written schema rides in the done marker so an
    // emptied relation stays readable — see readRel
    writeDoneMarker(path, Seq(
      "schema.postings" -> postingsW.schema.json,
      "schema.dfreq" -> dfreqW.schema.json,
      "schema.doclens" -> doclensW.schema.json,
      "schema.fwd" -> fwdW.schema.json))
  }

  private def writeDoneMarker(path: String,
                              props: Seq[(String, String)]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Paths.get(path, "_POSTINGS_DONE_TMP")
    Files.writeString(tmp, props.map { case (k, v) => s"$k=$v" }.mkString("\n"))
    graft.tables.Staging.atomicPublish(tmp, postingsMarker(path))
  }

  private def deleteStage(path: String): Unit =
    graft.tables.Staging.deleteRec(path)

  /** Incremental postings maintenance: admit new documents into an
    * existing stage (ids already present are dropped — idempotent).
    * Raw posting/doclens rows are purely additive under document
    * insertion, but the DERIVED relations the stage carries are not:
    * a fresh doc can change the impact rank of every posting of a token
    * it contains, and that token's df. So the append re-ranks ONLY the
    * touched tokens and APPENDS those rows as new files at generation
    * g+1 — the LSM write (see the layout comment): no partition is
    * rewritten, written bytes ∝ the touched posting lists, never the
    * corpus or even the touched partitions (RetrievalSpec asserts the
    * pre-existing postings file set survives an append untouched). The
    * superseded rows lose their dfreq generation match and become
    * invisible to [[readStage]]'s resolution until [[compactPostings]]
    * drops them. dfreq merges additively for the touched partitions
    * (vocabulary-sized, the declared exception); the admission
    * anti-join prunes the staged doclens to the BATCH ids' hash
    * buckets (its partition key — a staged twin of an id always shares
    * the id's bucket, so pruning cannot miss), keeping the per-batch
    * admission scan ∝ the batch's buckets instead of the corpus;
    * globals advance by the batch's (count, Σdl). Append-then-query ≡
    * rebuild-then-query, hash-checked by q_postings_append against the
    * full-corpus replay.
    *
    * Crash safety: every write lands rows at the UNCOMMITTED generation
    * g = G+1 (invisible to [[readStage]]'s resolution) under the
    * `_APPENDING` intent marker, and the pass commits with ONE atomic
    * `_GEN` rename at the end — a crash at any earlier point leaves the
    * stage readable at exactly its pre-append state, healed by
    * [[recoverPostings]] (GC the orphaned generation, clear the intent),
    * never a rebuild. Mutators run under the shared [[WriterLock]]
    * exclusive-writer discipline.
    */
  def appendPostings(docs: DataFrame, idCol: Column, textCol: Column,
                     path: String): Unit =
    graft.tables.WriterLock.withLock(path)(
      appendImpl(docs, idCol, textCol, path))

  private def appendImpl(docs: DataFrame, idCol: Column, textCol: Column,
                         path: String): Unit = {
    val spark = docs.sparkSession
    val st = readStage(spark, path)
    requireGenCommitted(path, "appendPostings")
    val batch = docs.select(idCol.as("doc_id"),
        TextFunctions.tokens(textCol).as("tk"))
      .withColumn("db", dbCol(col("doc_id")))
      .localCheckpoint() // feeds the bucket collect AND the admission join
    // metadata-sized collect: db lives in [0, NumTokBuckets)
    val batchDbs = batch.select(col("db")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val fresh = batch
      .join(st.doclens.filter(col("db").isin(batchDbs: _*))
        .select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    // ONE metadata-sized action answers is-empty AND the globals advance
    // (count, Σdl) — the separate isEmpty probe plus the concurrent
    // writeGlobals job were two more driver round-trips per micro-batch
    // (r20; each sequential job at batch size is ~100 ms of fixed cost
    // plus a planning gap, cf. ProfileAppendJobs)
    val bg = fresh.agg(count(lit(1)).cast("long"),
      coalesce(sum(size(col("tk")).cast("long")), lit(0L))).collect().head
    if (bg.getLong(0) == 0L) return
    // NOT checkpointed (r20): its consumers below re-derive it from the
    // PINNED `fresh` — a narrow explode+agg at batch size, re-run inside
    // the concurrent write wall where it overlaps for free; the
    // checkpoint was one more sequential job + gap per micro-batch
    val freshPost = fresh.select(col("doc_id"), explode(col("tk")).as("tok"))
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .withColumn("pb", pbCol(col("tok")))
    val touched = freshPost.select(col("pb")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    java.nio.file.Files.createFile(intentFile(path))
    val g = st.gen + 1
    // the pass's jobs are mutually independent (pinned or static inputs,
    // distinct target dirs, all invisible until the _GEN rename) — run
    // them CONCURRENTLY; at micro-batch sizes each is dominated by
    // fixed per-job cost, so overlap ≈ divides the drain's per-batch
    // wall-clock by the job count
    val writePostings = () => {
      val toksNew = freshPost.select(col("tok")).distinct()
      // touched tokens re-rank over current ∪ fresh (identical ordering
      // to a full rebuild ⇒ identical ranks) and land at generation g —
      // untouched tokens' rows are never read back or rewritten. The
      // append lands in the dir it was read from: stage the write to a
      // side dir (ONE job — the localCheckpoint this replaces charged a
      // whole extra job per micro-batch just to guard read-vs-append
      // re-planning) and promote the part-files with driver renames.
      // Crash anywhere: promoted rows sit at the uncommitted gen g,
      // invisible to resolution; recoverPostings GCs them. Same window
      // the checkpointed append already had.
      // repartition(pb) BEFORE the rank: the (pb, tok) window and the
      // partitionBy("pb") write then share that one exchange (see
      // withImpactRank) — one new file per touched partition as before
      val rerank = withImpactRank(
        st.postings.filter(col("pb").isin(touched: _*))
          .join(toksNew, Seq("tok"), "left_semi")
          .select(col("tok"), col("doc_id"), col("tf"))
          .unionByName(freshPost.select(col("tok"), col("doc_id"), col("tf")))
          .withColumn("pb", pbCol(col("tok")))
          .repartition(col("pb")))
        .withColumn("gen", lit(g))
      val stg = s"$path/_APPEND_STAGE_postings"
      graft.tables.Staging.deleteRec(stg)
      rerank.select(col("tok"), col("doc_id"), col("tf"), col("rank"),
          col("gen"), col("pb"))
        .write.mode("overwrite").partitionBy("pb").parquet(stg)
      graft.tables.Staging.moveInto(stg, s"$path/postings", "pb")
      ()
    }
    // dfreq: ONE new row per TOUCHED token at generation g (its new
    // authoritative df); untouched tokens' rows — and the touched
    // tokens' superseded rows — stay on disk verbatim, invisible to
    // resolution until compaction drops them. Writes ∝ the batch's
    // vocabulary, and nothing is overwritten.
    val writeDfreq = () => {
      val newDf = freshPost.groupBy(col("tok")).agg(count(lit(1)).as("df_new"))
      val mergedDf = newDf
        .join(st.dfreq.filter(col("pb").isin(touched: _*))
          .select(col("tok"), col("df")), Seq("tok"), "left_outer")
        .select(col("tok"),
          (coalesce(col("df"), lit(0L)) + col("df_new")).as("df"),
          lit(g).as("gen"),
          pbCol(col("tok")).as("pb"))
      mergedDf
        .repartition(col("pb"))
        .write.mode("append").partitionBy("pb").parquet(s"$path/dfreq")
    }
    val writeDoclens = () => {
      fresh.select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
          lit(g).as("gen"), lit(false).as("tomb"), col("db"))
        .repartition(col("db"))
        .write.mode("append").partitionBy("db").parquet(s"$path/doclens")
    }
    // forward sidecar: the batch docs' token buckets — append-only
    val writeFwd = () => {
      freshPost.select(col("doc_id"), col("pb")).distinct()
        .withColumn("db", dbCol(col("doc_id")))
        .repartition(col("db"))
        .write.mode("append").partitionBy("db").parquet(s"$path/fwd")
    }
    if (touched.nonEmpty)
      concurrently(writePostings, writeDfreq, writeDoclens, writeFwd)
    else concurrently(writeDoclens, writeFwd)
    // THE commit: generation + globals advance atomically; everything
    // above was invisible until this rename
    writeCommitted(path, g, st.nDocs + bg.getLong(0),
      st.totalDl + bg.getLong(1))
    java.nio.file.Files.delete(intentFile(path))
  }

  /** Incremental DELETION — the corpus-refresh path (GDPR delete,
    * dedup-then-reindex) that previously forced a full restage. The
    * victims' token buckets come from the `fwd/` FORWARD SIDECAR with an
    * id-hash-pruned lookup (no postings scan — the cost that was ∝ the
    * corpus per delete wave is now ∝ the victims' buckets, the IvfIndex
    * id→cell discipline); everything after is ∝ the victims' locality:
    * the victims' tokens re-rank over the REMAINING postings and land as
    * NEW files at generation g+1 (the [[appendPostings]] LSM write — no
    * partition rewritten), dfreq gains one decremented row per victim
    * token (df = 0 marks the token DEAD, which alone makes every
    * surviving stale row of it invisible to [[readStage]]'s resolution),
    * doclens gains one TOMBSTONE row per victim, globals retreat by the
    * victims' (count, Σdl) at the same atomic `_GEN` commit. Nothing is
    * overwritten anywhere. Delete-then-query ≡ rebuild-on-remaining —
    * q_postings_delete hash-checks it. Same intent marker + writer lock
    * + [[recoverPostings]] heal as [[appendPostings]].
    */
  def deletePostings(ids: DataFrame, path: String,
                     idName: String = "doc_id"): Unit =
    graft.tables.WriterLock.withLock(path)(deleteImpl(ids, path, idName))

  private def deleteImpl(ids: DataFrame, path: String,
                         idName: String): Unit = {
    val spark = ids.sparkSession
    val st = readStage(spark, path)
    requireGenCommitted(path, "deletePostings")
    val idsB = ids.select(col(idName).as("doc_id"))
      .withColumn("db", dbCol(col("doc_id")))
      .localCheckpoint() // feeds the bucket collect AND the victim lookup
    // metadata-sized collect: db lives in [0, NumTokBuckets) — the
    // victim lookup prunes doclens to the DELETION SET's buckets
    val idsDbs = idsB.select(col("db")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val victims = st.doclens.filter(col("db").isin(idsDbs: _*))
      .join(idsB.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    if (victims.isEmpty) return
    java.nio.file.Files.createFile(intentFile(path))
    val g = st.gen + 1
    val vg = victims.agg(count(lit(1)).cast("long"),
      coalesce(sum(col("dl")), lit(0L))).collect().head
    val vdb = victims.select(col("db")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    // the victims' token buckets from the forward sidecar — an id-hash-
    // pruned lookup (a doc's fwd rows share its doclens bucket), then a
    // metadata-sized collect: pb lives in [0, NumTokBuckets). fwd is an
    // append-only superset (stale rows of PREVIOUSLY deleted docs prune
    // extra buckets where the semi-join below finds nothing — harmless).
    val fwd = readRel(spark, path, "fwd", postingsMarker(path))
    val victimPbs = fwd.filter(col("db").isin(vdb: _*))
      .join(victims.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("pb")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    // victim posting rows from the PRUNED scan → touched tokens (with
    // the victims' contribution to each token's df)
    val victimRows = st.postings.filter(col("pb").isin(victimPbs: _*))
      .join(victims.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("tok"), col("pb"))
      .localCheckpoint()
    val victimDf = victimRows.groupBy(col("tok"), col("pb"))
      .agg(count(lit(1)).as("df_gone"))
      .localCheckpoint()
    val touched = victimDf.select(col("pb")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.nonEmpty) {
      val toksGone = victimDf.select(col("tok"))
      // remaining rows of the victims' tokens re-rank at generation g —
      // LSM append, cf. appendPostings; a token with NO remaining rows
      // gets its df = 0 death-marker row below
      val rerank = withImpactRank(
        st.postings.filter(col("pb").isin(touched: _*))
          .join(toksGone, Seq("tok"), "left_semi")
          .join(victims.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .select(col("tok"), col("doc_id"), col("tf"))
          .withColumn("pb", pbCol(col("tok")))
          .repartition(col("pb"))) // one exchange shared with the rank
          // window and the partitioned write, cf. withImpactRank
        .withColumn("gen", lit(g))
      // staged-write + promote, cf. appendImpl's writePostings: one job
      // instead of checkpoint + append, same crash window (uncommitted
      // gen g rows are invisible; recoverPostings GCs them)
      val stg = s"$path/_APPEND_STAGE_postings"
      graft.tables.Staging.deleteRec(stg)
      rerank.select(col("tok"), col("doc_id"), col("tf"), col("rank"),
          col("gen"), col("pb"))
        .write.mode("overwrite").partitionBy("pb").parquet(stg)
      graft.tables.Staging.moveInto(stg, s"$path/postings", "pb")
      // dfreq: ONE new row per VICTIM token at generation g with the
      // decremented df — df = 0 is the death marker resolution filters
      val mergedDf = st.dfreq.filter(col("pb").isin(touched: _*))
        .join(victimDf.select(col("tok"), col("df_gone")), Seq("tok"))
        .select(col("tok"),
          (col("df") - col("df_gone")).as("df"),
          lit(g).as("gen"),
          col("pb"))
      mergedDf
        .repartition(col("pb"))
        .write.mode("append").partitionBy("pb").parquet(s"$path/dfreq")
    }
    // doclens: one tombstone row per victim — nothing rewritten
    victims.select(col("doc_id"), col("dl"), lit(g).as("gen"),
        lit(true).as("tomb"), col("db"))
      .repartition(col("db"))
      .write.mode("append").partitionBy("db").parquet(s"$path/doclens")
    writeCommitted(path, g, st.nDocs - vg.getLong(0),
      st.totalDl - vg.getLong(1))
    java.nio.file.Files.delete(intentFile(path))
  }

  /** Re-index UPSERT — replace changed documents (and insert unseen
    * ids): delete-then-append composition, each half touching only its
    * victims'/batch's hash-bucket partitions, so an update wave costs
    * its locality, never a restage (the GraphAnnIndex.upsert /
    * VectorStore.upsert discipline). Both halves are individually
    * proven ≡ rebuild, so their composition is too; a crash between the
    * halves leaves the CONSISTENT deleted state (the batch's docs
    * absent), and re-running the upsert heals it — delete no-ops on the
    * already-removed ids, append re-admits everything.
    * q_postings_upsert hash-checks upsert-then-query against a replay
    * over the modified corpus.
    */
  def upsertPostings(docs: DataFrame, idCol: Column, textCol: Column,
                     path: String): Unit =
    graft.tables.WriterLock.withLock(path) {
      deleteImpl(docs.select(idCol.as("doc_id")), path, "doc_id")
      appendImpl(docs, idCol, textCol, path)
    }

  /** Compact the stage in place: rewrite every hash-bucket partition
    * into one file, DROP the superseded-generation rows, tombstones and
    * forward-sidecar orphans the LSM maintenance left behind, and reset
    * every generation to 0 — the maintenance pass that keeps both file
    * counts AND stale-row read amplification flat as streaming appends
    * accumulate. After compaction the stage is relation-for-relation
    * identical to a fresh [[stagePostings]] on the same corpus
    * (RetrievalSpec asserts it); resolved queries are invariant. The
    * rewrite — the ONE maintenance pass that replaces live partitions —
    * runs under the crash-safe [[graft.tables.Commit]] staged-swap
    * protocol: a crash at any point either discards the staged rewrite
    * whole or rolls it forward in [[recoverPostings]], never tearing a
    * partition. Compacting a legacy (pre-generation-commit) stage is
    * also the supported in-place MIGRATION to the current layout: it
    * reads back-compatibly and writes gen/tomb/fwd/_GEN.
    */
  def compactPostings(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit =
    graft.tables.WriterLock.withLock(path) {
      val st = readStage(spark, path) // validates marker + resolves rows
      java.nio.file.Files.createFile(intentFile(path))
      val allB = (0 until NumTokBuckets).toSeq
      val p0 = st.postings // resolved: current-generation rows only
        .select(col("tok"), col("doc_id"), col("tf"), col("rank"),
          lit(0L).as("gen"), col("pb"))
      val d0 = st.dfreq // resolved: one current row per live token
        .select(col("tok"), col("df"), lit(0L).as("gen"), col("pb"))
      val l0 = st.doclens // resolved: tombstones and superseded rows gone
        .select(col("doc_id"), col("dl"), lit(0L).as("gen"),
          lit(false).as("tomb"), col("db"))
      val f0 = st.postings // forward sidecar rebuilt from current rows —
        // the deferred GC of delete's stale superset entries
        .select(col("doc_id"), col("pb")).distinct()
        .withColumn("db", dbCol(col("doc_id")))
      graft.tables.Commit.commit(path, Seq(
        graft.tables.Commit.Replace("postings", "pb", allB, p0),
        graft.tables.Commit.Replace("dfreq", "pb", allB, d0),
        graft.tables.Commit.Replace("doclens", "db", allB, l0),
        graft.tables.Commit.Replace("fwd", "db", allB, f0)))
      writeCommitted(path, 0L, st.nDocs, st.totalDl)
      // refresh the marker schemas — a legacy stage gains gen/tomb/fwd
      writeDoneMarker(path, Seq(
        "schema.postings" -> p0.schema.json,
        "schema.dfreq" -> d0.schema.json,
        "schema.doclens" -> l0.schema.json,
        "schema.fwd" -> f0.schema.json))
      java.nio.file.Files.delete(intentFile(path))
    }

  /** The stage's STALE-ROW FRACTION: the share of on-disk postings rows
    * that LSM maintenance has superseded (invisible to queries but still
    * read-and-dropped by every resolution pass — the read amplification
    * compaction exists to reclaim). 0.0 on a fresh/compacted stage.
    * Cost: one postings count + the resolved count — a maintenance-
    * policy probe, not a query-path cost.
    */
  def staleFraction(spark: org.apache.spark.sql.SparkSession,
                    path: String): Double = {
    val st = readStage(spark, path)
    if (st.gen == 0L) 0.0
    else {
      val raw = readRel(spark, path, "postings", postingsMarker(path)).count()
      if (raw == 0L) 0.0 else (raw - st.postings.count()).toDouble / raw
    }
  }

  /** AUTO-COMPACTION POLICY — bounds read amplification by policy
    * instead of operator memory: compact when the stale-row fraction
    * reaches `threshold` (default 30%: at that point every resolution
    * pass re-reads ~1.4x the live rows, and one rewrite both reclaims
    * the space and restores the zero-overhead G = 0 read path). Returns
    * whether a compaction ran. Streaming ingest calls this per batch
    * behind the [[committedGen]] ≥ 4 gate (the probe itself runs a
    * resolution-sized count — the gate keeps the per-batch cost at one
    * marker-file stat); overall cost stays amortized-constant: the
    * fraction only crosses the threshold after ~threshold/(1−threshold)
    * of the corpus has been superseded since the last compact.
    */
  def compactIfStale(spark: org.apache.spark.sql.SparkSession,
                     path: String, threshold: Double = 0.3): Boolean = {
    val f = staleFraction(spark, path)
    if (f >= threshold && f > 0.0) { compactPostings(spark, path); true }
    else false
  }

  private def refuseTornPostings(path: String): Unit = {
    require(postingsExist(path), s"$path is not a postings stage")
    if (java.nio.file.Files.exists(intentFile(path)) ||
        graft.tables.Commit.pending(path))
      throw new IllegalStateException(
        s"$path has unfinished maintenance — heal with recoverPostings()")
  }

  /** The stage's FILE fragmentation — the worst relation's mean parquet
    * files per live partition (cf. GraphAnnIndex.fragmentation /
    * IvfIndex.fragmentation): STALENESS is not FRAGMENTATION — a long
    * append-only drain supersedes nothing (staleFraction stays 0.0) yet
    * lands one new file per touched partition per batch, growing every
    * resolved read's file count without bound. Max across relations, not
    * a blended mean: a resolution pass reads each relation separately,
    * so the worst one bounds the amplification. Driver-side readdir
    * only — no Spark job, free per micro-batch; refuses a torn stage.
    */
  def postingsFragmentation(path: String): Double = {
    refuseTornPostings(path)
    Seq("postings", "dfreq", "doclens", "fwd").map(r =>
      graft.tables.Staging.filesPerPartition(Seq(s"$path/$r"))).max
  }

  /** FILE-fragmentation auto-compaction policy — the missing half of
    * [[compactIfStale]] (which bounds superseded-ROW amplification but
    * never fires on an append-only stream): compact when the worst
    * relation's mean files-per-partition exceeds `maxFilesPerPartition`.
    * Threshold 4.0 (vs graph-ANN's 2.0 operator default): a resolved
    * postings read is bucket-pruned and tolerates a few files per
    * partition cheaply, and each avoided fire saves a whole-stage
    * rewrite — compaction debt is byte-identical either way (guide §6:
    * bound small files, don't chase them). Streaming ingest calls this
    * per batch; amortized cost is constant (a fire rewrites the stage
    * once per `maxFilesPerPartition` appends and resets to 1 file per
    * partition). Returns whether a compaction ran; results are
    * compaction-invariant (q_postings_autocompact proves the rewrite).
    */
  def compactPostingsIfFragmented(spark: org.apache.spark.sql.SparkSession,
                                  path: String,
                                  maxFilesPerPartition: Double = 4.0)
      : Boolean = {
    val f = postingsFragmentation(path)
    if (f > maxFilesPerPartition) { compactPostings(spark, path); true }
    else false
  }

  /** Heal the stage after a crashed writer — the recovery path that
    * replaces "rebuild with stagePostings()" (at 100 TB a day-long
    * incident): a stale writer lock clears (pid-checked), a logged
    * compaction commit rolls FORWARD (its intent certifies the staged
    * rewrite completed), and an interrupted append/delete rolls BACK by
    * garbage-collecting its orphaned generation — every row it landed
    * sits at gen > the committed G (the `_GEN` rename it never reached),
    * invisible to readers but a collision hazard for the next writer's
    * g = G+1. The GC rewrites only the partitions that actually hold
    * orphans, via the same crash-safe staged-swap protocol. Idempotent;
    * a no-op on a healthy stage. Recover-then-query ≡ the last committed
    * state — RetrievalSpec crash-injects every write boundary.
    */
  def recoverPostings(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit = {
    graft.tables.WriterLock.clearStale(path)
    graft.tables.Commit.recover(path)
    // a writer that crashed mid-promote leaves its LSM staging dir (the
    // unpromoted remainder is pre-visibility garbage; the promoted part
    // is orphan-gen rows the GC below reclaims)
    graft.tables.Staging.deleteRec(s"$path/_APPEND_STAGE_postings")
    if (java.nio.file.Files.exists(intentFile(path))) {
      val (gc, _, _) = readCommitted(spark, path)
      val mk = postingsMarker(path)
      val ops = Seq(("postings", "pb"), ("dfreq", "pb"), ("doclens", "db"))
        .flatMap { case (rel, pc) =>
          val raw = readRel(spark, path, rel, mk)
          if (!raw.columns.contains("gen")) None
          else {
            val bad = raw.filter(col("gen") > gc).select(col(pc)).distinct()
              .collect().map(_.getInt(0)).toSeq.sorted
            if (bad.isEmpty) None
            else Some(graft.tables.Commit.Replace(rel, pc, bad,
              raw.filter(col(pc).isin(bad: _*) && col("gen") <= gc)))
          }
        }
      if (ops.nonEmpty) graft.tables.Commit.commit(path, ops)
      // fwd rows carry no generation: an interrupted append's entries
      // are a harmless prune superset, GC'd at the next compaction
      java.nio.file.Files.delete(intentFile(path))
    }
  }

  /** The staged relations, with LSM generations already RESOLVED:
    * `postings` carries exactly the current rows as (tok, doc_id, tf,
    * rank, pb) — superseded-generation rows a maintenance pass left on
    * disk are dropped here, once, for every consumer; `dfreq` carries
    * one authoritative (tok, df, gen, pb) row per LIVE token; `doclens`
    * one (doc_id, dl, db) row per live doc (tombstones and superseded
    * rows dropped). (nDocs, totalDl, gen) are the committed globals,
    * read DRIVER-SIDE from the `_GEN` commit file — index metadata, so
    * consumers inline them as literals instead of cross-joining a 1-row
    * scan into every plan.
    */
  final case class PostingsStage(postings: DataFrame, dfreq: DataFrame,
                                 doclens: DataFrame, nDocs: Long,
                                 totalDl: Long, gen: Long)

  def readStage(spark: org.apache.spark.sql.SparkSession,
                path: String): PostingsStage = {
    require(postingsExist(path), s"$path is not a postings stage")
    if (java.nio.file.Files.exists(intentFile(path)))
      throw new IllegalStateException(
        s"$path has unfinished maintenance (_APPENDING intent present) — a " +
          "writer crashed mid-append/delete; heal with recoverPostings()")
    if (graft.tables.Commit.pending(path))
      throw new IllegalStateException(
        s"$path has an unfinished compaction commit (_COMMIT intent " +
          "present) — heal with recoverPostings()")
    val mk = postingsMarker(path)
    val (g, nDocs, totalDl) = readCommitted(spark, path)
    // pre-LSM stages (no gen columns) read back-compatibly as one
    // committed generation 0 — never an opaque missing-column error
    def withGen(df: DataFrame): DataFrame =
      if (df.columns.contains("gen")) df else df.withColumn("gen", lit(0L))
    val praw = withGen(readRel(spark, path, "postings", mk))
    val draw = withGen(readRel(spark, path, "dfreq", mk))
    val lraw0 = withGen(readRel(spark, path, "doclens", mk))
    val lraw = if (lraw0.columns.contains("tomb")) lraw0
      else lraw0.withColumn("tomb", lit(false))
    if (g == 0L) {
      // fresh or compacted stage — single-generation by construction, no
      // tombstones possible: skip the whole resolution plan (the common
      // serving case pays ZERO resolution overhead)
      PostingsStage(praw.drop("gen"),
        draw,
        lraw.select(col("doc_id"), col("dl"), col("db")),
        nDocs, totalDl, 0L)
    } else {
      // dfreq resolution: per token, the row of maximal generation is
      // authoritative; df = 0 marks a dead token. Grouping carries pb
      // (constant per token) so a consumer's pb filter pushes through.
      val dres = draw.groupBy(col("tok"), col("pb"))
        .agg(max(struct(col("gen"), col("df"))).as("m"))
        .select(col("tok"), col("m.df").as("df"), col("m.gen").as("gen"),
          col("pb"))
        .filter(col("df") > 0L)
      // postings resolution: a row is current iff its (tok, gen) matches
      // the authoritative dfreq row. The join keys are (tok, gen) ONLY —
      // deliberately NOT pb, although both sides carry it: with pb in
      // the keys, Catalyst plants a dynamic-partition-pruning subquery
      // on the dfreq side whose pruning input is a SECOND FULL SCAN of
      // the postings relation — the big side scanned twice to prune the
      // vocabulary-sized side (measured 4x on the conversation family at
      // 100x scale). Without pb, dfreq reads whole (vocabulary-sized,
      // broadcast into the semi join) and a consumer's term filter still
      // reaches it through the tok join key's constraint propagation;
      // the consumer's pb filter prunes the POSTINGS scan, which is the
      // side that matters.
      val resolved = praw
        .join(dres.select(col("tok"), col("gen")),
          Seq("tok", "gen"), "left_semi")
        .drop("gen")
      // doclens resolution: per doc, the maximal-generation row wins; a
      // tombstone there means the doc is deleted. db rides the grouping
      // key so bucket pruning pushes through.
      val lres = lraw.groupBy(col("doc_id"), col("db"))
        .agg(max(struct(col("gen"), col("tomb"), col("dl"))).as("m"))
        .filter(!col("m.tomb"))
        .select(col("doc_id"), col("m.dl").as("dl"), col("db"))
      PostingsStage(resolved, dres, lres, nDocs, totalDl, g)
    }
  }

  /** Back-compat accessor: (postings, doclens). */
  def readPostings(spark: org.apache.spark.sql.SparkSession,
                   path: String): (DataFrame, DataFrame) = {
    val st = readStage(spark, path)
    (st.postings, st.doclens)
  }

  /** [[bm25]] served from a staged postings index — row-identical to the
    * from-corpus path (RetrievalSpec asserts it), with tokenize, postings
    * build, df aggregation AND the globals pass all amortized into
    * [[stagePostings]]. The literal query terms partition-prune the
    * postings and dfreq scans to their crc32 buckets driver-side, then
    * the tok filter pushes into the pruned scan — a |terms|-bucket read,
    * never a corpus pass.
    */
  def bm25FromStage(spark: org.apache.spark.sql.SparkSession, path: String,
                    queryTerms: Seq[String]): DataFrame = {
    val st = readStage(spark, path)
    val pbs = queryTerms.map(pbOf).distinct
    val tf = st.postings
      .filter(col("pb").isin(pbs: _*) && col("tok").isin(queryTerms: _*))
      .select(col("doc_id"), col("tok"), col("tf"))
    val dfq = st.dfreq
      .filter(col("pb").isin(pbs: _*) && col("tok").isin(queryTerms: _*))
      .select(col("tok"), col("df"))
    bm25ScoreStaged(tf, st.doclens.select(col("doc_id"), col("dl")), dfq,
      st.nDocs, st.totalDl)
  }

  /** The staged-scoring tail: identical arithmetic to [[bm25Score]] with
    * dfreq read from the stage and the corpus globals inlined as
    * literals (see PostingsStage.nDocs). `keyCols` is (doc_id) for the
    * single-query path and (q_id, doc_id) for the batched one.
    */
  private def bm25ScoreStaged(tf: DataFrame, dl: DataFrame, dfreq: DataFrame,
                              nDocs: Long, total: Long,
                              keyCols: Seq[String] = Seq("doc_id")): DataFrame =
    tf.join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .withColumn("idf_fp",
        expr(s"(1000000L * (2L*${nDocs}L - 2L*df + 1L)) DIV (2L*df + 1L)"))
      .withColumn("tfpart_fp",
        expr(s"(1000000L * 44L * tf * ${total}L) DIV " +
          s"(20L * tf * ${total}L + 6L * ${total}L + 18L * dl * ${nDocs}L)"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_terms"),
        sum(col("idf_fp") * col("tfpart_fp")).as("score_fp"))

  /** BATCHED multi-query BM25 against the persisted postings stage — the
    * lexical serving twin of VectorStore.queryL2Batch /
    * GraphAnnIndex.queryBatch: ONE plan serves every query in `queries`
    * (q_id, terms ARRAY<STRING>) instead of N per-query stage scans (the
    * N+1 serving shape — the reference's own per-email fetch loop,
    * email_fetching.py:38-40, applied to query serving). The union of
    * the batch's terms is collected
    * driver-side (the queries relation is broadcast-sized by declaration
    * — it is broadcast into the postings join either way), so the
    * postings/dfreq scans statically prune to the union's crc32 buckets
    * AND push the tok isin filter, exactly as [[bm25FromStage]] does for
    * one query; the (q_id, tok) relation then broadcast-joins each
    * pruned posting row to the queries that want it, and the score/top-k
    * tail is per-(q_id, doc_id) with ONE window. Per-query rows are
    * identical to N separate [[bm25FromStage]] calls (RetrievalSpec
    * asserts it; q_bm25_batch hash-checks the per-query replay).
    *
    * BOUNDED-PLAN GUARD: the tok isin literal list is the batch's
    * VOCABULARY — at a 10k-query serving batch the plan would embed
    * tens of thousands of literals (planning-time/codegen blowup that
    * grows with batch size). Past `pruneLiteralLimit` distinct terms the
    * tok filtering moves INTO the joins (the postings side already
    * broadcast-inner-joins the (q_id, tok) relation; the dfreq side
    * gains a broadcast LEFT SEMI join on the distinct-term relation) and
    * only the ≤[[NumTokBuckets]] pb partition-pruning literals stay in
    * the plan — constant plan size at any batch size, identical rows
    * (the isin was pushdown, the joins were always the semantics).
    */
  def bm25BatchFromStage(spark: org.apache.spark.sql.SparkSession,
                         path: String, queries: DataFrame, k: Int,
                         pruneLiteralLimit: Int = 1024): DataFrame = {
    val st = readStage(spark, path)
    val qterms = queries
      .select(col("q_id"), explode(col("terms")).as("tok")).distinct()
      .localCheckpoint() // feeds the term-union collect AND the join
    val terms = qterms.select(col("tok")).distinct()
      .collect().map(_.getString(0)).toSeq
    val pbs = terms.map(pbOf).distinct
    val small = terms.size <= pruneLiteralLimit
    val tokGuard =
      if (small) col("tok").isin(terms: _*) else lit(true)
    val tf = st.postings
      .filter(col("pb").isin(pbs: _*) && tokGuard)
      .join(broadcast(qterms), "tok")
      .select(col("q_id"), col("doc_id"), col("tok"), col("tf"))
    val dfqPruned = st.dfreq.filter(col("pb").isin(pbs: _*))
    val dfq = (if (small) dfqPruned.filter(col("tok").isin(terms: _*))
      else dfqPruned.join(broadcast(qterms.select(col("tok")).distinct()),
        Seq("tok"), "left_semi"))
      .select(col("tok"), col("df"))
    val scored = bm25ScoreStaged(tf,
      st.doclens.select(col("doc_id"), col("dl")), dfq,
      st.nDocs, st.totalDl, keyCols = Seq("q_id", "doc_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
      .orderBy(col("score_fp").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id"), col("n_terms"),
        col("score_fp"))
  }

  /** Multi-vector LATE-INTERACTION retrieval (the ColBERT MaxSim shape):
    * instead of one vector per document, every document TOKEN WINDOW
    * (n-token shingle; the first `maxDocWindows` as a set — duplicates
    * cannot change a max) gets its own hash-embedding, the query is
    * likewise a bag of window vectors, and score(q, d) =
    * Σ_{query window} max_{doc window} dot — fine-grained sub-document
    * matching that single-vector retrieval averages away. Windows, not
    * single tokens: a one-token hash-embedding is a ±1 one-hot (dots
    * collapse to {−1,0,1} and unrelated tokens bucket-collide to exact
    * 1), while n-token windows spread mass over n buckets and grade
    * partial overlap. The one float→int step is floor(dot·1e6) per
    * (window, query-window) pair on a bit-identical left-associated
    * double chain, so max/sum are exact integer ops and the ranking
    * hash-replays.
    *
    * Scale shape: window embeddings are computed once per DISTINCT
    * window string (vocabulary-sized, not instance-sized), the query
    * side is a handful of rows broadcast, so the interaction relation is
    * |doc-window set| × |query windows| — linear in the corpus, never
    * n². The per-(doc, query-window) max and per-doc sum are two keyed
    * aggregations with map-side partial aggregation. At 100 TB the
    * doc-window relation is the thing to stage (cf. stagePostings), and
    * candidates would first be pruned per query window via the ANN
    * bucket layout; the exact MaxSim here is then the re-rank stage
    * over that candidate set.
    *
    * Output: (doc_id, n_qt, maxsim_fp) for every doc with ≥1 window.
    */
  def maxSim(docs: DataFrame, idCol: Column, textCol: Column,
             queryTerms: Seq[String], maxDocWindows: Int = 16,
             windowN: Int = 3, dim: Int = 64): DataFrame = {
    import docs.sparkSession.implicits._
    val dwin = docs.select(idCol.as("doc_id"),
        explode(slice(TextFunctions.shingles(textCol, windowN), 1,
          maxDocWindows)).as("win"))
      .distinct()
    val wemb = dwin.select(col("win")).distinct()
      .select(col("win"), TextFunctions.hashEmbed(col("win"), dim).as("wemb"))
    val qwins = queryTerms.sliding(windowN).map(_.mkString(" ")).toSeq.distinct
    val qemb = qwins.toDF("qt")
      .select(col("qt"), TextFunctions.hashEmbed(col("qt"), dim).as("qemb"))
    val dots = dwin.join(wemb, "win").crossJoin(broadcast(qemb))
      .select(col("doc_id"), col("qt"),
        floor(graft.functions.VectorFunctions.dot(col("wemb"), col("qemb"))
          * lit(1000000.0)).cast("long").as("dot_fp"))
    dots.groupBy(col("doc_id"), col("qt")).agg(max(col("dot_fp")).as("best_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_qt"), sum(col("best_fp")).as("maxsim_fp"))
  }

  /** INVERTED-INDEX-PRUNED MaxSim — the declared 100 TB shape of
    * [[maxSim]], using the candidate-generation late-interaction systems
    * actually deploy: a query window only scores the doc windows it
    * SHARES A TOKEN with (posting-list intersection — the join is an
    * equi-join on token, never a cross join), because a hash-embed dot
    * is driven by shared token buckets and windows with no shared token
    * contribute only collision noise. The per-(doc, query-window) max
    * then runs over candidates only; a query window with no candidate in
    * a doc contributes 0 (`n_qt` counts the windows that matched,
    * auditing the prune). Candidate volume is Σ_token df·qf — the same
    * posting-join shape as BM25/conversation retrieval, with the same
    * scale guards available (df-cap, impact-ordered truncation — cf.
    * Conversation.retrieveForTurns). Fully deterministic, so the pruned
    * ranking hash-checks exactly; closeness to the exact [[maxSim]]
    * ranking is measured in RetrievalSpec, not assumed. (An LSH-bucket
    * prune was measured at 0.4 top-10 overlap — sparse window embeddings
    * flip hyperplane signs too easily; the lexical prune is the one that
    * tracks the dot.)
    *
    * Output: (doc_id, n_qt, maxsim_fp) for docs with ≥1 candidate window.
    */
  def maxSimPruned(docs: DataFrame, idCol: Column, textCol: Column,
                   queryTerms: Seq[String], maxDocWindows: Int = 16,
                   windowN: Int = 3, dim: Int = 64): DataFrame = {
    import docs.sparkSession.implicits._
    val dwin = docs.select(idCol.as("doc_id"),
        explode(slice(TextFunctions.shingles(textCol, windowN), 1,
          maxDocWindows)).as("win"))
      .distinct()
    val wembs = dwin.select(col("win")).distinct()
      .select(col("win"), TextFunctions.hashEmbed(col("win"), dim).as("wemb"))
    val wtok = wembs.select(col("win"), explode(split(col("win"), " ")).as("tok"))
      .distinct()
    val qwins = queryTerms.sliding(windowN).map(_.mkString(" ")).toSeq.distinct
    val qtok = qwins.flatMap(qw => qw.split(" ").distinct.map(t => (qw, t)))
      .toDF("qt", "tok")
    val qemb = qwins.toDF("qt")
      .select(col("qt"), TextFunctions.hashEmbed(col("qt"), dim).as("qemb"))
    // candidate (window, query-window) pairs = share ≥1 token
    val cpairs = wtok.join(broadcast(qtok), "tok")
      .select(col("win"), col("qt")).distinct()
    val cand = dwin.join(cpairs, "win")
      .join(wembs, "win")
      .join(broadcast(qemb), "qt")
      .select(col("doc_id"), col("qt"),
        floor(graft.functions.VectorFunctions.dot(col("wemb"), col("qemb"))
          * lit(1000000.0)).cast("long").as("dot_fp"))
    cand.groupBy(col("doc_id"), col("qt")).agg(max(col("dot_fp")).as("best_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_qt"), sum(col("best_fp")).as("maxsim_fp"))
  }

  // ---- persisted doc-window stage (the MaxSim index) ----
  //
  // maxSim/maxSimPruned's own scale note declares the doc-window
  // relation the thing to stage at 100 TB: the (doc_id, win) relation,
  // the distinct-window embedding vocabulary and the window→token
  // posting relation are all corpus-derived and query-independent, yet
  // both MaxSim paths recomputed them per query. stageWindows lands all
  // three ONCE (the stagePostings discipline); maxSimPrunedFromStage
  // serves every query from the stage. EVERY relation is hash-bucket-
  // partitioned so maintenance touches only affected partitions (the
  // postings-stage discipline): wtok/ by token hash (crc32 % 64, same
  // key as the postings stage — a literal query's candidate generation
  // partition-prunes to its own tokens' buckets), dwin/ by doc-id hash
  // (so deleteWindows rewrites only the victims' partitions), wemb/ by
  // window hash (so compaction rewrites per-partition).

  private def windowsMarker(path: String) =
    java.nio.file.Paths.get(path, "_WINDOWS_DONE")

  def windowsExist(path: String): Boolean =
    java.nio.file.Files.exists(windowsMarker(path))

  private def readWin(spark: org.apache.spark.sql.SparkSession, path: String,
                      rel: String): DataFrame =
    readRel(spark, path, rel, windowsMarker(path))

  /** The postings stage's committed generation — ONE marker-file read,
    * no job. 0 = fresh or just-compacted. The cheap signal ingest loops
    * GATE the stale-row policy on: [[staleFraction]] itself runs a
    * resolution-sized count, so probing it on every micro-batch charges
    * that count per batch — probing only past a few committed
    * generations keeps the policy's amortized-constant cost while still
    * bounding read amplification (resolution overhead between probes is
    * at most the gate width's generations).
    */
  def committedGen(spark: org.apache.spark.sql.SparkSession,
                   path: String): Long =
    readCommitted(spark, path)._1

  /** The window stage's committed generation — the [[committedGen]]
    * twin (one marker-file read), same gating role for window ingest.
    */
  def committedWinGen(path: String): Long = readWinGen(path)

  /** The window stage's committed generation (the `_GEN` atomic-rename
    * commit point, cf. the postings stage — the window stage carries no
    * globals, so the file holds just G). 0 = fresh/compacted or legacy.
    */
  private def readWinGen(path: String): Long =
    if (java.nio.file.Files.exists(genFile(path)))
      java.nio.file.Files.readString(genFile(path)).trim.toLong
    else 0L

  private def writeWinGen(path: String, g: Long): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Paths.get(path, "_GEN_TMP")
    Files.writeString(tmp, g.toString)
    graft.tables.Staging.atomicPublish(tmp, genFile(path))
  }

  private def requireWinGenCommitted(path: String, op: String): Unit =
    require(java.nio.file.Files.exists(genFile(path)),
      s"doc-window stage at $path predates the generation-committed " +
        s"layout — rebuild with stageWindows() (or run compactWindows(), " +
        s"the in-place migration) before $op")

  /** The RESOLVED (doc_id, win, db) relation: rows above the committed
    * generation (an interrupted maintenance pass) and rows killed by a
    * doc-level tombstone of a later-or-equal generation (a committed
    * delete) are dropped. A fresh/compacted stage (G = 0) is
    * single-generation with no tombstones by construction and skips the
    * resolution plan entirely; a maintained stage with no surviving
    * tombs relation skips the anti-join half. The tombs join carries
    * (doc_id, db) so a consumer's db bucket filter pushes to BOTH scans.
    */
  private[graft] def resolvedDwin(spark: org.apache.spark.sql.SparkSession,
                                  path: String): DataFrame = {
    val raw0 = readWin(spark, path, "dwin")
    val raw = if (raw0.columns.contains("gen")) raw0
      else raw0.withColumn("gen", lit(0L)) // pre-LSM stage, back-compat
    if (readWinGen(path) == 0L)
      raw.select(col("doc_id"), col("win"), col("db"))
    else {
      val base =
        if (!hasParquet(s"$path/tombs")) raw
        else {
          val tmax = spark.read.parquet(s"$path/tombs")
            .groupBy(col("doc_id"), col("db")).agg(max(col("gen")).as("tg"))
          raw.join(tmax, Seq("doc_id", "db"), "left_outer")
            .filter(col("tg").isNull || col("gen") > col("tg"))
        }
      base.select(col("doc_id"), col("win"), col("db"))
    }
  }

  /** True iff any parquet file exists under `dir` — the existence test
    * for schema-inferred side relations (a dir whose every partition was
    * ERASED still exists but would crash inference).
    */
  private def hasParquet(dir: String): Boolean = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) false
    else {
      val walk = java.nio.file.Files.walk(p)
      try walk.anyMatch(f => f.toString.endsWith(".parquet"))
      finally walk.close()
    }
  }

  /** Refuse a call whose shape parameters differ from what the stage was
    * BUILT with (recorded in the done marker): appending windows derived
    * with a different windowN/dim/maxDocWindows than the build silently
    * mixes incompatible rows — wrong candidates, mismatched embedding
    * lengths — with no error anywhere downstream. Legacy stages without
    * recorded parameters skip the check (the caller-consistency contract
    * they were built under).
    */
  private def requireWindowKnobs(path: String, windowN: Int, dim: Int,
                                 maxDocWindows: Option[Int] = None): Unit = {
    val p = markerProps(windowsMarker(path))
    def chk(key: String, got: Int): Unit = p.get(key).foreach(v =>
      require(v.toInt == got,
        s"doc-window stage at $path was built with $key=$v but called " +
          s"with $key=$got — mixed parameters corrupt the stage"))
    chk("windowN", windowN)
    chk("dim", dim)
    maxDocWindows.foreach(chk("maxDocWindows", _))
  }

  private def refuseTornWindows(path: String): Unit = {
    require(windowsExist(path), s"$path is not a doc-window stage")
    if (java.nio.file.Files.exists(intentFile(path)))
      throw new IllegalStateException(
        s"$path has unfinished maintenance (_APPENDING intent present) — a " +
          "writer crashed mid-append/delete; heal with recoverWindows()")
    if (graft.tables.Commit.pending(path))
      throw new IllegalStateException(
        s"$path has an unfinished compaction commit (_COMMIT intent " +
          "present) — heal with recoverWindows()")
  }

  /** Build the doc-window stage: `path`/dwin (doc_id, win, db) by doc
    * hash, `path`/wemb (win, wemb, wb — one embedding per DISTINCT
    * window string) by window hash, `path`/wtok (win, tok, pb) by token
    * hash. Done-marker written last.
    */
  def stageWindows(docs: DataFrame, idCol: Column, textCol: Column,
                   path: String, maxDocWindows: Int = 16, windowN: Int = 3,
                   dim: Int = 64): Unit = {
    deleteStage(path) // a rebuild clears stale markers (_APPENDING from a
    // crashed maintenance pass must not outlive the state it described)
    val dwin = docs.select(idCol.as("doc_id"),
        explode(slice(TextFunctions.shingles(textCol, windowN), 1,
          maxDocWindows)).as("win"))
      .distinct()
      .localCheckpoint() // feeds dwin AND the vocabulary derivations
    val dwinW = dwin.withColumn("gen", lit(0L)) // LSM generation
      .withColumn("db", dbCol(col("doc_id")))
    val wembs = dwin.select(col("win")).distinct()
      .select(col("win"), TextFunctions.hashEmbed(col("win"), dim).as("wemb"))
      .localCheckpoint() // feeds wemb AND wtok
    val wembW = wembs.withColumn("wb", pbCol(col("win")))
    val wtokW = wembs.select(col("win"), explode(split(col("win"), " ")).as("tok"))
      .distinct()
      .withColumn("pb", pbCol(col("tok")))
    // three independent relation writes (checkpointed inputs, distinct
    // dirs, nothing visible before the done marker lands last) — run
    // concurrently, cf. stagePostings
    concurrently(
      () => dwinW
        .repartition(col("db")) // small-files guard, cf. stagePostings
        .write.mode("overwrite").partitionBy("db").parquet(s"$path/dwin"),
      () => wembW
        .repartition(col("wb"))
        .write.mode("overwrite").partitionBy("wb").parquet(s"$path/wemb"),
      () => wtokW
        .repartition(col("pb"))
        .write.mode("overwrite").partitionBy("pb").parquet(s"$path/wtok"))
    writeWinGen(path, 0L)
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Paths.get(path, "_WINDOWS_DONE_TMP")
    // the done marker records the build parameters (so maintenance and
    // query calls with DIFFERENT knobs are refused — requireWindowKnobs)
    // and each relation's written schema (so an emptied relation stays
    // readable — readRel)
    Files.writeString(tmp, Seq(
      "windowN" -> windowN.toString,
      "dim" -> dim.toString,
      "maxDocWindows" -> maxDocWindows.toString,
      "schema.dwin" -> dwinW.schema.json,
      "schema.wemb" -> wembW.schema.json,
      "schema.wtok" -> wtokW.schema.json)
      .map { case (k, v) => s"$k=$v" }.mkString("\n"))
    graft.tables.Staging.atomicPublish(tmp, windowsMarker(path))
  }

  /** Incremental doc-window maintenance: admit new documents into an
    * existing [[stageWindows]] stage (ids already present are dropped).
    * The window stage is PURELY ADDITIVE under document insertion —
    * unlike the postings stage there are no ranks to repair: a new doc
    * adds (doc_id, win) rows, any UNSEEN window strings add one
    * embedding row and their token-posting rows, and nothing that
    * exists changes (embeddings are a pure function of the window
    * string). Append-then-query ≡ rebuild-then-query by construction;
    * q_windows_append hash-checks it against the full-corpus replay.
    * The admission anti-join prunes the staged dwin to the batch ids'
    * hash buckets (see the body comment) — per-batch admission cost is
    * ∝ the batch's locality, not the corpus.
    * Same `_APPENDING` intent-marker crash discipline as the postings
    * stage: [[maxSimPrunedFromStage]] refuses a torn stage. (A document
    * with NO window — text shorter than one shingle — leaves no trace
    * in the stage and is re-examined by later appends; harmless, it
    * contributes no rows either time.)
    */
  def appendWindows(docs: DataFrame, idCol: Column, textCol: Column,
                    path: String, maxDocWindows: Int = 16, windowN: Int = 3,
                    dim: Int = 64): Unit =
    graft.tables.WriterLock.withLock(path)(
      appendWindowsImpl(docs, idCol, textCol, path, maxDocWindows, windowN,
        dim))

  private def appendWindowsImpl(docs: DataFrame, idCol: Column,
                                textCol: Column, path: String,
                                maxDocWindows: Int, windowN: Int,
                                dim: Int): Unit = {
    refuseTornWindows(path)
    requireWindowKnobs(path, windowN, dim, Some(maxDocWindows))
    requireWinGenCommitted(path, "appendWindows")
    val spark = docs.sparkSession
    val oldDwin = resolvedDwin(spark, path)
    val batch = docs.select(idCol.as("doc_id"),
        explode(slice(TextFunctions.shingles(textCol, windowN), 1,
          maxDocWindows)).as("win"))
      .distinct()
      .withColumn("db", dbCol(col("doc_id")))
      .localCheckpoint() // feeds the bucket collect AND the admission join
    // metadata-sized collect: db lives in [0, NumTokBuckets) — the
    // admission anti-join prunes the staged dwin to the BATCH ids' hash
    // buckets (its partition key; a staged twin of an id always shares
    // the id's bucket), so the per-batch admission scan is ∝ the
    // batch's buckets, never the corpus
    val batchDbs = batch.select(col("db")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val fresh = batch
      .join(oldDwin.filter(col("db").isin(batchDbs: _*))
          .select(col("doc_id")).distinct(), Seq("doc_id"),
        "left_anti")
      .localCheckpoint() // feeds dwin append AND the new-window derivation
    if (fresh.isEmpty) return
    java.nio.file.Files.createFile(intentFile(path))
    val g = readWinGen(path) + 1
    // the three writes are independent and ALL invisible until the
    // atomic _GEN rename: vocabulary rows without a live dwin row are
    // invisible orphans (candidates are driven by dwin), and the dwin
    // rows sit at the uncommitted generation g — so they run
    // CONCURRENTLY (cf. appendImpl: at micro-batch sizes each job is
    // mostly fixed scheduling cost; a crash anywhere leaves the stage
    // readable at its pre-append state, recoverWindows GCs gen g).
    // The newWins derivation (an anti-join against the live wemb
    // vocabulary, checkpointed because wemb is about to be appended to)
    // needs only `fresh`, so it ALSO rides the concurrent block —
    // serialized before the dwin write it charged the drain a whole
    // extra sequential job per micro-batch.
    val newWinsDone = {
      import scala.concurrent.{ExecutionContext, Future}
      implicit val ec: ExecutionContext = ExecutionContext.global
      Future(fresh.select(col("win")).distinct()
        .join(readWin(spark, path, "wemb").select(col("win")),
          Seq("win"), "left_anti")
        .select(col("win"),
          TextFunctions.hashEmbed(col("win"), dim).as("wemb"))
        .localCheckpoint()) // feeds wemb append AND wtok append
    }
    def newWins = {
      import scala.concurrent.{Await, duration}
      Await.result(newWinsDone, duration.Duration.Inf)
    }
    val writeWemb = () => if (!newWins.isEmpty) {
      newWins.withColumn("wb", pbCol(col("win")))
        .repartition(col("wb"))
        .write.mode("append").partitionBy("wb").parquet(s"$path/wemb")
    }
    val writeWtok = () => if (!newWins.isEmpty) {
      newWins.select(col("win"), explode(split(col("win"), " ")).as("tok"))
        .distinct()
        .withColumn("pb", pbCol(col("tok")))
        .repartition(col("pb"))
        .write.mode("append").partitionBy("pb").parquet(s"$path/wtok")
    }
    val writeDwin = () => {
      fresh.select(col("doc_id"), col("win"), lit(g).as("gen"), col("db"))
        .repartition(col("db"))
        .write.mode("append").partitionBy("db").parquet(s"$path/dwin")
    }
    concurrently(writeWemb, writeWtok, writeDwin)
    writeWinGen(path, g)
    java.nio.file.Files.delete(intentFile(path))
  }

  /** Incremental doc-window DELETION — the corpus-refresh path the
    * postings stage already has ([[deletePostings]]): one doc-level
    * TOMBSTONE row per victim lands in `tombs/` and the pass commits
    * with the atomic `_GEN` rename — nothing is rewritten anywhere, so
    * delete cost is ∝ the deletion set and a crash before the commit
    * changes nothing ([[recoverWindows]] heals). Window-vocabulary rows
    * (wemb/wtok) whose last referencing doc died are RETAINED as
    * orphans: a window with no live dwin row can never produce a
    * candidate (cand = dwin ⋈ cpairs), so queries are exactly
    * rebuild-on-remaining — q_windows_delete hash-checks it — and the
    * orphans (plus the applied tombstones and dead dwin rows) are
    * garbage-collected by the next [[compactWindows]] pass.
    */
  def deleteWindows(ids: DataFrame, path: String,
                    idName: String = "doc_id"): Unit =
    graft.tables.WriterLock.withLock(path)(
      deleteWindowsImpl(ids, path, idName))

  private def deleteWindowsImpl(ids: DataFrame, path: String,
                                idName: String): Unit = {
    refuseTornWindows(path)
    requireWinGenCommitted(path, "deleteWindows")
    val spark = ids.sparkSession
    val idsB = ids.select(col(idName).as("doc_id"))
      .withColumn("db", dbCol(col("doc_id")))
      .localCheckpoint() // feeds the bucket collect AND the victim lookup
    // metadata-sized collect: db lives in [0, NumTokBuckets) — the
    // victim lookup prunes dwin to the DELETION SET's buckets
    val idsDbs = idsB.select(col("db")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val victims = resolvedDwin(spark, path)
      .filter(col("db").isin(idsDbs: _*))
      .join(idsB.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("db")).distinct()
      .localCheckpoint()
    if (victims.isEmpty) return
    java.nio.file.Files.createFile(intentFile(path))
    val g = readWinGen(path) + 1
    // one doc-level TOMBSTONE row per victim — nothing is rewritten; the
    // victims' dwin rows (gen < g) die at the atomic _GEN commit, their
    // vocabulary rows become invisible orphans GC'd by compactWindows
    victims.select(col("doc_id"), lit(g).as("gen"), col("db"))
      .repartition(col("db"))
      .write.mode("append").partitionBy("db").parquet(s"$path/tombs")
    writeWinGen(path, g)
    java.nio.file.Files.delete(intentFile(path))
  }

  /** Re-index UPSERT for the doc-window stage — replace changed
    * documents (and insert unseen ids): delete-then-append composition,
    * cf. [[upsertPostings]]. A crash between the halves leaves the
    * consistent deleted state; re-running heals. Vocabulary orphans the
    * delete half leaves behind are GC'd by the next [[compactWindows]],
    * exactly as for a plain delete. q_windows_upsert hash-checks
    * upsert-then-query against a replay over the modified corpus. The
    * shape knobs must match the build (the append half validates them
    * against the stage's recorded parameters — a default-knob upsert
    * into a non-default stage is refused, not silently mixed in).
    */
  def upsertWindows(docs: DataFrame, idCol: Column, textCol: Column,
                    path: String, maxDocWindows: Int = 16, windowN: Int = 3,
                    dim: Int = 64): Unit =
    graft.tables.WriterLock.withLock(path) {
      deleteWindowsImpl(docs.select(idCol.as("doc_id")), path, "doc_id")
      appendWindowsImpl(docs, idCol, textCol, path, maxDocWindows, windowN,
        dim)
    }

  /** Compact the doc-window stage in place: every relation rewrites each
    * hash-bucket partition into one file (streaming/incremental appends
    * accumulate small files), and the vocabulary relations drop windows
    * no document references any more — the garbage [[deleteWindows]]
    * leaves behind by design. After compaction the stage is relation-
    * for-relation identical to a fresh [[stageWindows]] on the surviving
    * corpus (RetrievalSpec asserts it); queries are invariant. Cost is
    * one rewrite + one live-window semi-join — the declared price of a
    * maintenance pass, cf. [[compactPostings]].
    */
  def compactWindows(spark: org.apache.spark.sql.SparkSession,
                     path: String, gcOrphans: Boolean = true): Unit =
    graft.tables.WriterLock.withLock(path) {
      refuseTornWindows(path)
      java.nio.file.Files.createFile(intentFile(path))
      val allB = (0 until NumTokBuckets).toSeq
      val dwin = resolvedDwin(spark, path) // tombstoned + superseded gone
      val d0 = dwin.select(col("doc_id"), col("win"), lit(0L).as("gen"),
        col("db"))
      val live = dwin.select(col("win")).distinct()
      // gcOrphans = false skips the live-window semi-joins: correct ONLY
      // when no deleteWindows ran since the last GC (appends never orphan
      // a window — they only add references), which is exactly the
      // append-only streaming-ingest drain's situation; the file-
      // flattening half still runs in full
      val vocabOps = Seq("wemb" -> "wb", "wtok" -> "pb").map { case (rel, pc) =>
        val rd = readWin(spark, path, rel)
        val kept = if (gcOrphans) rd.join(live, Seq("win"), "left_semi") else rd
        graft.tables.Commit.Replace(rel, pc, allB, kept)
      }
      // applied tombstones are erased IN the same commit as the dwin
      // rewrite — erasing them later would let gen-0 rows die against a
      // surviving tombstone if the writer crashed between the two
      val tombsOp =
        if (!hasParquet(s"$path/tombs")) Nil
        else Seq(graft.tables.Commit.Replace("tombs", "db", allB,
          spark.read.parquet(s"$path/tombs").filter(lit(false))))
      graft.tables.Commit.commit(path,
        graft.tables.Commit.Replace("dwin", "db", allB, d0) +:
          (vocabOps ++ tombsOp))
      // the emptied tombs dir goes whole (resolution treats a fileless
      // dir as absent either way — hasParquet)
      graft.tables.Staging.deleteRec(s"$path/tombs")
      writeWinGen(path, 0L)
      // refresh the marker schemas — a legacy stage gains gen here (the
      // in-place migration); the recorded shape knobs are preserved
      val props = markerProps(windowsMarker(path))
      writeWindowsMarker(path,
        props.view.filterKeys(!_.startsWith("schema.")).toSeq ++ Seq(
          "schema.dwin" -> d0.schema.json,
          "schema.wemb" -> readWin(spark, path, "wemb").schema.json,
          "schema.wtok" -> readWin(spark, path, "wtok").schema.json))
      java.nio.file.Files.delete(intentFile(path))
    }

  /** The window stage's STALE-ROW FRACTION — the share of on-disk dwin
    * rows a committed delete's tombstones have killed (invisible to
    * queries, but read-and-dropped by every [[resolvedDwin]] pass, and
    * each one anchors orphaned wemb/wtok vocabulary rows until
    * compaction GCs them). Appends never supersede a window row (the
    * stage is purely additive under insertion), so a fresh or
    * append-only stage reads 0.0 without counting anything.
    */
  def windowsStaleFraction(spark: org.apache.spark.sql.SparkSession,
                           path: String): Double = {
    refuseTornWindows(path)
    if (readWinGen(path) == 0L || !hasParquet(s"$path/tombs")) 0.0
    else {
      val raw = readWin(spark, path, "dwin").count()
      if (raw == 0L) 0.0
      else (raw - resolvedDwin(spark, path).count()).toDouble / raw
    }
  }

  /** AUTO-COMPACTION POLICY for the window stage — the
    * [[compactIfStale]] twin: compact when the tombstoned fraction
    * reaches `threshold`, bounding both the resolution read
    * amplification and the orphaned-vocabulary footprint by policy
    * instead of operator memory. Returns whether a compaction ran.
    */
  def compactWindowsIfStale(spark: org.apache.spark.sql.SparkSession,
                            path: String, threshold: Double = 0.3): Boolean = {
    val f = windowsStaleFraction(spark, path)
    if (f >= threshold && f > 0.0) { compactWindows(spark, path); true }
    else false
  }

  /** The window stage's FILE fragmentation — worst relation's mean
    * parquet files per live partition (the [[postingsFragmentation]]
    * twin): an append-only windows drain tombstones nothing (stale
    * fraction pinned at 0.0) yet accrues one file per touched partition
    * per batch across all three relations. Driver-side readdir only;
    * refuses a torn stage.
    */
  def windowsFragmentation(path: String): Double = {
    refuseTornWindows(path)
    Seq("dwin", "wemb", "wtok").map(r =>
      graft.tables.Staging.filesPerPartition(Seq(s"$path/$r"))).max
  }

  /** FILE-fragmentation auto-compaction policy for the window stage —
    * the [[compactPostingsIfFragmented]] twin, same 4.0 default and the
    * same amortized-constant cost argument. The orphan-vocabulary GC
    * half of the rewrite runs only when a delete actually happened since
    * the last compact (live tombstones are exactly that signal);
    * a purely additive stream gets the cheap flatten-only pass, which is
    * the correctness-sufficient one for it (appends never orphan a
    * window — they only add references).
    */
  def compactWindowsIfFragmented(spark: org.apache.spark.sql.SparkSession,
                                 path: String,
                                 maxFilesPerPartition: Double = 4.0)
      : Boolean = {
    val f = windowsFragmentation(path)
    if (f > maxFilesPerPartition) {
      compactWindows(spark, path, gcOrphans = hasParquet(s"$path/tombs"))
      true
    } else false
  }

  private def writeWindowsMarker(path: String,
                                 props: Seq[(String, String)]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Paths.get(path, "_WINDOWS_DONE_TMP")
    Files.writeString(tmp,
      props.map { case (k, v) => s"$k=$v" }.mkString("\n"))
    graft.tables.Staging.atomicPublish(tmp, windowsMarker(path))
  }

  /** Heal the doc-window stage after a crashed writer — the window twin
    * of [[recoverPostings]]: stale lock cleared (pid-checked), a logged
    * compaction commit rolled forward, an interrupted append/delete
    * rolled back by GC'ing its orphaned generation (dwin rows and
    * tombstones above the committed G — invisible, but a collision
    * hazard for the next writer's g = G+1); orphan wemb/wtok rows an
    * interrupted append left are harmless (no dwin row ⇒ no candidate)
    * and GC'd at the next compaction.
    */
  def recoverWindows(spark: org.apache.spark.sql.SparkSession,
                     path: String): Unit = {
    graft.tables.WriterLock.clearStale(path)
    graft.tables.Commit.recover(path)
    if (java.nio.file.Files.exists(intentFile(path))) {
      val g = readWinGen(path)
      val dwin = readWin(spark, path, "dwin")
      val ops = scala.collection.mutable.ArrayBuffer.empty[graft.tables.Commit.Op]
      if (dwin.columns.contains("gen")) {
        val bad = dwin.filter(col("gen") > g).select(col("db")).distinct()
          .collect().map(_.getInt(0)).toSeq.sorted
        if (bad.nonEmpty)
          ops += graft.tables.Commit.Replace("dwin", "db", bad,
            dwin.filter(col("db").isin(bad: _*) && col("gen") <= g))
      }
      if (hasParquet(s"$path/tombs")) {
        val tombs = spark.read.parquet(s"$path/tombs")
        val bad = tombs.filter(col("gen") > g).select(col("db")).distinct()
          .collect().map(_.getInt(0)).toSeq.sorted
        if (bad.nonEmpty)
          ops += graft.tables.Commit.Replace("tombs", "db", bad,
            tombs.filter(col("db").isin(bad: _*) && col("gen") <= g))
      }
      if (ops.nonEmpty) graft.tables.Commit.commit(path, ops.toSeq)
      java.nio.file.Files.delete(intentFile(path))
    }
  }

  /** [[maxSimPruned]] served from a staged doc-window index —
    * row-identical to the from-corpus path (same oracle), with the
    * window explode, the vocabulary embedding AND the window→token
    * posting build all amortized into [[stageWindows]]. The query's
    * literal tokens partition-prune the wtok scan to their crc32
    * buckets; everything after is the same candidate equi-join and
    * exact integer max/sum tail.
    */
  def maxSimPrunedFromStage(spark: org.apache.spark.sql.SparkSession,
                            path: String, queryTerms: Seq[String],
                            windowN: Int = 3, dim: Int = 64): DataFrame = {
    import spark.implicits._
    refuseTornWindows(path)
    requireWindowKnobs(path, windowN, dim)
    val dwin = resolvedDwin(spark, path)
    val wembs = readWin(spark, path, "wemb")
    val qwins = queryTerms.sliding(windowN).map(_.mkString(" ")).toSeq.distinct
    val qtoks = qwins.flatMap(_.split(" ")).distinct
    val pbs = qtoks.map(pbOf).distinct
    val wtok = readWin(spark, path, "wtok")
      .filter(col("pb").isin(pbs: _*) && col("tok").isin(qtoks: _*))
    val qtok = qwins.flatMap(qw => qw.split(" ").distinct.map(t => (qw, t)))
      .toDF("qt", "tok")
    val qemb = qwins.toDF("qt")
      .select(col("qt"), TextFunctions.hashEmbed(col("qt"), dim).as("qemb"))
    val cpairs = wtok.join(broadcast(qtok), "tok")
      .select(col("win"), col("qt")).distinct()
    val cand = dwin.join(cpairs, "win")
      .join(wembs, "win")
      .join(broadcast(qemb), "qt")
      .select(col("doc_id"), col("qt"),
        floor(graft.functions.VectorFunctions.dot(col("wemb"), col("qemb"))
          * lit(1000000.0)).cast("long").as("dot_fp"))
    cand.groupBy(col("doc_id"), col("qt")).agg(max(col("dot_fp")).as("best_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_qt"), sum(col("best_fp")).as("maxsim_fp"))
  }

  /** BATCHED multi-query pruned MaxSim against the staged doc-window
    * index — the late-interaction member of the batched-serving family
    * (bm25BatchFromStage / VectorStore.queryL2Batch /
    * GraphAnnIndex.queryBatch): ONE plan serves every query in `queries`
    * (q_id, terms ARRAY<STRING>). The batch is collected driver-side
    * (broadcast-sized by declaration — its derived relations are
    * broadcast into the candidate join either way) and its query windows
    * DEDUPLICATED across queries: the per-(doc, window) best-dot relation
    * is computed ONCE per distinct window string and only the final
    * per-query sum fans out through the broadcast (q_id, qt) relation —
    * shared windows across the batch cost one interaction pass, not N.
    * The wtok scan statically prunes to the union of the batch's token
    * buckets, exactly as the single-query path does. Per-query rows are
    * identical to N separate [[maxSimPrunedFromStage]] calls
    * (RetrievalSpec asserts it; q_maxsim_batch hash-checks the per-query
    * replay).
    *
    * BOUNDED-PLAN GUARD (cf. [[bm25BatchFromStage]]): past
    * `pruneLiteralLimit` distinct batch tokens the tok isin literal
    * list is dropped — the wtok rows were always inner-broadcast-joined
    * to the (qt, tok) relation, which carries the same filter — and
    * only the ≤[[NumTokBuckets]] pb partition-pruning literals stay in
    * the plan: constant plan size at any batch size, identical rows.
    */
  def maxSimBatchFromStage(spark: org.apache.spark.sql.SparkSession,
                           path: String, queries: DataFrame, k: Int,
                           windowN: Int = 3, dim: Int = 64,
                           pruneLiteralLimit: Int = 1024): DataFrame = {
    import spark.implicits._
    refuseTornWindows(path)
    requireWindowKnobs(path, windowN, dim)
    // widening numeric read: bm25BatchFromStage accepts any integral
    // q_id, so this path must too (getLong alone throws on an Int q_id)
    val qrows = queries.select(col("q_id"), col("terms")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getSeq[String](1)))
    val qwinPairs = qrows.flatMap { case (qid, terms) =>
      terms.sliding(windowN).map(_.mkString(" ")).toSeq.distinct
        .map(w => (qid, w))
    }.toSeq
    val qwin = qwinPairs.toDF("q_id", "qt")
    val wins = qwinPairs.map(_._2).distinct
    val qtok = wins.flatMap(qw => qw.split(" ").distinct.map(t => (qw, t)))
      .toDF("qt", "tok")
    val qemb = wins.toDF("qt")
      .select(col("qt"), TextFunctions.hashEmbed(col("qt"), dim).as("qemb"))
    val qtoks = wins.flatMap(_.split(" ")).distinct
    val pbs = qtoks.map(pbOf).distinct
    val dwin = resolvedDwin(spark, path)
    val wembs = readWin(spark, path, "wemb")
    val tokGuard =
      if (qtoks.size <= pruneLiteralLimit) col("tok").isin(qtoks: _*)
      else lit(true)
    val wtok = readWin(spark, path, "wtok")
      .filter(col("pb").isin(pbs: _*) && tokGuard)
    val cpairs = wtok.join(broadcast(qtok), "tok")
      .select(col("win"), col("qt")).distinct()
    val best = dwin.join(cpairs, "win")
      .join(wembs, "win")
      .join(broadcast(qemb), "qt")
      .select(col("doc_id"), col("qt"),
        floor(graft.functions.VectorFunctions.dot(col("wemb"), col("qemb"))
          * lit(1000000.0)).cast("long").as("dot_fp"))
      .groupBy(col("doc_id"), col("qt")).agg(max(col("dot_fp")).as("best_fp"))
    val scored = best.join(broadcast(qwin), "qt")
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_qt"), sum(col("best_fp")).as("maxsim_fp"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
      .orderBy(col("maxsim_fp").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id"), col("n_qt"),
        col("maxsim_fp"))
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

  /** BATCHED hybrid fusion — the q_id-keyed twin of [[rrfFuse]], closing
    * the last per-query-only serving path: both halves already serve
    * batched ([[bm25BatchFromStage]] lexically, VectorStore.queryL2Batch
    * vectorially — the batched E3 of the reference's `rag.py:77-90`),
    * and this composes them with ONE (q_id, doc_id)-keyed full-outer
    * join + the same exact integer fusion arithmetic. Per-query rows
    * are identical to N separate [[rrfFuse]] calls (RetrievalSpec
    * asserts it; q_rrf_batch hash-checks the per-query replay). Inputs
    * carry (q_id, doc_id, rank); at scale both are top-k-per-query
    * relations — |queries|·k rows, broadcast-sized, never a corpus join.
    */
  def rrfFuseBatch(lex: DataFrame, vec: DataFrame, k: Int = 60): DataFrame = {
    val l = lex.select(col("q_id"), col("doc_id"), col("rank").as("lex_rank"))
    val v = vec.select(col("q_id"), col("doc_id"), col("rank").as("vec_rank"))
    l.join(v, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf_fp",
        coalesce(expr(s"1000000000L DIV (${k}L + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000000L DIV (${k}L + vec_rank)"), lit(0L)))
  }
}
