package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: higher tf wins at equal length, shorter doc wins at equal tf") {
    val docs = Seq(
      (1L, "spark spark spark pad pad pad pad pad"),   // tf=3, dl=8
      (2L, "spark spark filler pad pad pad pad pad"),  // tf=2, dl=8
      (3L, "spark spark filler"),                      // tf=2, dl=3
      (4L, "nothing relevant here at all pad pad pad") // tf=0 — absent
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("spark"))
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(!r.contains(4L), "doc without any query term must be absent")
    assert(r(1L) > r(2L), "more occurrences at same length must score higher")
    assert(r(3L) > r(2L), "same tf in a shorter doc must score higher")
  }

  test("bm25: multi-term scores sum exactly over matched terms") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha delta epsilon"),
      (3L, "zeta eta theta")
    ).toDF("doc_id", "text")
    val both = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("alpha", "beta"))
    val a = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("alpha"))
    val b = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("beta"))
    def score(df: org.apache.spark.sql.DataFrame, id: Long): Long =
      df.filter(col("doc_id") === id).select(col("score_fp"))
        .collect().headOption.map(_.getLong(0)).getOrElse(0L)
    // doc 1 matches both terms: its fused score is the exact sum of the
    // single-term scores (integer arithmetic — no float association)
    assert(score(both, 1L) === score(a, 1L) + score(b, 1L))
    assert(both.filter(col("doc_id") === 1).select(col("n_terms"))
      .head().getLong(0) === 2L)
  }

  test("rrfFuse: doc ranked by both lists beats single-list docs; exact values") {
    val lex = Seq((10L, 1L), (20L, 2L)).toDF("doc_id", "rank")
    val vec = Seq((10L, 2L), (30L, 1L)).toDF("doc_id", "rank")
    val r = Retrieval.rrfFuse(lex, vec).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(10L) === 1000000000L / 61 + 1000000000L / 62)
    assert(r(30L) === 1000000000L / 61)
    assert(r(20L) === 1000000000L / 62)
    assert(r(10L) > r(30L) && r(30L) > r(20L))
  }

  test("maxSim: window-level matching, exact integer max/sum, " +
      "duplicate windows cannot change the score") {
    import graft.expressions.HashEmbed
    // query windows: "alpha beta gamma", "beta gamma delta"
    val q = Seq("alpha", "beta", "gamma", "delta")
    val rows = Seq(
      (1L, "alpha beta gamma delta xx"),   // both query windows verbatim
      (2L, "alpha beta gamma zz ww"),      // window 1 verbatim, 2 partial
      (3L, "pp qq rr ss tt"),              // no overlap
      (4L, "alpha beta gamma alpha beta gamma delta xx")) // dup windows
    val out = Retrieval.maxSim(rows.toDF("id", "text"), col("id"), col("text"), q)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // expected from the same embed + left-assoc dot the engine uses
    def emb(s: String) = HashEmbed.embed(s, 64)
    def fp(a: String, b: String): Long =
      math.floor(emb(a).zip(emb(b)).foldLeft(0.0)((acc, p) =>
        acc + p._1 * p._2) * 1e6).toLong
    def wins(text: String) = text.split(" ").toSeq.sliding(3)
      .map(_.mkString(" ")).toSeq.distinct
    val qw = q.sliding(3).map(_.mkString(" ")).toSeq
    def expected(text: String): Long =
      qw.map(qq => wins(text).map(w => fp(w, qq)).max).sum
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out.values.forall(_._1 == 2L), "every doc scores both query windows")
    assert(out(1L)._2 === 2000000L, "two verbatim window matches = 2*1e6")
    for ((id, text) <- rows)
      assert(out(id)._2 === expected(text), s"doc $id")
    assert(out(4L)._2 === out(1L)._2,
      "duplicate windows must not change the max-sum")
    assert(out(1L)._2 > out(2L)._2 && out(2L)._2 > out(3L)._2,
      "partial window overlap grades between verbatim and none")
  }

  test("staged postings: bm25FromStage and retrieveForTurnsFromStage are " +
      "row-identical to the from-corpus paths") {
    import graft.operators.Conversation
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val stage = java.nio.file.Files.createTempDirectory("graft_postings").toString
    assert(!Retrieval.postingsExist(stage))
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), stage)
    assert(Retrieval.postingsExist(stage))
    val terms = Seq("the", "data", "pipeline")
    val a = Retrieval.bm25(docs, col("doc_id"), col("text"), terms)
      .collect().map(_.toString).sorted
    val b = Retrieval.bm25FromStage(spark, stage, terms)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
    val resolved = Conversation.resolveTurns(Conversation.deriveTurns(docs))
    val x = Conversation.retrieveForTurns(resolved, docs, k = 3,
        maxPostings = 1000L)
      .collect().map(_.toString).sorted
    val y = Conversation.retrieveForTurnsFromStage(resolved, spark, stage,
        k = 3, maxPostings = 1000L)
      .collect().map(_.toString).sorted
    assert(x.nonEmpty && x.sameElements(y))
  }

  test("maxSimPruned: equi-join plan (no cross join), top-10 close to exact") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val q = Seq("customer", "order", "for", "table", "part", "data")
    val pruned = Retrieval.maxSimPruned(docs, col("doc_id"), col("text"), q)
      .orderBy(col("maxsim_fp").desc, col("doc_id")).limit(10)
    // the interaction must be a token EQUI-join — no cross/nested-loop
    // join anywhere in the pruned plan (the exact path's broadcast cross
    // join is precisely what the prune removes)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "pruned interaction must join on token equality")
    val p = pruned.collect().map(_.getLong(0)).toSet
    val e = Retrieval.maxSim(docs, col("doc_id"), col("text"), q)
      .orderBy(col("maxsim_fp").desc, col("doc_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val overlap = (p & e).size.toDouble / e.size
    assert(overlap >= 0.8, s"pruned top-10 overlap with exact = $overlap")
  }

  test("stageWindows: maxSimPrunedFromStage is row-identical to the " +
      "from-corpus pruned path") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val stage = java.nio.file.Files.createTempDirectory("graft_windows").toString
    assert(!Retrieval.windowsExist(stage))
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), stage)
    assert(Retrieval.windowsExist(stage))
    val q = Seq("customer", "order", "for", "table", "part", "data")
    val a = Retrieval.maxSimPruned(docs, col("doc_id"), col("text"), q)
      .collect().map(_.toString).sorted
    val b = Retrieval.maxSimPrunedFromStage(spark, stage, q)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("appendWindows: append ≡ rebuild relation-for-relation, idempotent; " +
      "torn append refused") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val inc = java.nio.file.Files.createTempDirectory("graft_win_inc").toString
    val full = java.nio.file.Files.createTempDirectory("graft_win_full").toString
    Retrieval.stageWindows(docs.filter(col("doc_id") % 3 =!= 0),
      col("doc_id"), col("text"), inc)
    Retrieval.appendWindows(docs.filter(col("doc_id") % 3 === 0),
      col("doc_id"), col("text"), inc)
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), full)
    def snap(path: String, rel: String): Seq[String] =
      spark.read.parquet(s"$path/$rel").collect().map(_.toString).sorted.toSeq
    // dwin compares RESOLVED (modulo the LSM generation column — an
    // incremental stage and a rebuild agree on content, not history)
    def snapDwin(path: String): Seq[String] =
      Retrieval.resolvedDwin(spark, path).collect().map(_.toString).sorted.toSeq
    assert(snapDwin(inc) == snapDwin(full), "dwin")
    for (rel <- Seq("wemb", "wtok"))
      assert(snap(inc, rel) == snap(full, rel), rel)
    val q = Seq("customer", "order", "for", "table", "part", "data")
    val a = Retrieval.maxSimPrunedFromStage(spark, inc, q)
      .collect().map(_.toString).sorted
    val b = Retrieval.maxSimPrunedFromStage(spark, full, q)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
    // idempotent: re-appending the same docs is a no-op
    Retrieval.appendWindows(docs.filter(col("doc_id") % 3 === 0),
      col("doc_id"), col("text"), inc)
    assert(snapDwin(inc) == snapDwin(full))
    // torn append refused
    java.nio.file.Files.createFile(java.nio.file.Paths.get(inc, "_APPENDING"))
    intercept[IllegalStateException] {
      Retrieval.maxSimPrunedFromStage(spark, inc, q)
    }
  }

  test("bm25BatchFromStage: per-query rows ≡ N separate bm25FromStage calls") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val st = java.nio.file.Files.createTempDirectory("graft_bm25_batch").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), st)
    val queries = Seq("customer order for table part data",
      "customer part data", "order table data for", "part customer")
    val qs = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q.split(" ").toSeq) }
      .toDF("q_id", "terms")
    val got = Retrieval.bm25BatchFromStage(spark, st, qs, k = 10)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms"),
        r.getAs[Long]("score_fp"))).sorted.toSeq
    val want = queries.zipWithIndex.flatMap { case (q, i) =>
      Retrieval.bm25FromStage(spark, st, q.split(" ").toSeq)
        .orderBy(col("score_fp").desc, col("doc_id")).limit(10)
        .collect().zipWithIndex.map { case (r, j) =>
          (i.toLong, (j + 1).toLong, r.getAs[Long]("doc_id"),
            r.getAs[Long]("n_terms"), r.getAs[Long]("score_fp"))
        }
    }.sorted
    assert(got.nonEmpty && got == want,
      "batch must be row-identical to per-query staged BM25")
  }

  test("bounded-plan guard: past the literal limit the tok filtering " +
      "moves into the joins — identical rows, no vocabulary-sized isin " +
      "in the plan") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val stP = java.nio.file.Files.createTempDirectory("graft_bpg_p").toString
    val stW = java.nio.file.Files.createTempDirectory("graft_bpg_w").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), stP)
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), stW)
    val queries = Seq("customer order for table part data",
      "customer part data table", "order table data for", "part customer data")
    val qs = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q.split(" ").toSeq) }
      .toDF("q_id", "terms")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // bm25: forced-join path ≡ static-literal path, and the semi-join
    // plan embeds no term literal while the static plan does
    val stat = Retrieval.bm25BatchFromStage(spark, stP, qs, k = 10)
    val joined = Retrieval.bm25BatchFromStage(spark, stP, qs, k = 10,
      pruneLiteralLimit = 0)
    assert(rows(stat).nonEmpty && rows(stat) == rows(joined))
    val statPlan = stat.queryExecution.executedPlan.toString
    val joinPlan = joined.queryExecution.executedPlan.toString
    assert(statPlan.contains("customer"),
      "static path pushes term literals into the scan filter")
    assert(!joinPlan.contains("customer"),
      s"guarded path must embed NO term literal:\n$joinPlan")
    // maxsim: same contract
    val statM = Retrieval.maxSimBatchFromStage(spark, stW, qs, k = 10)
    val joinM = Retrieval.maxSimBatchFromStage(spark, stW, qs, k = 10,
      pruneLiteralLimit = 0)
    assert(rows(statM).nonEmpty && rows(statM) == rows(joinM))
    assert(!joinM.queryExecution.executedPlan.toString.contains(
      "IN (customer"), "guarded MaxSim plan must embed no tok isin list")
  }

  test("maxSimBatchFromStage: per-query rows ≡ N separate " +
      "maxSimPrunedFromStage calls") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val st = java.nio.file.Files.createTempDirectory("graft_ms_batch").toString
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), st)
    val queries = Seq("customer order for table part data",
      "for table part data", "order table data for")
    val qs = queries.zipWithIndex
      .map { case (q, i) => (i.toLong, q.split(" ").toSeq) }
      .toDF("q_id", "terms")
    val got = Retrieval.maxSimBatchFromStage(spark, st, qs, k = 10)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_qt"),
        r.getAs[Long]("maxsim_fp"))).sorted.toSeq
    val want = queries.zipWithIndex.flatMap { case (q, i) =>
      Retrieval.maxSimPrunedFromStage(spark, st, q.split(" ").toSeq)
        .orderBy(col("maxsim_fp").desc, col("doc_id")).limit(10)
        .collect().zipWithIndex.map { case (r, j) =>
          (i.toLong, (j + 1).toLong, r.getAs[Long]("doc_id"),
            r.getAs[Long]("n_qt"), r.getAs[Long]("maxsim_fp"))
        }
    }.sorted
    assert(got.nonEmpty && got == want,
      "batch must be row-identical to per-query staged MaxSim")
  }

  test("deleteWindows: query ≡ rebuild-on-remaining, only victim partitions " +
      "rewritten; compactWindows GCs orphans to a rebuild-identical stage") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val del = java.nio.file.Files.createTempDirectory("graft_win_del").toString
    val rem = java.nio.file.Files.createTempDirectory("graft_win_rem").toString
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), del)
    Retrieval.stageWindows(docs.filter(col("doc_id") % 3 =!= 0),
      col("doc_id"), col("text"), rem)
    // victims' db partitions (crc32 of the id's decimal string, mod 64)
    val victimIds = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    def dbOf(id: Long): Int = {
      val c = new java.util.zip.CRC32()
      c.update(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (c.getValue % 64).toInt
    }
    val vdb = victimIds.map(dbOf)
    val untouched = new java.io.File(s"$del/dwin").listFiles()
      .filter(d => d.getName.startsWith("db=") &&
        !vdb.contains(d.getName.stripPrefix("db=").toInt))
    val mtimesBefore = untouched.map(d => d.getName ->
      d.listFiles().map(_.lastModified).max).toMap
    Retrieval.deleteWindows(
      docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")), del)
    untouched.foreach(d => assert(
      d.listFiles().map(_.lastModified).max == mtimesBefore(d.getName),
      s"delete must not rewrite untouched partition ${d.getName}"))
    val q = Seq("customer", "order", "for", "table", "part", "data")
    def ask(path: String): Seq[String] =
      Retrieval.maxSimPrunedFromStage(spark, path, q)
        .collect().map(_.toString).sorted.toSeq
    assert(ask(del).nonEmpty && ask(del) == ask(rem),
      "delete-then-query must equal rebuild-on-remaining")
    def snap(path: String, rel: String): Seq[String] =
      spark.read.parquet(s"$path/$rel").collect().map(_.toString).sorted.toSeq
    // RESOLVED dwin already matches (raw rows differ by design: the
    // delete tombstones, it does not rewrite); vocabulary still carries
    // orphans until compact
    def snapDwin(path: String): Seq[String] =
      Retrieval.resolvedDwin(spark, path).collect().map(_.toString).sorted.toSeq
    assert(snapDwin(del) == snapDwin(rem))
    Retrieval.compactWindows(spark, del)
    for (rel <- Seq("dwin", "wemb", "wtok"))
      assert(snap(del, rel) == snap(rem, rel), s"$rel after compact GC")
    assert(ask(del) == ask(rem), "compaction must not change query results")
    // torn maintenance refused
    java.nio.file.Files.createFile(java.nio.file.Paths.get(del, "_APPENDING"))
    intercept[IllegalStateException] {
      Retrieval.deleteWindows(docs.limit(1).select(col("doc_id")), del)
    }
  }

  test("compactWindowsIfStale: 0.0 on fresh AND append-only stages, fires " +
      "past the tombstoned fraction, post-compact back to the G=0 read path") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val p = java.nio.file.Files.createTempDirectory("graft_win_autoc").toString
    Retrieval.stageWindows(docs.filter(col("doc_id") % 3 =!= 0),
      col("doc_id"), col("text"), p)
    assert(Retrieval.windowsStaleFraction(spark, p) == 0.0)
    assert(!Retrieval.compactWindowsIfStale(spark, p, 0.05),
      "a fresh stage must not trigger the policy")
    // appends are purely additive — no window row is superseded, so the
    // probe reads 0.0 WITHOUT counting anything (G>0 but no tombs)
    Retrieval.appendWindows(docs.filter(col("doc_id") % 3 === 0),
      col("doc_id"), col("text"), p)
    assert(Retrieval.windowsStaleFraction(spark, p) == 0.0)
    assert(!Retrieval.compactWindowsIfStale(spark, p, 0.05))
    // a delete tombstones ~1/3 of the docs — the fraction crosses any
    // reasonable threshold and the policy fires exactly once
    Retrieval.deleteWindows(
      docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")), p)
    val f = Retrieval.windowsStaleFraction(spark, p)
    assert(f > 0.05 && f < 1.0, s"tombstoned fraction $f")
    assert(Retrieval.compactWindowsIfStale(spark, p, 0.05),
      "the policy must fire past the threshold")
    assert(Retrieval.windowsStaleFraction(spark, p) == 0.0)
    assert(!Retrieval.compactWindowsIfStale(spark, p, 0.05),
      "a just-compacted stage must not re-fire")
    // queries are policy-invariant: ≡ a fresh build on the survivors
    val rem = java.nio.file.Files.createTempDirectory("graft_win_autor").toString
    Retrieval.stageWindows(docs.filter(col("doc_id") % 3 =!= 0),
      col("doc_id"), col("text"), rem)
    val q = Seq("customer", "order", "for", "table", "part", "data")
    def ask(path: String): Seq[String] =
      Retrieval.maxSimPrunedFromStage(spark, path, q)
        .collect().map(_.toString).sorted.toSeq
    assert(ask(p).nonEmpty && ask(p) == ask(rem))
  }

  test("upsertPostings/upsertWindows: upsert ≡ rebuild on the modified corpus") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val changed = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" updated revision")).as("text"))
    val modified = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("text")).unionByName(changed)
    val q = Seq("customer", "order", "for", "table", "part", "data")
    def snap(path: String, rel: String): Seq[String] =
      spark.read.parquet(s"$path/$rel").collect().map(_.toString).sorted.toSeq
    // postings: upsert must be relation-identical to a rebuild on modified
    val up = java.nio.file.Files.createTempDirectory("graft_ups_p").toString
    val rb = java.nio.file.Files.createTempDirectory("graft_ups_pr").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), up)
    Retrieval.upsertPostings(changed, col("doc_id"), col("text"), up)
    Retrieval.stagePostings(modified, col("doc_id"), col("text"), rb)
    assert(snapResolved(up) == snapResolved(rb))
    // windows: query-identical after upsert; relation-identical after
    // compact GCs the delete half's vocabulary orphans
    val uw = java.nio.file.Files.createTempDirectory("graft_ups_w").toString
    val rw = java.nio.file.Files.createTempDirectory("graft_ups_wr").toString
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), uw)
    Retrieval.upsertWindows(changed, col("doc_id"), col("text"), uw)
    Retrieval.stageWindows(modified, col("doc_id"), col("text"), rw)
    def ask(path: String): Seq[String] =
      Retrieval.maxSimPrunedFromStage(spark, path, q)
        .collect().map(_.toString).sorted.toSeq
    assert(ask(uw).nonEmpty && ask(uw) == ask(rw))
    Retrieval.compactWindows(spark, uw)
    for (rel <- Seq("dwin", "wemb", "wtok"))
      assert(snap(uw, rel) == snap(rw, rel), s"windows/$rel after compact")
  }

  // RESOLVED-stage snapshot: current-generation postings rows, dfreq/
  // globals modulo the LSM generation columns (an incremental stage and
  // a rebuild agree on content, not on generation history).
  private def snapResolved(path: String): Seq[Seq[String]] = {
    val st = Retrieval.readStage(spark, path)
    Seq(
      st.postings.select("tok", "doc_id", "tf", "rank", "pb")
        .collect().map(_.toString).sorted.toSeq,
      st.dfreq.select("tok", "df", "pb")
        .collect().map(_.toString).sorted.toSeq,
      st.doclens.collect().map(_.toString).sorted.toSeq,
      Seq(s"${st.nDocs},${st.totalDl}"))
  }

  private def parquetFiles(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try walk.iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
    finally walk.close()
  }

  test("appendPostings: append-then-query ≡ rebuild-then-query, idempotent") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val inc = java.nio.file.Files.createTempDirectory("graft_post_inc").toString
    val full = java.nio.file.Files.createTempDirectory("graft_post_full").toString
    Retrieval.stagePostings(docs.filter(col("doc_id") % 3 =!= 0),
      col("doc_id"), col("text"), inc)
    Retrieval.appendPostings(docs.filter(col("doc_id") % 3 === 0),
      col("doc_id"), col("text"), inc)
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), full)
    // resolved relation-for-relation equality: postings (current rows),
    // dfreq, doclens, globals
    assert(snapResolved(inc) == snapResolved(full))
    val terms = Seq("the", "data", "pipeline")
    val a = Retrieval.bm25FromStage(spark, inc, terms)
      .collect().map(_.toString).sorted
    val b = Retrieval.bm25FromStage(spark, full, terms)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
    // re-appending the same docs is a no-op (anti-join on staged ids)
    val files = parquetFiles(s"$inc/postings")
    Retrieval.appendPostings(docs.filter(col("doc_id") % 3 === 0),
      col("doc_id"), col("text"), inc)
    assert(parquetFiles(s"$inc/postings") == files)
    assert(snapResolved(inc) == snapResolved(full))
  }

  test("appendPostings is LSM: no pre-existing postings file is rewritten " +
      "— written bytes ∝ the touched posting lists, never the corpus") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val p = java.nio.file.Files.createTempDirectory("graft_post_lsm").toString
    Retrieval.stagePostings(docs.filter(col("doc_id") % 10 =!= 0),
      col("doc_id"), col("text"), p)
    val before = parquetFiles(s"$p/postings")
    Retrieval.appendPostings(docs.filter(col("doc_id") % 10 === 0),
      col("doc_id"), col("text"), p)
    val after = parquetFiles(s"$p/postings")
    // the append ADDED files; every pre-existing file survives untouched
    // (the r15 rewrite amplification rewrote keep ∪ rerank for every
    // touched partition — cost ∝ corpus per append at 64 buckets)
    assert(before.keySet.subsetOf(after.keySet))
    for ((f, sz) <- before) assert(after(f) == sz, s"$f was rewritten")
    assert(after.size > before.size)
    // and a DELETE is LSM on postings too
    val beforeDel = parquetFiles(s"$p/postings")
    Retrieval.deletePostings(
      docs.filter(col("doc_id") % 10 === 0).select(col("doc_id")), p)
    val afterDel = parquetFiles(s"$p/postings")
    assert(beforeDel.keySet.subsetOf(afterDel.keySet))
    for ((f, sz) <- beforeDel) assert(afterDel(f) == sz, s"$f was rewritten")
  }

  test("append/delete admission scans are id-bucket-PRUNED: an unreadable " +
      "doclens partition outside the batch's buckets is never opened") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    // one-doc batch: its id hashes to exactly one db bucket
    val batch = docs.filter(col("doc_id") === 1)
    val p = java.nio.file.Files.createTempDirectory("graft_post_adm").toString
    Retrieval.stagePostings(docs.filter(col("doc_id") > 1 && col("doc_id") < 60),
      col("doc_id"), col("text"), p)
    // plant a corrupt parquet file in every doclens partition EXCEPT the
    // batch's own bucket — a full-relation admission scan trips over it,
    // a pruned one never opens it
    val batchDb = {
      val c = new java.util.zip.CRC32()
      c.update("1".getBytes("UTF-8"))
      (c.getValue % 64).toInt
    }
    for (b <- 0 until 64 if b != batchDb) {
      val d = java.nio.file.Paths.get(s"$p/doclens/db=$b")
      if (java.nio.file.Files.isDirectory(d))
        java.nio.file.Files.write(d.resolve("corrupt.parquet"),
          "not a parquet file".getBytes("US-ASCII"))
    }
    // pruned admission: reads only db=batchDb — must succeed
    Retrieval.appendPostings(batch, col("doc_id"), col("text"), p)
    Retrieval.deletePostings(batch.select(col("doc_id")), p)
    // clean up the planted corruption so the temp stage stays readable
    for (b <- 0 until 64) {
      val f = java.nio.file.Paths.get(s"$p/doclens/db=$b/corrupt.parquet")
      java.nio.file.Files.deleteIfExists(f)
    }
  }

  test("deletePostings: delete-then-query ≡ rebuild-on-remaining, " +
      "every staged relation identical") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val del = java.nio.file.Files.createTempDirectory("graft_post_del").toString
    val rem = java.nio.file.Files.createTempDirectory("graft_post_rem").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), del)
    Retrieval.deletePostings(docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")), del)
    Retrieval.stagePostings(docs.filter(col("doc_id") % 3 =!= 0),
      col("doc_id"), col("text"), rem)
    assert(snapResolved(del) == snapResolved(rem))
    val terms = Seq("the", "data", "pipeline")
    val a = Retrieval.bm25FromStage(spark, del, terms)
      .collect().map(_.toString).sorted
    val b = Retrieval.bm25FromStage(spark, rem, terms)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
    // deleting already-absent ids is a no-op
    Retrieval.deletePostings(docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")), del)
    assert(snapResolved(del) == snapResolved(rem))
  }

  test("compactPostings: resolved rows and query output invariant, stale " +
      "generations dropped, stage ≡ fresh rebuild, one file per partition") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val p = java.nio.file.Files.createTempDirectory("graft_post_cmp").toString
    val full = java.nio.file.Files.createTempDirectory("graft_post_cmpf").toString
    // two appends accumulate small files AND superseded-generation rows
    Retrieval.stagePostings(docs.filter(col("doc_id") % 3 === 1),
      col("doc_id"), col("text"), p)
    Retrieval.appendPostings(docs.filter(col("doc_id") % 3 === 2),
      col("doc_id"), col("text"), p)
    Retrieval.appendPostings(docs.filter(col("doc_id") % 3 === 0),
      col("doc_id"), col("text"), p)
    val before = snapResolved(p)
    val rawBefore = spark.read.parquet(s"$p/postings").count()
    Retrieval.compactPostings(spark, p)
    assert(snapResolved(p) == before)
    // the LSM garbage is GONE: raw row count shrinks to the resolved
    // count, and the compacted stage equals a fresh rebuild raw-relation-
    // for-relation (generations reset to 0)
    val rawAfter = spark.read.parquet(s"$p/postings").count()
    assert(rawAfter < rawBefore)
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), full)
    def raw(path: String, rel: String): Seq[String] =
      spark.read.parquet(s"$path/$rel").collect().map(_.toString).sorted.toSeq
    for (rel <- Seq("postings", "dfreq", "doclens"))
      assert(raw(p, rel) == raw(full, rel), rel)
    // every partition dir holds exactly one parquet file after compaction
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(s"$p/postings"))
      .toArray.map(_.toString).filter(_.contains("pb="))
    assert(parts.nonEmpty)
    for (d <- parts) {
      val n = java.nio.file.Files.list(java.nio.file.Paths.get(d))
        .toArray.map(_.toString).count(_.endsWith(".parquet"))
      assert(n == 1, s"$d has $n parquet files")
    }
  }

  test("recoverPostings: a writer killed between the postings write and " +
      "the dfreq write rolls BACK — recover-then-query ≡ pre-append state") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 60)
    val p = java.nio.file.Files.createTempDirectory("graft_post_cr1").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), p)
    val before = snapResolved(p)
    val rawBefore = spark.read.parquet(s"$p/postings").count()
    // the exact on-disk state of that crash: orphan postings rows at the
    // uncommitted generation 1, intent present, nothing else advanced
    spark.read.parquet(s"$p/postings")
      .withColumn("gen", lit(1L))
      .repartition(col("pb"))
      .write.mode("append").partitionBy("pb").parquet(s"$p/postings")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(p, "_APPENDING"))
    intercept[IllegalStateException](Retrieval.readStage(spark, p))
    Retrieval.recoverPostings(spark, p)
    assert(snapResolved(p) == before)
    // the orphans are physically GONE (not merely invisible): the next
    // writer's g = 1 must not collide with them
    assert(spark.read.parquet(s"$p/postings").count() == rawBefore)
    // and recover is idempotent
    Retrieval.recoverPostings(spark, p)
    assert(snapResolved(p) == before)
  }

  test("recoverPostings: a writer killed MID-PROMOTE (staged re-rank " +
      "half-moved into postings/) rolls back whole — promoted orphans " +
      "GC'd, the unpromoted stage dir discarded") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 60)
    val p = java.nio.file.Files.createTempDirectory("graft_post_crp").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), p)
    val before = snapResolved(p)
    val rawBefore = spark.read.parquet(s"$p/postings").count()
    // the exact on-disk state of a crash inside Staging.moveInto: SOME
    // re-ranked gen-1 rows promoted into live partitions, the REST still
    // sitting in the LSM staging dir, intent present, _GEN not advanced
    spark.read.parquet(s"$p/postings").filter(col("pb") < 32)
      .withColumn("gen", lit(1L))
      .repartition(col("pb"))
      .write.mode("append").partitionBy("pb").parquet(s"$p/postings")
    spark.read.parquet(s"$p/postings").filter(col("pb") >= 32)
      .withColumn("gen", lit(1L))
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("pb")
      .parquet(s"$p/_APPEND_STAGE_postings")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(p, "_APPENDING"))
    intercept[IllegalStateException](Retrieval.readStage(spark, p))
    Retrieval.recoverPostings(spark, p)
    assert(snapResolved(p) == before, "recover-then-query ≡ pre-append")
    assert(spark.read.parquet(s"$p/postings").count() == rawBefore,
      "promoted gen-1 orphans must be physically gone")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "_APPEND_STAGE_postings")),
      "the unpromoted staging dir must be discarded")
    Retrieval.recoverPostings(spark, p) // idempotent
    assert(snapResolved(p) == before)
  }

  test("recoverPostings: a writer killed AFTER every relation write but " +
      "before the _GEN commit rolls back; retrying the append then heals " +
      "to ≡ rebuild") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 60)
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val p = java.nio.file.Files.createTempDirectory("graft_post_cr2").toString
    Retrieval.stagePostings(base, col("doc_id"), col("text"), p)
    val before = snapResolved(p)
    val genBefore = java.nio.file.Files.readString(
      java.nio.file.Paths.get(p, "_GEN"))
    // run the real append, then reconstruct the crash state: _GEN back
    // to its pre-append content, intent re-planted — byte-identical to a
    // writer killed a breath before its commit rename
    Retrieval.appendPostings(batch, col("doc_id"), col("text"), p)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p, "_GEN"), genBefore)
    java.nio.file.Files.createFile(java.nio.file.Paths.get(p, "_APPENDING"))
    Retrieval.recoverPostings(spark, p)
    assert(snapResolved(p) == before, "recover-then-query ≡ pre-append")
    // heal-by-retry: the same append lands cleanly (no generation
    // collision with GC'd orphans) and equals the full rebuild
    Retrieval.appendPostings(batch, col("doc_id"), col("text"), p)
    val full = java.nio.file.Files.createTempDirectory("graft_post_cr2f").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), full)
    assert(snapResolved(p) == snapResolved(full))
  }

  test("recoverWindows: interrupted append AND interrupted delete both " +
      "roll back to the committed state; retry heals") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 60)
    val p = java.nio.file.Files.createTempDirectory("graft_win_cr").toString
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), p)
    val q = Seq("customer", "order", "for", "table", "part", "data")
    def ask(): Seq[String] = Retrieval.maxSimPrunedFromStage(spark, p, q)
      .collect().map(_.toString).sorted.toSeq
    val before = ask()
    // torn append: orphan dwin rows at the uncommitted generation 1
    spark.read.parquet(s"$p/dwin").withColumn("gen", lit(1L))
      .limit(50)
      .repartition(col("db"))
      .write.mode("append").partitionBy("db").parquet(s"$p/dwin")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(p, "_APPENDING"))
    intercept[IllegalStateException](Retrieval.maxSimPrunedFromStage(spark, p, q))
    Retrieval.recoverWindows(spark, p)
    assert(ask() == before)
    // torn delete: orphan tombstones at the uncommitted generation 1
    import spark.implicits._
    Seq((1L, 1L, {
      val c = new java.util.zip.CRC32()
      c.update("1".getBytes("UTF-8")); (c.getValue % 64).toInt
    })).toDF("doc_id", "gen", "db")
      .repartition(col("db"))
      .write.mode("append").partitionBy("db").parquet(s"$p/tombs")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(p, "_APPENDING"))
    Retrieval.recoverWindows(spark, p)
    assert(ask() == before, "an uncommitted tombstone must not survive recover")
    // a real delete now works and is visible
    Retrieval.deleteWindows(docs.filter(col("doc_id") === 1)
      .select(col("doc_id")), p)
    val after = Retrieval.maxSimPrunedFromStage(spark, p, q)
      .filter(col("doc_id") === 1).count()
    assert(after == 0)
  }

  test("deletePostings is fwd-sidecar PRUNED: unreadable files planted in " +
      "every non-victim postings/doclens/fwd partition are never opened") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") > 0 && col("doc_id") < 60)
    val p = java.nio.file.Files.createTempDirectory("graft_post_prn").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), p)
    val victimDb = {
      val c = new java.util.zip.CRC32()
      c.update("1".getBytes("UTF-8")); (c.getValue % 64).toInt
    }
    // the victim's token buckets, exactly what the fwd sidecar records
    val victimPbs = spark.read.parquet(s"$p/fwd")
      .filter(col("doc_id") === 1).select(col("pb")).distinct()
      .collect().map(_.getInt(0)).toSet
    def plant(rel: String, pc: String, keep: Set[Int]): Unit =
      for (b <- 0 until 64 if !keep(b)) {
        val d = java.nio.file.Paths.get(s"$p/$rel/$pc=$b")
        if (java.nio.file.Files.isDirectory(d))
          java.nio.file.Files.write(d.resolve("corrupt.parquet"),
            "not a parquet file".getBytes("US-ASCII"))
      }
    plant("doclens", "db", Set(victimDb))
    plant("fwd", "db", Set(victimDb))
    plant("postings", "pb", victimPbs)
    // a delete that scanned any non-victim partition would crash here
    Retrieval.deletePostings(docs.filter(col("doc_id") === 1)
      .select(col("doc_id")), p)
    for (rel <- Seq("doclens", "fwd", "postings"); b <- 0 until 64) {
      val pc = if (rel == "postings") "pb" else "db"
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$p/$rel/$pc=$b/corrupt.parquet"))
    }
    // and the delete is CORRECT: ≡ rebuild on the remaining corpus
    val rem = java.nio.file.Files.createTempDirectory("graft_post_prnr").toString
    Retrieval.stagePostings(docs.filter(col("doc_id") =!= 1),
      col("doc_id"), col("text"), rem)
    val a = Retrieval.bm25FromStage(spark, p, Seq("the", "data"))
      .collect().map(_.toString).sorted
    val b = Retrieval.bm25FromStage(spark, rem, Seq("the", "data"))
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("writer exclusion: a second postings/windows writer is refused " +
      "while the lock is held") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 40)
    val p = java.nio.file.Files.createTempDirectory("graft_post_lk").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), p)
    graft.tables.WriterLock.withLock(p) {
      val e = intercept[IllegalStateException](
        Retrieval.appendPostings(docs, col("doc_id"), col("text"), p))
      assert(e.getMessage.contains("_WRITER_LOCK"))
    }
    val w = java.nio.file.Files.createTempDirectory("graft_win_lk").toString
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), w)
    graft.tables.WriterLock.withLock(w) {
      intercept[IllegalStateException](
        Retrieval.deleteWindows(docs.select(col("doc_id")), w))
    }
    // locks released — real maintenance proceeds
    Retrieval.appendPostings(docs, col("doc_id"), col("text"), p)
    Retrieval.deleteWindows(docs.limit(1).select(col("doc_id")), w)
  }

  test("torn maintenance is refused: _APPENDING intent present ⇒ readStage throws") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val p = java.nio.file.Files.createTempDirectory("graft_post_torn").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), p)
    java.nio.file.Files.createFile(java.nio.file.Paths.get(p, "_APPENDING"))
    intercept[IllegalStateException] {
      Retrieval.bm25FromStage(spark, p, Seq("the"))
    }
    java.nio.file.Files.delete(java.nio.file.Paths.get(p, "_APPENDING"))
    assert(Retrieval.bm25FromStage(spark, p, Seq("the")).count() > 0)
  }

  test("deleting every remaining doc leaves a READABLE empty stage " +
      "(recorded schemas), and a later append ≡ fresh rebuild") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 40)
    val p = java.nio.file.Files.createTempDirectory("graft_post_wipe").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), p)
    Retrieval.deletePostings(docs.select(col("doc_id")), p)
    // every relation is now a fileless partitioned dir — the recorded
    // schemas make it read as EMPTY, not as a schema-inference crash
    // while the done marker still says healthy
    val st = Retrieval.readStage(spark, p)
    assert(st.postings.count() == 0 && st.dfreq.count() == 0 &&
      st.doclens.count() == 0)
    assert(st.nDocs == 0L && st.totalDl == 0L)
    assert(Retrieval.bm25FromStage(spark, p, Seq("the", "data")).count() == 0)
    // the emptied stage is still maintainable: append re-admits the
    // corpus and must equal a fresh build, query-for-query
    Retrieval.appendPostings(docs, col("doc_id"), col("text"), p)
    val full = java.nio.file.Files.createTempDirectory("graft_post_wipe_f").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), full)
    assert(snapResolved(p) == snapResolved(full))
    val a = Retrieval.bm25FromStage(spark, p, Seq("the", "data"))
      .collect().map(_.toString).sorted
    val b = Retrieval.bm25FromStage(spark, full, Seq("the", "data"))
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("deleting every doc's windows leaves a readable stage; re-append " +
      "serves ≡ rebuild") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 40)
    val p = java.nio.file.Files.createTempDirectory("graft_win_wipe").toString
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), p)
    Retrieval.deleteWindows(docs.select(col("doc_id")), p)
    val q = Seq("customer", "order", "for", "table", "part", "data")
    // dwin is emptied (wemb/wtok orphans are retained by design) —
    // queries over the empty stage return nothing instead of crashing
    assert(Retrieval.maxSimPrunedFromStage(spark, p, q).count() == 0)
    Retrieval.appendWindows(docs, col("doc_id"), col("text"), p)
    val full = java.nio.file.Files.createTempDirectory("graft_win_wipe_f").toString
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), full)
    val a = Retrieval.maxSimPrunedFromStage(spark, p, q)
      .collect().map(_.toString).sorted
    val b = Retrieval.maxSimPrunedFromStage(spark, full, q)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("window-stage shape knobs are recorded at build and enforced: " +
      "mismatched maintenance/query calls are refused; matching knobs " +
      "flow through upsert") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 60)
    val p = java.nio.file.Files.createTempDirectory("graft_win_knobs").toString
    Retrieval.stageWindows(docs.filter(col("doc_id") < 40),
      col("doc_id"), col("text"), p, maxDocWindows = 8, windowN = 2, dim = 32)
    val q = Seq("customer", "order", "for", "table", "part", "data")
    // default knobs ≠ build knobs ⇒ loud refusal, not silent corruption
    intercept[IllegalArgumentException] {
      Retrieval.appendWindows(docs.filter(col("doc_id") >= 40),
        col("doc_id"), col("text"), p)
    }
    intercept[IllegalArgumentException] {
      Retrieval.maxSimPrunedFromStage(spark, p, q)
    }
    intercept[IllegalArgumentException] {
      Retrieval.upsertWindows(docs, col("doc_id"), col("text"), p)
    }
    // matching knobs: upsert (delete+append) ≡ rebuild on the modified
    // corpus, with the SAME non-default shape end to end
    val changed = docs.withColumn("text",
      concat(col("text"), lit(" refreshed body")))
    Retrieval.upsertWindows(changed, col("doc_id"), col("text"), p,
      maxDocWindows = 8, windowN = 2, dim = 32)
    val full = java.nio.file.Files.createTempDirectory("graft_win_knobs_f").toString
    Retrieval.stageWindows(changed, col("doc_id"), col("text"), full,
      maxDocWindows = 8, windowN = 2, dim = 32)
    val a = Retrieval.maxSimPrunedFromStage(spark, p, q,
        windowN = 2, dim = 32)
      .collect().map(_.toString).sorted
    val b = Retrieval.maxSimPrunedFromStage(spark, full, q,
        windowN = 2, dim = 32)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("rrfFuseBatch: per-query rows ≡ N separate rrfFuse calls, " +
      "including one-sided docs") {
    import spark.implicits._
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L), (1L, 12L, 1L), (1L, 10L, 2L))
      .toDF("q_id", "doc_id", "rank")
    val vec = Seq((0L, 11L, 1L), (0L, 13L, 2L), (1L, 12L, 1L))
      .toDF("q_id", "doc_id", "rank")
    val batch = Retrieval.rrfFuseBatch(lex, vec)
      .select("q_id", "doc_id", "lex_rank", "vec_rank", "rrf_fp")
      .collect().map(_.toString).sorted.toSeq
    val singles = Seq(0L, 1L).flatMap { q =>
      Retrieval.rrfFuse(
          lex.filter(col("q_id") === q).drop("q_id"),
          vec.filter(col("q_id") === q).drop("q_id"))
        .select(lit(q).as("q_id"), col("doc_id"), col("lex_rank"),
          col("vec_rank"), col("rrf_fp"))
        .collect().map(_.toString)
    }.sorted
    assert(batch.nonEmpty && batch == singles)
    // doc 13 is vec-only for q 0, doc 10 lex-only for q 1 — the
    // full-outer half-scores survive per query
    assert(batch.exists(_.contains("[0,13,null")))
  }

  test("maxSimBatchFromStage accepts any integral q_id (not just Long)") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 60)
    val st = java.nio.file.Files.createTempDirectory("graft_ms_int").toString
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), st)
    val terms = Seq("customer", "order", "for", "table", "part", "data")
    val qsInt = Seq((7, terms)).toDF("q_id", "terms")
    val qsLong = Seq((7L, terms)).toDF("q_id", "terms")
    val a = Retrieval.maxSimBatchFromStage(spark, st, qsInt, k = 5)
      .collect().map(_.toString).sorted
    val b = Retrieval.maxSimBatchFromStage(spark, st, qsLong, k = 5)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("compactPostingsIfFragmented: a long append-only drain keeps " +
      "files/partition bounded by policy; queries invariant (r21)") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val p = java.nio.file.Files.createTempDirectory("graft_post_frag").toString
    val full = java.nio.file.Files.createTempDirectory("graft_post_fragf").toString
    Retrieval.stagePostings(docs.filter(col("doc_id") % 7 === 0),
      col("doc_id"), col("text"), p)
    // Fragmentation is a FILE property, not a row property: appends land
    // one new file per touched partition per batch regardless of what
    // they supersede (a vocabulary-disjoint stream never goes stale yet
    // fragments identically), and the drain's stale probe is gen-gated —
    // so only this policy bounds the resolved read's file count per
    // batch. Exercised here exactly as the drain calls it.
    var fired = 0
    var peak = 0.0
    for (i <- 1 to 6) {
      Retrieval.appendPostings(docs.filter(col("doc_id") % 7 === i),
        col("doc_id"), col("text"), p)
      peak = math.max(peak, Retrieval.postingsFragmentation(p))
      if (Retrieval.compactPostingsIfFragmented(spark, p)) fired += 1
      // post-policy invariant: never more than the threshold
      assert(Retrieval.postingsFragmentation(p) <= 4.0)
    }
    assert(fired >= 1, s"policy never fired across 6 appends (peak $peak)")
    assert(peak > 4.0, "the drain never actually crossed the threshold")
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), full)
    val terms = Seq("the", "data", "pipeline")
    val a = Retrieval.bm25FromStage(spark, p, terms)
      .collect().map(_.toString).sorted
    val b = Retrieval.bm25FromStage(spark, full, terms)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("compactWindowsIfFragmented: bounded files/partition on a long " +
      "additive drain; pruned MaxSim invariant (r21)") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val p = java.nio.file.Files.createTempDirectory("graft_win_frag").toString
    val full = java.nio.file.Files.createTempDirectory("graft_win_fragf").toString
    Retrieval.stageWindows(docs.filter(col("doc_id") % 7 === 0),
      col("doc_id"), col("text"), p)
    var fired = 0
    var peak = 0.0
    for (i <- 1 to 6) {
      Retrieval.appendWindows(docs.filter(col("doc_id") % 7 === i),
        col("doc_id"), col("text"), p)
      peak = math.max(peak, Retrieval.windowsFragmentation(p))
      if (Retrieval.compactWindowsIfFragmented(spark, p)) fired += 1
      assert(Retrieval.windowsFragmentation(p) <= 4.0)
    }
    assert(fired >= 1, s"policy never fired across 6 appends (peak $peak)")
    assert(peak > 4.0, "the drain never actually crossed the threshold")
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), full)
    val terms = Seq("customer", "order", "for", "table", "part", "data")
    val a = Retrieval.maxSimPrunedFromStage(spark, p, terms)
      .collect().map(_.toString).sorted
    val b = Retrieval.maxSimPrunedFromStage(spark, full, terms)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }
}
