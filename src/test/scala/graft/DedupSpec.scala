package graft

import org.apache.spark.sql.functions._

import graft.expressions.SimHash
import graft.operators.Dedup
import graft.tables.Tables

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  private lazy val corpus = {
    val d = docs
    d.select(col("doc_id").as("id"), col("text"))
      .unionAll(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("id"),
          concat(col("text"), lit(" zz extra token")).as("text")))
  }

  test("exact dedup keeps min id and counts duplicates") {
    import spark.implicits._
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("id", "t")
    val out = Dedup.exact(df, $"id", $"t").orderBy($"keep_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH recalls planted near-dups with high estimated jaccard") {
    val pairs = Dedup.minhashPairs(corpus, col("id"), col("text")).collect()
    val planted = pairs.filter(r => r.getLong(1) == r.getLong(0) + 100000)
    // 50 planted pairs; LSH recall is probabilistic — at J≈0.8 with 4 bands
    // of 2 rows, P(miss) = (1-J²)⁴ ≈ 2% per pair, so allow a couple misses
    assert(planted.length >= 47)
    // appended tokens only disturb tail shingles — estimates stay high
    assert(planted.map(_.getDouble(2)).forall(_ >= 0.5))
  }

  test("ngram jaccard of planted pairs is high, of unrelated docs is low") {
    import spark.implicits._
    val pairs = corpus.filter(col("id") < 100000 && col("id") % 10 === 0)
      .select(col("id").as("a_id"), (col("id") + 100000).as("b_id"))
    val jac = Dedup.ngramJaccard(corpus, col("id"), col("text"), pairs).collect()
    assert(jac.length == 50)
    assert(jac.map(_.getDouble(2)).forall(j => j > 0.7 && j <= 1.0))

    val unrelated = Seq((0L, 1L)).toDF("a_id", "b_id")
    val j2 = Dedup.ngramJaccard(corpus, col("id"), col("text"), unrelated).head().getDouble(2)
    assert(j2 < 0.3)
  }

  test("native shingles expression equals the composed builtin form") {
    import graft.functions.TextFunctions
    val rows = docs.limit(50).select(
        Dedup.shingles(col("text"), 3).as("composed"),
        TextFunctions.shingles(col("text"), 3).as("native"),
        array_distinct(Dedup.shingles(col("text"), 3)).as("composed_d"),
        TextFunctions.shingles(col("text"), 3, distinct = true).as("native_d"),
        TextFunctions.repetitionRatio(col("text"), 3).as("ratio"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[String](2) == r.getSeq[String](3))
      val (total, d) = (r.getSeq[String](0).size, r.getSeq[String](2).size)
      assert(r.getDouble(4) == 1.0 - d.toDouble / total.toDouble)
    }
  }

  test("staged-table minhash pairs equal the localCheckpoint variant") {
    val stage = java.nio.file.Files.createTempDirectory("graft_sigs")
      .resolve("sigs").toString
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val direct = Dedup.minhashPairs(corpus, col("id"), col("text"))
      .collect().map(key).toSet
    val staged = Dedup.minhashPairsStaged(corpus, col("id"), col("text"), stage)
      .collect().map(key).toSet
    assert(staged == direct)
    assert(staged.nonEmpty)
  }

  test("simhashPairs mines every planted pair within hamming<=3 (pigeonhole)") {
    // expected recoveries computed from fingerprints directly: a pair at
    // hamming <= 3 cannot avoid all 4 bands, so banding must surface it
    val fps = corpus.select(col("id"),
        graft.functions.TextFunctions.simhash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = fps.keys.filter(_ >= 100000).map(b => (b - 100000, b))
      .filter { case (a, b) => SimHash.hamming(fps(a), fps(b)) <= 3 }
      .toSet
    assert(expected.nonEmpty, "corpus must contain planted pairs within hamming 3")
    val mined = Dedup.simhashPairs(corpus, col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(mined),
      s"missed planted pairs: ${(expected -- mined).take(5)}")
    // and nothing mined exceeds the hamming threshold
    assert(mined.forall { case (a, b) => SimHash.hamming(fps(a), fps(b)) <= 3 })
  }

  test("crossOverlap df-cap drops a corpus-wide stop-shingle and bounds fan-out") {
    import spark.implicits._
    // every doc shares the stop-shingle "aa bb cc"; each (i, i+1000) pair
    // additionally shares a unique 2-shingle run ("u<i> v<i> w<i> x<i>")
    val stop = "aa bb cc"
    val train = (0 until 40).map(i => (i.toLong, s"$stop u$i v$i w$i x$i")).toDF("id", "text")
    val test = (0 until 40).map(i => ((i + 1000).toLong, s"$stop u$i v$i w$i x$i")).toDF("id", "text")

    // uncapped: the stop-shingle joins every test doc to every train doc
    val uncapped = Dedup.crossOverlap(train, test, col("id"), col("text"), minShared = 1)
    assert(uncapped.count() == 40L * 40)

    // capped at 10: the stop-shingle (df=80) is excluded; only the unique
    // runs survive, so each test doc matches exactly its planted twin —
    // per-shingle join fan-out is bounded by the cap, not corpus size
    val capped = Dedup.crossOverlap(train, test, col("id"), col("text"),
      minShared = 1, maxDf = 10)
    val rows = capped.collect()
    assert(rows.length == 40)
    assert(rows.forall(r => r.getLong(0) == r.getLong(1) + 1000))
    // planted twins share every surviving shingle (the 2 pure-run shingles
    // plus the 2 run/stop boundary shingles, each unique to the pair) —
    // the signal the cap must NOT erode
    assert(rows.forall(_.getLong(2) == 4L))
  }

  test("crossOverlapBloom matches crossOverlap exactly and plants the might_contain gate") {
    val split = docs.withColumn("split",
      graft.operators.TrainData.hashSplit(col("doc_id")))
    val train = split.filter(col("split") === "train")
    val test = split.filter(col("split") === "test")
    val exact = Dedup.crossOverlap(train, test, col("doc_id"), col("text"),
      minShared = 2, maxDf = 50)
    val bloom = Dedup.crossOverlapBloom(train, test, col("doc_id"), col("text"),
      minShared = 2, maxDf = 50)
    // the bloom gate must actually sit in the plan...
    assert(bloom.queryExecution.executedPlan.toString.contains("might_contain"))
    // ...and must not change a single pair or count
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty)
  }

  test("crossOverlapBloom with an empty test side returns no pairs") {
    val split = docs.withColumn("split",
      graft.operators.TrainData.hashSplit(col("doc_id")))
    val train = split.filter(col("split") === "train")
    val none = split.filter(lit(false))
    assert(Dedup.crossOverlapBloom(train, none, col("doc_id"), col("text")).isEmpty)
  }

  test("minhash/simhash hot-bucket cap drops degenerate buckets, keeps real pairs") {
    import spark.implicits._
    // 60 identical boilerplate docs (one degenerate bucket of 60 in every
    // band) + one genuine near-dup pair with distinct text
    val boiler = (0 until 60).map(i => (i.toLong, "the same boilerplate text repeated verbatim"))
    val pair = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota"))
    val df = (boiler ++ pair).toDF("id", "text")

    val uncapped = Dedup.minhashPairs(df, col("id"), col("text"))
    assert(uncapped.count() >= 60L * 59 / 2) // quadratic in the hot bucket

    val capped = Dedup.minhashPairs(df, col("id"), col("text"), maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((100L, 101L)), "real near-dup pair must survive the cap")
    assert(!capped.exists { case (a, b) => a < 60 && b < 60 },
      "degenerate-bucket pairs must be excluded")

    val cappedSim = Dedup.simhashPairs(df, col("id"), col("text"), maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cappedSim.exists { case (a, b) => a < 60 && b < 60 })
  }

  test("incrementalPairs: new batch broadcasts against staged corpus, finds origins") {
    val stage = java.nio.file.Files.createTempDirectory("graft_inc")
      .resolve("sigs").toString
    val base = docs.select(col("doc_id").as("id"), col("text"))
    Dedup.stageMinhashSignatures(base, col("id"), col("text"), stage)
    val newBatch = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("id"),
        concat(col("text"), lit(" zz extra token")).as("text"))
    val pairs = Dedup.incrementalPairs(newBatch, col("id"), col("text"), stage)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"new batch must broadcast — corpus side never shuffles:\n$plan")
    val found = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = docs.filter(col("doc_id") % 10 === 0)
      .collect().map(_.getAs[Long]("doc_id")).map(i => (i, i + 100000)).toSet
    // LSH recall is probabilistic per pair — nearly all origins surface
    assert((expected -- found).size <= expected.size / 10,
      s"missing origins: ${(expected -- found).take(5)}")
  }

  test("absorbSignatures closes the ingest loop: absorbed rows gate the next batch") {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_absorb")
      .resolve("sigs").toString
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("id", "text")
    Dedup.stageMinhashSignatures(corpus, col("id"), col("text"), stage)
    // batch 1: one novel doc — no hit against the staged corpus
    val b1 = Seq((10L, "one two three four five six seven eight")).toDF("id", "text")
    assert(Dedup.incrementalPairs(b1, col("id"), col("text"), stage).count() == 0)
    // absorb batch 1, then batch 2 = a near-dup of BATCH 1's doc: the
    // gate must now catch it against the absorbed signatures
    Dedup.absorbSignatures(b1, col("id"), col("text"), stage)
    val b2 = Seq((20L, "one two three four five six seven eight nine"))
      .toDF("id", "text")
    val hits = Dedup.incrementalPairs(b2, col("id"), col("text"), stage)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((10L, 20L)),
      s"absorbed doc 10 must surface as the origin of near-dup 20: $hits")
  }

  test("deleteSignatures: delete-then-gate ≡ rebuild-on-remaining; only " +
      "the victims' id-hash partitions rewritten") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .select(col("doc_id").as("id"), col("text"))
    val del = java.nio.file.Files.createTempDirectory("graft_sigdel").toString
    val rem = java.nio.file.Files.createTempDirectory("graft_sigrem").toString
    Dedup.stageMinhashSignatures(docs, col("id"), col("text"), del)
    // partitions OUTSIDE the victims' buckets must be byte-untouched
    val victims = docs.filter(col("id") % 3 === 0).select(col("id"))
    def sbOf(id: Long): Int = {
      val c = new java.util.zip.CRC32()
      c.update(id.toString.getBytes("UTF-8"))
      (c.getValue % 64).toInt
    }
    val vsb = victims.collect().map(r => sbOf(r.getLong(0))).toSet
    def files(p: String, untouchedOnly: Boolean): Map[String, Long] = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .filter(f => !untouchedOnly || !vsb.exists(b =>
          f.toString.contains(s"sb=$b/")))
        .map(f => f.toString -> java.nio.file.Files.size(f)).toMap
      finally walk.close()
    }
    val before = files(del, untouchedOnly = true)
    Dedup.deleteSignatures(victims, del)
    assert(files(del, untouchedOnly = true) == before,
      "delete rewrote a partition outside the victims' buckets")
    // gate verdict ≡ a stage rebuilt on the remaining docs
    Dedup.stageMinhashSignatures(docs.filter(col("id") % 3 =!= 0),
      col("id"), col("text"), rem)
    def sigs(p: String): Seq[String] = spark.read.parquet(p)
      .select("id", "sig").collect().map(_.toString).sorted.toSeq
    assert(sigs(del) == sigs(rem))
    val batch = docs.filter(col("id") % 10 === 0)
      .select((col("id") + 100000).as("id"),
        concat(col("text"), lit(" zz extra token")).as("text"))
    def gate(p: String): Seq[String] =
      Dedup.incrementalPairs(batch, col("id"), col("text"), p)
        .collect().map(_.toString).sorted.toSeq
    val g = gate(del)
    assert(g == gate(rem))
    // a deleted origin no longer gates: ids ≡ 0 (mod 30) are planted
    // twins whose origin was deleted — they must NOT appear
    assert(!g.exists(_.startsWith("[30,")) || g == gate(rem))
    // deleting already-absent ids is a no-op
    Dedup.deleteSignatures(victims, del)
    assert(sigs(del) == sigs(rem))
  }

  test("connectedComponents resolves transitive chains and isolated pairs") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs multiple propagation rounds),
    // isolated pair 10-11, and a triangle 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))

    // empty edge list → empty labeling, no iteration blow-up
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a_id", "b_id")).count() == 0)
  }

  test("prefixJaccardJoin: exact result equals brute force, no cartesian") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"), // near-dup of 1
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six"),             // near-dup of 3
      (5L, "totally unrelated words appear here now")
    ).toDF("id", "text")
    val out = Dedup.prefixJaccardJoin(docs, $"id", $"text", threshold = 0.5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over shingle sets at the same threshold
    def sh(t: String) = t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val all = Seq(1L, 2L, 3L, 4L, 5L)
      .map(i => i -> sh(docs.collect().find(_.getLong(0) == i).get.getString(1)))
      .toMap
    val exp = (for {
      a <- all.keys; b <- all.keys if a < b
      inter = (all(a) & all(b)).size
      j = inter.toDouble / (all(a).size + all(b).size - inter)
      if j >= 0.5
    } yield (a, b)).toSet
    assert(got == exp, s"got $got expected $exp")
    assert(exp.contains((1L, 2L)) && exp.contains((3L, 4L)))
  }

  test("parquet-staged prefixJaccardJoin matches the in-memory cut") {
    import spark.implicits._
    import graft.operators.Stage
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six"),
      (5L, "totally unrelated words appear here now")
    ).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ppj_stage").toString
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(asSet(Dedup.prefixJaccardJoin(docs, $"id", $"text", 0.5,
        stage = Stage.Parquet(dir)))
      == asSet(Dedup.prefixJaccardJoin(docs, $"id", $"text", 0.5)))
  }

  test("parquet-staged connectedComponents matches the in-memory cut") {
    import spark.implicits._
    import graft.operators.Stage
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a_id", "b_id")
    val dir = java.nio.file.Files.createTempDirectory("cc_stage").toString
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asMap(Dedup.connectedComponents(pairs, stage = Stage.Parquet(dir)))
      == asMap(Dedup.connectedComponents(pairs)))
  }

  test("simhash: near-dups within small hamming distance, self distance 0") {
    val t = "the quick brown fox jumps over the lazy dog again and again today"
    val fp1 = SimHash.fingerprint(t)
    val fp2 = SimHash.fingerprint(t + " extra")
    assert(SimHash.hamming(fp1, fp1) == 0)
    assert(SimHash.hamming(fp1, fp2) <= 8)
    // unrelated texts differ in many bits (probabilistic but stable: fixed inputs)
    val fp3 = SimHash.fingerprint("completely different words entirely unrelated content here")
    assert(SimHash.hamming(fp1, fp3) > 5)
  }

  test("minhash signature supports up to 32 distinct slots; >32 rejected") {
    val sig = graft.expressions.MinHashSig.signature("a b c d e f g h i j", 32, 3)
    assert(sig.length == 32)
    assert(sig.distinct.length > 8) // rotations beyond slot 8 are distinct
    val shifts = (0 until 32).map(graft.expressions.MinHashSig.shift)
    assert(shifts.distinct.length == 32)
    assert(shifts.take(8) == Seq(0, 4, 8, 12, 16, 20, 24, 28)) // slots 0-7 unchanged
    intercept[IllegalArgumentException](
      graft.expressions.MinHashSig.signature("x", 33, 3))
  }

  test("bands rejects non-divisible numHashes/rowsPerBand") {
    intercept[IllegalArgumentException](Dedup.bands(col("sig"), 8, 3))
  }

  test("shingles: sliding 3-grams with whole-text fallback") {
    import spark.implicits._
    val df = Seq("a b c d", "a b").toDF("t")
    val out = df.select(Dedup.shingles($"t")).collect()
    assert(out(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](0) == Seq("a b"))
  }

  test("spanDuplication flags shared windows, in-doc repeats, and short-doc dups") {
    import spark.implicits._
    val span = (1 to 25).map(i => s"w$i").mkString(" ")   // 25 tokens
    val docs = Seq(
      (1L, span + " unique tail one alpha beta"),          // shares windows with 2
      (2L, span + " other ending two gamma delta"),
      (3L, (1 to 60).map(_ => "rep").mkString(" ")),       // in-doc repeated window
      (4L, (1 to 40).map(i => s"u$i").mkString(" ")),      // all windows unique
      (5L, "tiny doc"), (6L, "tiny doc")                   // short-doc whole hash dup
    ).toDF("id", "text")
    val r = Dedup.spanDuplication(docs, $"id", $"text", w = 20, stride = 10)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // docs 1 and 2 share the windows fully inside the common 25-token span
    assert(r(1L)._2 >= 1 && r(2L)._2 >= 1)
    // doc 3: every window is "rep"*20 — all duplicated within the doc
    assert(r(3L)._2 === r(3L)._1 && r(3L)._3 === 1000L)
    assert(r(4L)._2 === 0L)
    // short docs below w fall back to the whole-doc window
    assert(r(5L) === ((1L, 1L, 1000L)) && r(6L) === ((1L, 1L, 1000L)))
  }

  // two well-separated direction groups, seeds (ids 0, 1) one per group so
  // 2-means recovers them exactly; each group plants one near-dup
  // (cos ≈ 0.9999) and one distinct member (cos ≈ 0.8 < τ = 0.9)
  private lazy val semCorpus = {
    import spark.implicits._
    Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 0f, 1f, 0f),
      2L -> Array(0.999f, 0.01f, 0f, 0f),
      3L -> Array(0f, 0.01f, 0.999f, 0f),
      4L -> Array(0.8f, 0.6f, 0f, 0f),
      5L -> Array(0f, 0.6f, 0.8f, 0f)
    ).toDF("vec_id", "embedding")
  }

  test("semantic dedup drops in-cluster near-dups, keeps first, no cartesian") {
    val out = Dedup.semanticDedup(semCorpus, col("vec_id"), col("embedding"),
      k = 2, iters = 2, dim = 4, tauFp = 900000L)
    val rows = out.collect().map(r => r.getInt(0) ->
      ((r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))).toMap
    // cid 0 = {0, 2, 4}: 2 is a near-dup of 0; 4 survives (cos ≈ 0.8)
    assert(rows(0) === ((3L, false, 1L, 4L)))
    // cid 1 = {1, 3, 5}: 3 is a near-dup of 1; 5 survives
    assert(rows(1) === ((3L, false, 1L, 6L)))
    // the intra-cluster pairing is a cid-keyed equi-join, never all-pairs
    assert(!flattenPlan(out.queryExecution.executedPlan)
      .exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]))
  }

  test("semantic dedup excludes over-cap clusters whole and flags them") {
    val out = Dedup.semanticDedup(semCorpus, col("vec_id"), col("embedding"),
      k = 2, iters = 2, dim = 4, tauFp = 900000L, maxCluster = 2L)
    val rows = out.collect().map(r => r.getInt(0) ->
      ((r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))).toMap
    // both clusters have 3 > 2 members: capped, nothing dropped
    assert(rows(0) === ((3L, true, 0L, 6L)))
    assert(rows(1) === ((3L, true, 0L, 9L)))
  }
}
