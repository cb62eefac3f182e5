package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainData
import graft.tables.Tables

class TrainDataSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  test("vocab counts match a hand-computed corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "a dog ran")
    ).toDF("id", "text")
    val v = TrainData.vocab(df, col("id"), col("text"), minTf = 1L, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // tf desc, token asc
    assert(v.take(4) == List(("cat", 2L, 2L), ("ran", 2L, 2L), ("the", 2L, 2L), ("a", 1L, 1L)))
    assert(v.contains(("dog", 1L, 1L)) && v.contains(("sat", 1L, 1L)))
  }

  test("vocab tf >= df always (a doc contributes at least one tf per df)") {
    val v = TrainData.vocab(docs, col("doc_id"), col("text"), minTf = 1L, topN = 1000)
      .collect()
    assert(v.nonEmpty)
    v.foreach(r => assert(r.getLong(1) >= r.getLong(2)))
  }

  test("hashSplit is deterministic, total, and roughly 80/10/10") {
    val n = docs.count()
    val parts = docs.select(TrainData.hashSplit(col("doc_id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts.values.sum == n)
    // deterministic under re-partitioning
    val parts2 = docs.repartition(7).select(TrainData.hashSplit(col("doc_id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts == parts2)
    // bucket fractions: multiplicative hash over sequential ids is roughly
    // uniform; train must dominate
    assert(parts("train") > parts.getOrElse("val", 0L))
    assert(parts("train") > parts.getOrElse("test", 0L))
  }

  test("a sample's split never changes when the corpus grows") {
    import spark.implicits._
    val small = (0L until 100L).toDF("id")
    val big = (0L until 1000L).toDF("id")
    val a = small.select(col("id"), TrainData.hashSplit(col("id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = big.select(col("id"), TrainData.hashSplit(col("id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { case (id, s) => assert(b(id) == s) }
  }

  test("stratifiedSample: per-class rates, deterministic, append-stable") {
    import org.apache.spark.sql.functions._
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val sampled = TrainData.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 20), defaultPct = 50)
    val ids1 = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    // rate per class is near target (hash buckets are uniform-ish)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, total) =>
      val target = if (lang == "en") 0.20 else 0.50
      val got = byLang.getOrElse(lang, 0L).toDouble / total
      // binomial std-dev at n=total; 4 sigma keeps tiny sf0.001 classes
      // (tens of rows) honest without flaking
      val tol = 4 * math.sqrt(target * (1 - target) / total)
      assert(math.abs(got - target) < tol, s"$lang: sampled $got vs target $target (n=$total)")
    }
    // membership is stable when the corpus doubles (append stability)
    val bigger = docs.unionAll(docs.withColumn("doc_id", col("doc_id") + 1000000))
    val ids2 = TrainData.stratifiedSample(bigger, col("lang"), col("doc_id"),
        Map("en" -> 20), defaultPct = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids2.filter(_ < 1000000) == ids1)
  }

  test("packSequences: bins partition each shard's token stream in id order") {
    import spark.implicits._
    // one shard (shards=1), 5 docs of 3 tokens each, seqLen 4:
    // starts at 0,3,6,9,12 -> bins 0,0,1,2,3
    val docs = (1 to 5).map(i => (i.toLong, "a b c")).toDF("id", "text")
    val out = TrainData.packSequences(docs, col("id"), col("text"),
        seqLen = 4L, shards = 1)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 2L, 6L), (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)))

    // append stability: adding higher ids never changes existing bins
    val more = (1 to 8).map(i => (i.toLong, "a b c")).toDF("id", "text")
    val before = TrainData.packSequences(docs, col("id"), col("text"), 4L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val after = TrainData.packSequences(more, col("id"), col("text"), 4L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every (shard, bin) present before keeps at least its docs; ids 1-5
    // keep their bin assignment (only tails extend)
    assert(before.forall { case (k, n) => after.getOrElse(k, 0L) >= n })
  }

  test("redactPii scrubs emails and phones, leaves clean text alone") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val df = Seq(
      "mail me at jo.doe+x@sub.example.org or call 555-123-4567 twice 555-999-0000",
      "no pii here at all").toDF("t")
    val out = df.select(TextFunctions.redactPii(col("t"))).collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> or call <PHONE> twice <PHONE>")
    assert(out(1) == "no pii here at all")
  }

  test("sessionize splits on gaps over the timeout only") {
    import spark.implicits._
    // user 1: events at 0s, 10s, 2000s (gap > 30min at micros scale? use us)
    val gap = 1800000000L // 30 min in us
    val df = Seq(
      (1L, 1L, 0L), (1L, 2L, 1000000L), (1L, 3L, gap + 2000000L),
      (2L, 4L, 0L)
    ).toDF("user_id", "event_id", "ts_us")
    val out = TrainData.sessionize(df, col("user_id"), col("ts_us"),
        col("event_id"), gap)
      .orderBy(col("user"))
      .collect()
    // user 1: two sessions (first has 2 events), user 2: one session
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 3L && out(0).getLong(3) == 2L)
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 1L && out(1).getLong(3) == 1L)
  }

  test("sourceMix: sqrt-temperature quotas flatten the head; partition-stable") {
    import spark.implicits._
    val rows = (1 to 100).map(i => ("A", i.toLong)) ++
      (1 to 25).map(i => ("B", 1000L + i))
    val df = rows.toDF("src", "id")
    // weights √100 : √25 = 10 : 5 → budget 30 splits 20/10 (proportional
    // sampling would have given 24/6 — the head is flattened)
    val by = TrainData.sourceMix(df, col("src"), col("id"), 30L)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by === Map("A" -> 20L, "B" -> 10L))
    // hash-rank selection is stable under re-partitioning
    val a = TrainData.sourceMix(df, col("src"), col("id"), 30L)
      .select(col("source"), col("id")).collect().toSet
    val b = TrainData.sourceMix(df.repartition(7), col("src"), col("id"), 30L)
      .select(col("source"), col("id")).collect().toSet
    assert(a === b)
  }

  test("groupedSplit: every component member shares its group's split") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("id", "text")
    // components {1,2,3} -> 1 and {10,11} -> 10; the rest are singletons
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    val out = TrainData.groupedSplit(docs, col("id"), comps)
      .select(col("id"), col("group_id"), col("split")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(Set(out(1L), out(2L), out(3L)).size == 1, "component split is shared")
    assert(out(10L) == out(11L))
    assert(out(7L)._1 == 7L, "singletons keep their own id as group")
    // group label decides the split: member 2's split equals what its
    // LABEL would get as a plain document, even if 2's own hash differs
    val plain = docs.select(col("id"), TrainData.hashSplit(col("id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(2L)._2 == plain(1L))
  }

  test("kfoldAssign: folds dense in [0,k), deterministic") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val folds = df.select(TrainData.kfoldAssign(col("id"), 5).as("f"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(folds == Set(0L, 1L, 2L, 3L, 4L))
    val a = df.select(col("id"), TrainData.kfoldAssign(col("id"), 5)).collect().toSet
    val b = df.repartition(9)
      .select(col("id"), TrainData.kfoldAssign(col("id"), 5)).collect().toSet
    assert(a == b)
  }

  test("unigramLmScore: hand-computed corpus frequencies, gibberish low") {
    import spark.implicits._
    // corpus tf: the=3, cat=2, sat=2, xqzt=1, vvkp=1
    val docs = Seq(
      (1L, "the cat sat"),         // tfs 3+2+2 = 7, n=3  -> lm 2333
      (2L, "the cat sat the"),     // tfs 3+2+2+3 = 10, n=4 -> lm 2500
      (3L, "xqzt vvkp")            // tfs 1+1 = 2, n=2 -> lm 1000
    ).toDF("id", "t")
    val out = TrainData.unigramLmScore(docs, col("id"), col("t"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 7L, 2333L)))
    assert(out(2L) == ((4L, 10L, 2500L)))
    assert(out(3L) == ((2L, 2L, 1000L)))
    // the filter property: gibberish scores strictly below natural text
    assert(out(3L)._3 < out(1L)._3 && out(3L)._3 < out(2L)._3)
  }

  test("bigramLmScore: fluent pairs score high, shuffled text drops") {
    import spark.implicits._
    // corpus bigrams: "the cat"=2, "cat sat"=2, "cat the"=1;
    // prefix counts: the·=2, cat·=3
    val docs = Seq(
      (1L, "the cat sat"),      // p(cat|the)=2/2, p(sat|cat)=2/3 -> (1000000 + 666666)/2
      (2L, "the cat sat"),
      (3L, "cat the cat")       // p(the|cat)=1/3, p(cat|the)=2/2 -> (333333 + 1000000)/2
    ).toDF("id", "t")
    val out = TrainData.bigramLmScore(docs, col("id"), col("t"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 1666666L, 833333L)))
    assert(out(1L) == out(2L))
    assert(out(3L) == ((2L, 1333333L, 666666L)))
    // the fluency property: the corpus-frequent word order outscores the
    // shuffled one even though both use exactly the same words
    assert(out(3L)._3 < out(1L)._3)
  }

  test("hash buckets and folds match unbounded math past the Long wrap point") {
    import spark.implicits._
    // id * 2654435761 overflows Long for ids >= ~3.47e9 (ANSI mode would
    // throw; pre-ANSI it wrapped negative, landing folds outside [0,k)
    // and silently dropping rows from weightedSample). The split multiply
    // must equal unbounded-precision arithmetic over the whole domain.
    val ids = Seq(1L, 99L, 3470000000L, 4000000000L,
      Long.MaxValue / 2654435761L + 1, 9000000000L, Long.MaxValue)
    val out = ids.toDF("id").select(col("id"),
      TrainData.hashBucket(col("id")).as("b"),
      TrainData.kfoldAssign(col("id"), 5).as("f")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    ids.foreach { i =>
      val h = (BigInt(i) * BigInt(2654435761L)) mod BigInt(4294967296L)
      assert(out(i) == ((h % 100).toLong, (h % 5).toLong),
        s"id $i: got ${out(i)}, unbounded math says (${h % 100}, ${h % 5})")
    }
  }

  test("weightedSample: keeps exactly the rows whose bucket beats their pct") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, (i % 100).toInt)).toDF("id", "pct")
    val kept = TrainData.weightedSample(df, col("id"), col("pct"))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val expected = (1L to 300L).filter { i =>
      i * 2654435761L % 4294967296L % 100 < (i % 100)
    }.toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < 300, "a weighted sample, not all/none")
  }

  test("piiScrub redacts every email and phone, counts them, leaves the rest") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to a.b-c@mail.example.org or (555) 123-4567 today"),
      (2L, "two mails x@y.io z@w.co, no phone"),
      (3L, "clean text, nothing to redact"),
      (4L, "edge (12) 345-6789 is not a phone, nor is user@nodot")
    ).toDF("id", "text")
    val out = TrainData.piiScrub(df, $"id", $"text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((1, 1, "write to <EMAIL> or <PHONE> today")))
    assert(out(2L)._1 == 2 && out(2L)._2 == 0)
    assert(out(2L)._3 == "two mails <EMAIL> <EMAIL>, no phone")
    assert(out(3L) == ((0, 0, "clean text, nothing to redact")))
    assert(out(4L)._1 == 0 && out(4L)._2 == 0, "near-misses must not match")
  }

  test("dropBoilerplate drops high-df lines and preserves remaining order") {
    import spark.implicits._
    val footer = "all rights reserved"
    val docs = (1L to 60L).map(i =>
        (i, s"unique head $i\n$footer\nunique tail $i"))
      .toDF("id", "text")
    val out = TrainData.dropBoilerplate(docs, $"id", $"text", dfCap = 50)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out.size == 60)
    (1L to 60L).foreach { i =>
      assert(out(i) == ((2, 1, s"unique head $i\nunique tail $i")))
    }
    // below the cap nothing drops
    val loose = TrainData.dropBoilerplate(docs, $"id", $"text", dfCap = 61)
      .agg(org.apache.spark.sql.functions.sum($"n_dropped")).head().getLong(0)
    assert(loose == 0L)
  }

  test("lrQualityTrain separates a linearly-separable corpus and is partition-invariant") {
    import spark.implicits._
    // long stopword-rich docs labeled positive, short stopword-free ones
    // negative — separable on the length + stopword-density features
    val docs = ((1L to 40L).map(i =>
        (i, ("the of and to in a word" + s" filler$i") * 12, true)) ++
      (41L to 80L).map(i => (i, s"zx$i qq yy", false)))
      .toDF("id", "text", "label")
    val out = TrainData.lrQualityTrain(docs, $"id", $"text", $"label",
      steps = 3).head()
    val acc = out.getAs[Long]("acc_fp")
    assert(acc == 1000L, s"separable corpus must classify perfectly, got $acc")
    // weights must match bit-for-bit under a different partitioning (the
    // gradient is an exact integer sum in any order)
    val out2 = TrainData.lrQualityTrain(docs.repartition(7), $"id", $"text",
      $"label", steps = 3).head()
    assert((0 until 4).forall(j => out.getLong(j) == out2.getLong(j)))
    assert(out.getAs[Long]("n_correct") == out2.getAs[Long]("n_correct"))
  }

  test("lrQualityTrain step count changes the weights (training actually iterates)") {
    import spark.implicits._
    val docs = ((1L to 20L).map(i => (i, "the of and common words here", true)) ++
      (21L to 40L).map(i => (i, s"rare$i", false))).toDF("id", "text", "label")
    val w1 = TrainData.lrQualityTrain(docs, $"id", $"text", $"label", steps = 1)
      .head()
    val w3 = TrainData.lrQualityTrain(docs, $"id", $"text", $"label", steps = 3)
      .head()
    assert((0 until 4).exists(j => w1.getLong(j) != w3.getLong(j)),
      "more gradient steps must move the weights")
  }

  test("unimaxAlloc: waterfill takes small sources whole, re-spends their share") {
    import spark.implicits._
    // capacities (2 epochs): a=4, b=10, c=100; budget 30 → a and b capped
    // (4·3 ≤ 30, 10·2 ≤ 26), c gets the re-spent pool 30−14 = 16
    val docs = ((1L to 2L).map(i => (i, "a")) ++ (1L to 5L).map(i => (i, "b")) ++
      (1L to 50L).map(i => (i, "c"))).toDF("id", "source")
    val out = TrainData.unimaxAlloc(docs, $"source", budget = 30L, epochsCap = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(out("a") === ((true, 4L, 2000L, false)))
    assert(out("b") === ((true, 10L, 2000L, false)))
    assert(out("c") === ((false, 16L, 320L, false)))
    // the budget is exactly spent — the property sourceMix's quota loses
    assert(out.values.map(_._2).sum == 30L)
  }

  test("unimaxAlloc: over-capacity budget flags underfilled; remainder spreads in order") {
    import spark.implicits._
    val docs = ((1L to 2L).map(i => (i, "a")) ++ (1L to 5L).map(i => (i, "b")) ++
      (1L to 50L).map(i => (i, "c"))).toDF("id", "source")
    val over = TrainData.unimaxAlloc(docs, $"source", budget = 200L, epochsCap = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(4), r.getBoolean(6)))).toMap
    assert(over("a") === ((4L, true)) && over("b") === ((10L, true)) &&
      over("c") === ((100L, true)))
    // equal capacities, budget 25 over 3×20: share 8, remainder 1 to the
    // first source in (capacity, source) order
    val eq = ((1L to 10L).map(i => (i, "d")) ++ (1L to 10L).map(i => (i, "e")) ++
      (1L to 10L).map(i => (i, "f"))).toDF("id", "source")
    val r = TrainData.unimaxAlloc(eq, $"source", budget = 25L, epochsCap = 2)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(r === Map("d" -> 9L, "e" -> 8L, "f" -> 8L))
  }

  test("unimaxAlloc invariants hold over a sweep of budgets, caps, profiles") {
    import spark.implicits._
    val profiles = Seq(
      Seq("a" -> 1, "b" -> 1, "c" -> 1),
      Seq("a" -> 3, "b" -> 7, "c" -> 20, "d" -> 100),
      Seq("a" -> 50, "b" -> 50),
      Seq("solo" -> 10),
      (0 until 12).map(i => s"s$i" -> (i + 1)))
    for (p <- profiles; budget <- Seq(1L, 5L, 17L, 60L, 1000L); cap <- Seq(1, 3)) {
      val ctx = s"profile=$p budget=$budget cap=$cap"
      val docs = p.flatMap { case (s, n) => (1 to n).map(i => (i.toLong, s)) }
        .toDF("id", "source")
      val rows = TrainData.unimaxAlloc(docs, $"source", budget, cap).collect()
      val capTotal = p.map(_._2.toLong * cap).sum
      // exact spend up to capacity; never over-allocate a source
      assert(rows.map(_.getLong(4)).sum == math.min(budget, capTotal), ctx)
      rows.foreach(r => assert(r.getLong(4) >= 0 &&
        r.getLong(4) <= r.getLong(2), ctx))
      val un = rows.filter(!_.getBoolean(3)).map(_.getLong(4))
      // uncapped sources share uniformly (within the integer remainder)
      if (un.nonEmpty) assert(un.max - un.min <= 1, ctx)
      // waterfill order: every capped capacity fits under the water line
      val cappedCaps = rows.filter(_.getBoolean(3)).map(_.getLong(2))
      if (un.nonEmpty && cappedCaps.nonEmpty)
        assert(cappedCaps.max <= un.min, ctx)
      assert(rows.forall(_.getBoolean(6) == (capTotal < budget)), ctx)
    }
  }

  test("perplexityBuckets: reference-like docs head, gibberish tail") {
    import spark.implicits._
    // reference slice = ids 0-2 ("the the the", ref_tf(the)=9). Scores:
    // ref-pure docs (9+1)*1000, half-OOV (10+1)/2*1000, all-OOV 1*1000.
    val docs = Seq(
      (0L, "the the the", true), (1L, "the the the", true),
      (2L, "the the the", true),
      (3L, "the zz", false), (4L, "the qq", false), (5L, "the ww", false),
      (6L, "zz yy xx", false), (7L, "aa bb cc", false),
      (8L, "dd ee ff", false)).toDF("id", "text", "ref")
    val out = TrainData.perplexityBuckets(docs, $"id", $"text", $"ref")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    // head = the ref-pure docs, middle = half-OOV, tail = gibberish;
    // thirds land exactly because scores split 10000 / 5500 / 1000
    assert(out("head") === ((3L, 3L, 10000L, 10000L)))
    assert(out("middle") === ((3L, 12L, 5500L, 5500L)))
    assert(out("tail") === ((3L, 21L, 1000L, 1000L)))
  }

  test("perplexityBuckets: zero-token docs land in the 'empty' audit bucket") {
    import spark.implicits._
    // two unscorable docs (no tokens) must not vanish: they get their own
    // bucket, the tertile cuts over the scored docs are unchanged, and
    // bucket counts still sum to the corpus size
    val docs = Seq(
      (0L, "the the the", true), (1L, "the the the", true),
      (2L, "the the the", true),
      (3L, "the zz", false), (4L, "the qq", false), (5L, "the ww", false),
      (6L, "zz yy xx", false), (7L, "aa bb cc", false),
      (8L, "dd ee ff", false),
      (9L, "", false), (10L, "   ", false)).toDF("id", "text", "ref")
    val out = TrainData.perplexityBuckets(docs, $"id", $"text", $"ref")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("empty") === ((2L, 19L)))
    assert(out("head")._1 === 3L && out("middle")._1 === 3L &&
      out("tail")._1 === 3L)
    assert(out.values.map(_._1).sum === 11L)
  }

  test("perplexityBuckets: partition-invariant and total over the corpus") {
    val a = TrainData.perplexityBuckets(docs, col("doc_id"), col("text"),
      col("lang") === "en").collect()
    val b = TrainData.perplexityBuckets(docs.repartition(7), col("doc_id"),
      col("text"), col("lang") === "en").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    assert(a.map(_.getLong(1)).sum == docs.count())
  }
}
