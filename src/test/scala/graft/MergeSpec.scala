package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge

class MergeSpec extends SparkSpec {

  test("merge applies update / insert / keep semantics") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val source = Seq((2L, "b2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "bal")
    val out = Merge.merge(target, source, Seq("k"))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0),
      (4L, "d", 40.0)))
  }

  test("merge update replaces wholesale, including source nulls") {
    import spark.implicits._
    val target = Seq((1L, Option("a"))).toDF("k", "name")
    val source = Seq((1L, Option.empty[String])).toDF("k", "name")
    val out = Merge.merge(target, source, Seq("k")).collect()
    assert(out.length == 1 && out.head.isNullAt(1))
  }

  test("merge rejects mismatched schemas") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "name")
    val source = Seq((1L, "a")).toDF("k", "other")
    intercept[IllegalArgumentException] {
      Merge.merge(target, source, Seq("k"))
    }
  }

  test("scd2 collapses same-state runs into intervals with correct bounds") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val changes = Seq(
      (1L, "view", ts(0), 1L), (1L, "view", ts(1), 2L), (1L, "click", ts(2), 3L),
      (1L, "view", ts(3), 4L),
      (2L, "buy", ts(5), 5L)
    ).toDF("u", "state", "ts", "eid")
    val out = Merge.scd2(changes, $"u", $"state", $"ts", $"eid")
      .orderBy($"key", $"valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4))).toSeq
    assert(out == Seq(
      (1L, "view", ts(0), Some(ts(2)), false),   // run of 2 views collapsed
      (1L, "click", ts(2), Some(ts(3)), false),
      (1L, "view", ts(3), None, true),           // state can recur as new run
      (2L, "buy", ts(5), None, true)))
  }

  test("scd2 same-timestamp changes resolve by tiebreak deterministically") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val changes = Seq((1L, "b", t, 2L), (1L, "a", t, 1L)).toDF("u", "state", "ts", "eid")
    val out = Merge.scd2(changes, $"u", $"state", $"ts", $"eid")
      .orderBy($"valid_from", $"state").collect()
    // eid=1 ("a") sorts first, then eid=2 ("b") — "b" is the open interval
    assert(out.length == 2)
    assert(out.map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(!out(0).getBoolean(4) && out(1).getBoolean(4))
  }

  test("streaming CDC-merge snapshot equals batch latest-per-key") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val s = graft.streaming.Streaming.streamSession(spark)
    val src = graft.streaming.Streaming.stageSplitSource(s, sf0001, "events", "ts")
    val schema = graft.tables.Tables.events(s, sf0001).schema
    val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(src)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val snap = graft.streaming.Streaming.drainMergeSnapshot(stream,
      sys.props("java.io.tmpdir") + "/graft_test_merge_snap",
      keys = Seq("user_id"), orderCols = Seq("ts", "event_id"))
    val expected = graft.tables.Tables.events(s, sf0001)
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"))
    val got = snap.select(col("user_id"), col("event_id"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("scd2 plans exactly one shuffle — both windows share the key partitioning") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val changes = Seq((1L, "a", t, 1L)).toDF("u", "state", "ts", "eid")
    val plan = Merge.scd2(changes, $"u", $"state", $"ts", $"eid")
      .queryExecution.executedPlan.toString
    val exchanges = "(?i)exchange".r.findAllIn(plan).length -
      "(?i)reusedexchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single shuffle, plan:\n$plan")
  }

  test("merge plans one join over distributed relations, no cartesian") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "name")
    val source = Seq((2L, "b")).toDF("k", "name")
    val plan = Merge.merge(target, source, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }

  test("corpusDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "fp")
    val neu = Seq((2L, "y"), (3L, "z2"), (4L, "w")).toDF("id", "fp")
    val out = Merge.corpusDiff(old, neu, $"id", $"fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }
}
