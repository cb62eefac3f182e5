package graft

import org.apache.spark.sql.functions._

import graft.operators.Rag

class MmrSpec extends SparkSpec {

  test("mmr skips a near-duplicate of the top hit in favor of diversity") {
    import spark.implicits._
    // A and B are identical directions (sim 1.0); C is orthogonal. Pure
    // top-2 by distance = (A, B); MMR must pick (A, C):
    //   step2 score(B) = 0.5·(−0.11) − 0.5·1.0 = −0.555
    //   step2 score(C) = 0.5·(−0.50) − 0.5·0.0 = −0.250  → C wins
    val cand = Seq(
      (1L, Array(1.0, 0.0), 0.10),
      (2L, Array(1.0, 0.0), 0.11),
      (3L, Array(0.0, 1.0), 0.50)
    ).toDF("id", "vec", "dist")
    val out = Rag.mmrSelect(cand, $"id", $"vec", $"dist", k = 2)
      .orderBy($"rnk").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 3L)))
  }

  test("mmr with lambda=1 degenerates to pure relevance ranking") {
    import spark.implicits._
    val cand = Seq(
      (1L, Array(1.0, 0.0), 0.10),
      (2L, Array(1.0, 0.0), 0.11),
      (3L, Array(0.0, 1.0), 0.50)
    ).toDF("id", "vec", "dist")
    val out = Rag.mmrSelect(cand, $"id", $"vec", $"dist", k = 3, lambda = 1.0)
      .orderBy($"rnk").collect().map(_.getLong(1)).toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("mmr runs as one aggregate pass, not k sequential jobs") {
    import spark.implicits._
    val cand = (1L to 30L).map(i =>
        (i, Array(math.sin(i.toDouble), math.cos(i.toDouble)), i / 30.0))
      .toDF("id", "vec", "dist")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val counter = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      val out = Rag.mmrSelect(cand, $"id", $"vec", $"dist", k = 10).collect()
      assert(out.length == 10)
      Thread.sleep(1000) // listener bus is async; job starts have long fired
    } finally spark.sparkContext.removeSparkListener(counter)
    // one aggregate query — a handful of AQE stage jobs at most, never
    // the former k-step loop's ~2k driver-sequenced jobs
    assert(jobs.get() <= 4, s"expected a single-pass MMR, saw ${jobs.get()} jobs")
  }

  test("mmr selects exactly k distinct candidates, deterministic on ties") {
    import spark.implicits._
    // all equidistant and mutually orthogonal-ish: ties break on lowest id
    val cand = Seq(
      (5L, Array(1.0, 0.0, 0.0), 0.3),
      (2L, Array(0.0, 1.0, 0.0), 0.3),
      (9L, Array(0.0, 0.0, 1.0), 0.3)
    ).toDF("id", "vec", "dist")
    val out = Rag.mmrSelect(cand, $"id", $"vec", $"dist", k = 3)
      .collect().map(_.getLong(1)).toSeq
    assert(out.length == 3 && out.toSet == Set(2L, 5L, 9L))
    assert(out.head == 2L) // lowest id wins the all-tied first pick
  }
}
