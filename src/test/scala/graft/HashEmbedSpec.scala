package graft

import graft.expressions.HashEmbed

class HashEmbedSpec extends SparkSpec {

  test("embedding is unit-norm for non-empty text") {
    val e = HashEmbed.embed("hello world foo", 64)
    assert(e.length == 64)
    val norm = math.sqrt(e.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-12)
  }

  test("empty / whitespace text embeds to the zero vector") {
    assert(HashEmbed.embed("", 64).forall(_ == 0.0))
    assert(HashEmbed.embed("   \t\n ", 64).forall(_ == 0.0))
  }

  test("deterministic and case/whitespace-normalizing") {
    val a = HashEmbed.embed("Hello   WORLD", 16)
    val b = HashEmbed.embed("hello world", 16)
    assert(a.sameElements(b))
  }

  test("bucket in range, sign is ±1") {
    for (t <- Seq("a", "hello", "ünïcödé", "123", "x" * 100)) {
      val (b, s) = HashEmbed.bucketSign(t, 64)
      assert(b >= 0 && b < 64)
      assert(s == 1 || s == -1)
    }
  }

  test("column expression matches the pure-Scala implementation") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val df = Seq((1L, "spark hash embed test"), (2L, "")).toDF("id", "t")
    val rows = df.select($"id", TextFunctions.hashEmbed($"t", 16)).orderBy($"id").collect()
    assert(rows(0).getSeq[Double](1) == HashEmbed.embed("spark hash embed test", 16).toSeq)
    assert(rows(1).getSeq[Double](1) == Seq.fill(16)(0.0))
  }

  test("null text yields null embedding") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val df = Seq((1L, Option.empty[String])).toDF("id", "t")
    val rows = df.select(TextFunctions.hashEmbed($"t", 8)).collect()
    assert(rows(0).isNullAt(0))
  }
}
