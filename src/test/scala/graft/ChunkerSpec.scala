package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunker

class ChunkerSpec extends SparkSpec {

  test("overlapping windows with stride; tail window shorter") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("id", "t")
    val out = Chunker.chunk(df, $"id", $"t", chunkSize = 3, stride = 2)
      .orderBy($"chunk_idx").collect()
    assert(out.map(_.getAs[String]("chunk")).toSeq ==
      Seq("a b c", "c d e", "e"))
    assert(out.map(_.getAs[Long]("chunk_tokens")).toSeq == Seq(3L, 3L, 1L))
  }

  test("empty text produces no chunks; single token one chunk") {
    import spark.implicits._
    val df = Seq((1L, "   "), (2L, "hello")).toDF("id", "t")
    val out = Chunker.chunk(df, $"id", $"t").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("chunk") == "hello")
  }

  test("chunk count is ceil(n/stride) formula") {
    import spark.implicits._
    val text = (1 to 25).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "t")
    val n = Chunker.chunk(df, $"id", $"t", chunkSize = 20, stride = 10).count()
    assert(n == 3) // windows at 0, 10, 20
  }
}
