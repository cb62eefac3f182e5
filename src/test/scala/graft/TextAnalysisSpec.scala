package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, TextFunctions}
import graft.operators.{Dedup, Knn}
import graft.oracle.OracleGen.QueryVec
import graft.tables.Tables

class TextAnalysisSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, text: String): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).head()
  }

  test("langId: stopword argmax with priority and und fallback") {
    assert(one(TextAnalysis.langId(col("text")), "the cat of the house").getString(0) == "en")
    assert(one(TextAnalysis.langId(col("text")), "el perro de los vecinos").getString(0) == "es")
    assert(one(TextAnalysis.langId(col("text")), "der hund und die katze").getString(0) == "de")
    assert(one(TextAnalysis.langId(col("text")), "xyzzy qwerty").getString(0) == "und")
    // 'la' is in both es and fr lists: priority order resolves to es
    assert(one(TextAnalysis.langId(col("text")), "la la la").getString(0) == "es")
  }

  test("qualityScore bounded in [0,1], longer+stopworded text scores higher") {
    val short = one(TextAnalysis.qualityScore(col("text")), "x").getDouble(0)
    val rich = one(TextAnalysis.qualityScore(col("text")),
      ("the quick brown fox and a dog of the town in a field " * 6)).getDouble(0)
    assert(short >= 0.0 && short <= 1.0 && rich >= 0.0 && rich <= 1.0)
    assert(rich > short)
  }

  test("bpeTokenCount splits letter runs, digits, punctuation") {
    // "hello world42!" → hello, world, 4, 2, ! = 5
    assert(one(TextAnalysis.bpeTokenCount(col("text")), "hello world42!").getLong(0) == 5L)
    assert(one(TextAnalysis.bpeTokenCount(col("text")), "").getLong(0) == 0L)
  }

  test("fingerprint32 is stable, prefix-sensitive, padding-insensitive beyond 32 chars") {
    val f = (s: String) => one(TextAnalysis.fingerprint32(col("text")), s).getLong(0)
    val a = f("some document text that is long enough to exceed thirty-two characters")
    assert(a == f("some document text that is long enough to exceed thirty-two characters"))
    // identical first 32 chars → identical fingerprint
    assert(a == f("some document text that is long ___different tail___"))
    assert(a != f("Xome document text that is long enough"))
    assert(f("") == f("   ")) // cleaned/padded to all-spaces
  }

  test("knn properties: ≤ k rows, ascending, deterministic (SURVEY §5.3)") {
    val emb = Tables.embeddings(spark, sf0001)
    val r1 = Knn.knn(emb, col("embedding"), col("vec_id"), QueryVec.values, 7).collect()
    val r2 = Knn.knn(emb, col("embedding"), col("vec_id"), QueryVec.values, 7).collect()
    assert(r1.length <= 7)
    val d = r1.map(_.getAs[Double]("distance"))
    assert(d.sameElements(d.sorted))
    assert(r1.map(_.getLong(0)).sameElements(r2.map(_.getLong(0))))
  }

  test("dedup idempotence: exact dedup of deduped output is a no-op (SURVEY §5.3)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "t")
    val once = Dedup.exact(df, $"id", $"t")
      .select($"keep_id".as("id"), $"t")
    val twice = Dedup.exact(once, $"id", $"t")
    assert(twice.count() == once.count())
    assert(twice.agg(sum($"n_dups")).head().getLong(0) == once.count())
  }

  test("tokenCount and simhash column functions agree with pure impls") {
    assert(one(TextFunctions.tokenCount(col("text")), "  A  b\tc ").getLong(0) == 3L)
    assert(one(TextFunctions.simhash(col("text")), "hello there").getLong(0) ==
      graft.expressions.SimHash.fingerprint("hello there"))
  }
}
