package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  /** Reference scan-with-skip application (the classic formulation) to
    * cross-check the fold in Bpe.applyMerge.
    */
  private def scanApply(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("first merges on a hand-computable corpus") {
    import spark.implicits._
    // "aaab" x3, "aab" x2: pairs (a,a): 3*2 + 2*1 = 8, (a,b): 5 → merge1 (a,a)
    // after: aaab -> [aa,a,b], aab -> [aa,b]
    // pairs: (aa,a): 3, (aa,b): 2, (a,b): 3 → tie 3: (a,b) vs (aa,a): lex 'a' < 'aa'
    // → merge2 (a,b)
    val docs = Seq("aaab aaab", "aaab aab", "aab").toDF("text")
    val (merges, vocab) = Bpe.train(docs, col("text"), 2)
    assert(merges.map(m => (m.rank, m.lhs, m.rhs, m.cnt)) ==
      Seq((1L, "a", "a", 8L), (2L, "a", "b", 3L)))
    val syms = vocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](r.fieldIndex("syms"))).toMap
    assert(syms("aaab") == Seq("aa", "ab"))
    assert(syms("aab") == Seq("aa", "b"))
  }

  test("applyMerge fold equals scan-with-skip on adversarial runs") {
    import spark.implicits._
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),
      (Seq("a", "a", "a", "a"), "a", "a"),
      (Seq("a", "b", "a", "b"), "a", "b"),
      (Seq("a", "a", "b"), "a", "b"),
      (Seq("x", "a", "a", "a", "y", "a", "a"), "a", "a"),
      (Seq("b"), "a", "b"),
      (Seq.empty[String], "a", "b"))
    cases.foreach { case (syms, l, r) =>
      val got = Seq(Tuple1(syms)).toDF("syms")
        .select(Bpe.applyMerge(col("syms"), l, r)).head.getSeq[String](0)
      assert(got == scanApply(syms, l, r), s"case $syms merge ($l,$r)")
    }
  }

  test("encode never lengthens: subwords per word shrink monotonically with merges") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val (_, vocab) = Bpe.train(docs, col("text"), 4)
    val bad = vocab.filter(size(col("syms")) > length(col("word"))).count()
    assert(bad == 0)
    // at least one word actually got shorter than its character count
    assert(vocab.filter(size(col("syms")) < length(col("word"))).count() > 0)
  }
}
