package graft

/** The scale-proof harness's own invariants: the plan-topology
  * canonicalization that lets AQE strategy switches pass while real
  * shape mutations fail, the one-row-scalar exemption in the unsafe-op
  * sweep, and determinism of the corpus generators (a nondeterministic
  * generator would make the 1×/10×/100× timings incomparable runs).
  */
class ScaleBenchSpec extends SparkSpec {

  test("topologyPlan: broadcast->shuffle strategy switch is identity") {
    val bhj =
      """*(2) Project [a#1, b#2]
        |+- *(2) BroadcastHashJoin [sh#3], [sh#4], Inner, BuildRight, false
        |   :- *(2) Filter isnotnull(sh#3)
        |   :  +- Scan parquet [sh#3] Location: file:/tmp/x
        |   +- BroadcastExchange HashedRelationBroadcastMode(List(input[0, string, true]),false), [plan_id=12]
        |      +- *(1) Filter isnotnull(sh#4)
        |         +- Scan parquet [sh#4] Location: file:/tmp/x""".stripMargin
    val smj =
      """*(5) Project [a#9, b#8]
        |+- *(5) SortMergeJoin [sh#7], [sh#6], Inner
        |   :- *(3) Sort [sh#7 ASC NULLS FIRST], false, 0
        |   :  +- Exchange hashpartitioning(sh#7, 32), ENSURE_REQUIREMENTS, [plan_id=44]
        |   :     +- *(2) Filter isnotnull(sh#7)
        |   :        +- Scan parquet [sh#7] Location: file:/tmp/y
        |   +- *(4) Sort [sh#6 ASC NULLS FIRST], false, 0
        |      +- Exchange hashpartitioning(sh#6, 32), ENSURE_REQUIREMENTS, [plan_id=45]
        |         +- *(1) Filter isnotnull(sh#6)
        |            +- Scan parquet [sh#6] Location: file:/tmp/y""".stripMargin
    assert(ScaleBench.topologyPlan(bhj) == ScaleBench.topologyPlan(smj))
  }

  test("topologyPlan: a genuinely different join topology still differs") {
    val one = "*(1) BroadcastHashJoin [a#1], [b#2], Inner, BuildRight, false"
    val other = "*(1) BroadcastHashJoin [a#1, c#3], [b#2, d#4], Inner, BuildRight, false"
    assert(ScaleBench.topologyPlan(one) != ScaleBench.topologyPlan(other))
  }

  test("unsafeOps: scalar-broadcast BNLJ is exempt, data-side BNLJ is not") {
    val scalar =
      """BroadcastNestedLoopJoin BuildRight, Cross
        |:- Scan parquet [x#1]
        |+- BroadcastExchange IdentityBroadcastMode, [plan_id=3]
        |   +- HashAggregate(keys=[], functions=[count(1)], output=[n#2L])""".stripMargin
    assert(ScaleBench.unsafeOps(scalar).isEmpty)
    val data =
      """BroadcastNestedLoopJoin BuildRight, Inner, (a#1 < b#2)
        |:- Scan parquet [a#1]
        |+- BroadcastExchange IdentityBroadcastMode, [plan_id=3]
        |   +- Scan parquet [b#2]""".stripMargin
    assert(ScaleBench.unsafeOps(data) == Seq("BroadcastNestedLoopJoin"))
    assert(ScaleBench.unsafeOps("CartesianProduct\n+- whatever") ==
      Seq("CartesianProduct"))
  }

  test("corpus generators are deterministic and planted structure holds") {
    import org.apache.spark.sql.functions._
    val a = ScaleBench.genDocuments(spark, 200).collect().map(_.toString).sorted
    val b = ScaleBench.genDocuments(spark, 200).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // planted near-dups: every id%10==7 doc shares its base's text prefix
    val docs = ScaleBench.genDocuments(spark, 200)
    val pairs = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id").as("c_id"), col("text").as("c_text"))
      .join(docs.select((col("doc_id") + 7).as("c_id"), col("text").as("b_text")), "c_id")
    assert(pairs.count() == 20)
    assert(pairs.filter(col("c_text").startsWith(col("b_text"))).count() == 20)
    val e1 = ScaleBench.genEmbeddings(spark, 100).collect().map(_.toString).sorted
    val e2 = ScaleBench.genEmbeddings(spark, 100).collect().map(_.toString).sorted
    assert(e1.sameElements(e2))
  }
}
