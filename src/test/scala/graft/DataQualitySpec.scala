package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.operators.DataQuality.RowRule

class DataQualitySpec extends SparkSpec {

  import spark.implicits._

  private lazy val child = Seq(
    (1L, Some(5.0), "ok"),
    (2L, Some(-1.0), "ok"),   // range violation
    (3L, None, "ok"),         // null violation
    (3L, Some(2.0), "bad"),   // dup id + bad status
    (9L, Some(3.0), "ok")     // orphan fk
  ).toDF("id", "v", "status")

  private lazy val parent = Seq(1L, 2L, 3L, 4L).toDF("pid")

  test("rowAudit counts each rule over one fused scan") {
    val out = DataQuality.rowAudit(child, Seq(
      RowRule("v_nonneg", col("v").isNull || col("v") < 0.0),
      RowRule("status_ok", col("status") =!= "ok")
    )).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("v_nonneg") == ((2L, 5L, false)))
    assert(out("status_ok") == ((1L, 5L, false)))
  }

  test("uniqueAudit counts rows beyond the first per key") {
    val r = DataQuality.uniqueAudit(child, "id_unique", col("id")).head()
    assert(r.getString(0) == "id_unique")
    assert(r.getLong(1) == 1L && r.getLong(2) == 5L && !r.getBoolean(3))
  }

  test("fkAudit counts orphans via broadcast anti-join") {
    val r = DataQuality.fkAudit("id_fk", child, col("id"),
      parent, col("pid")).head()
    assert(r.getLong(1) == 1L && r.getLong(2) == 5L && !r.getBoolean(3))
  }

  test("audit unions reports in deterministic rule order") {
    val rep = DataQuality.audit(Seq(
      DataQuality.uniqueAudit(child, "b_rule", col("id")),
      DataQuality.fkAudit("a_rule", child, col("id"), parent, col("pid")),
      DataQuality.rowAudit(child, Seq(
        RowRule("c_rule", col("v").isNull)))))
    assert(rep.columns.toSeq ==
      Seq("rule", "n_violations", "n_rows", "pass"))
    assert(rep.select("rule").as[String].collect().toSeq ==
      Seq("a_rule", "b_rule", "c_rule"))
  }

  test("a clean table passes every rule") {
    val rep = DataQuality.audit(Seq(
      DataQuality.rowAudit(parent, Seq(
        RowRule("pid_positive", col("pid") <= 0L))),
      DataQuality.uniqueAudit(parent, "pid_unique", col("pid"))))
    assert(rep.collect().forall(_.getBoolean(3)))
  }
}
