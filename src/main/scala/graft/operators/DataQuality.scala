package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the admission gate of a
  * training-data pipeline (reference-stack pipelines assume clean rows;
  * at 100 TB "assume" must become "audit"): each rule yields one row
  * `(rule, n_violations, n_rows, pass)`, so the audit result is itself
  * a small relation a pipeline can join, alert on, or archive.
  *
  * Scale shape — the whole point of the API split:
  *  - ALL row-level rules over one table fuse into a single aggregate
  *    over ONE scan (`sum(CASE WHEN violated)` per rule) — adding a
  *    10th rule costs zero extra I/O;
  *  - uniqueness is one `count(*) − count(DISTINCT key)` aggregate (no
  *    groupBy-then-filter second pass);
  *  - referential integrity is one broadcast anti-join against the
  *    (distinct, usually dimension-sized) parent key set.
  * Each audit is a one-row frame; `union` glues the report together —
  * the unioned branches run as independent stages of one job.
  *
  * Violation predicates are explicit Columns, so NULL semantics are the
  * caller's choice and the SQL oracle can mirror them verbatim.
  */
object DataQuality {

  /** One row-level expectation: `violated` must be true exactly for the
    * rows that break the rule (include the NULL case explicitly).
    */
  case class RowRule(name: String, violated: Column)

  private def report(name: String, nViol: Column, nRows: Column) =
    Seq(lit(name).as("rule"), nViol.cast("long").as("n_violations"),
      nRows.cast("long").as("n_rows"),
      (nViol.cast("long") === 0L).as("pass"))

  /** All row-level rules for one table, fused into one scan. */
  def rowAudit(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.violated, 1L).otherwise(0L)).as(s"v_$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"v_$i").as("nv"))
    }
    one.select(explode(array(entries: _*)).as("e"), col("n_rows"))
      .select(col("e.rule").as("rule"),
        col("e.nv").cast("long").as("n_violations"),
        col("n_rows").cast("long").as("n_rows"),
        (col("e.nv").cast("long") === 0L).as("pass"))
  }

  /** Uniqueness of a (non-null) key column: violations = rows beyond
    * the first per key, computed as one aggregate.
    */
  def uniqueAudit(df: DataFrame, name: String, key: Column): DataFrame =
    df.agg(count(lit(1)).as("n"), countDistinct(key).as("nd"))
      .select(report(name, col("n") - col("nd"), col("n")): _*)

  /** Referential integrity: child keys that do not appear in the parent
    * key set (broadcast anti-join — the parent side is the small one).
    */
  def fkAudit(name: String, child: DataFrame, childKey: Column,
              parent: DataFrame, parentKey: Column): DataFrame = {
    val keys = parent.select(parentKey.as("_pk")).distinct()
    val nViol = child.join(broadcast(keys), childKey === col("_pk"),
      "left_anti").agg(count(lit(1)).as("nv"))
    val nRows = child.agg(count(lit(1)).as("nr"))
    nViol.crossJoin(nRows).select(report(name, col("nv"), col("nr")): _*)
  }

  /** Glue a report together, deterministically ordered by rule name. */
  def audit(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionAll(_)).orderBy(col("rule"))
}
