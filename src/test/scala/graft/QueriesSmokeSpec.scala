package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec, CollectLimitExec}

/** Every SparkEntry query must run at sf0.001 and (except candidate-pair
  * mining, which may legitimately find nothing at tiny scale) return rows.
  * Catches runtime breakage in any registered query, and enforces the
  * queries ↔ oracleSql contract invariants.
  *
  * The same pass sweeps every query's physical plan for the two
  * scale-killers that can land silently behind a green hash:
  *   - a CartesianProduct (all-pairs blow-up), and
  *   - an UNPARTITIONED WindowExec over an unbounded input (one task
  *     sorts the whole relation — the q_histogram class of regression).
  * A global window whose input subtree is limit-bounded (top-k
  * re-ranking after TakeOrderedAndProject/GlobalLimit, k-row centroid
  * relations) is scale-safe and allowed.
  */
class QueriesSmokeSpec extends SparkSpec {

  // legitimately empty at tiny scale: set difference / intersection /
  // anti-join results
  private val mayBeEmpty = Set("q_set_ops", "q_anti_join", "q_intersect")

  // Global-window inputs that ARE bounded but whose bound is invisible to
  // the plan walk because a lineage cut (localCheckpoint → RDD scan)
  // hides the upstream limit: k-means centroid relations (k rows by
  // construction, cf. Clustering.seeds/lloyd).
  private val checkpointBoundedWindow =
    Set("q_kmeans", "q_ann_ivf_trained")

  private def hasLimitBelow(p: SparkPlan): Boolean =
    flattenPlan(p).exists {
      case _: GlobalLimitExec | _: LocalLimitExec |
           _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case _ => false
    }

  private def planViolations(name: String, df: DataFrame): Seq[String] = {
    val nodes = planNodes(df)
    val cartesian = nodes.collect { case c: CartesianProductExec => c }
      .map(_ => s"$name: CartesianProduct in executed plan")
    val globalWindows = nodes.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w.child
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.child
    }
    val unbounded =
      if (checkpointBoundedWindow(name)) Nil
      else globalWindows.filterNot(hasLimitBelow)
        .map(_ => s"$name: unpartitioned Window over unbounded input " +
          "(single task sorts the whole relation)")
    cartesian ++ unbounded
  }

  test("queries and oracleSql cover each other exactly (every op is proven)") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
    val unproven = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unproven.isEmpty,
      s"queries without a DuckDB oracle (add one — 'runs' is not 'proven'): $unproven")
  }

  test("every query runs on sf0.001 with a scale-safe plan") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf0001)
        val planIssues = planViolations(name, df)
        val n = df.count()
        planIssues ++ (if (n == 0 && !mayBeEmpty(name)) Seq(s"$name: 0 rows") else Nil)
      } catch {
        case e: Throwable => Seq(s"$name: ${e.getMessage.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("materializeCtes masks literals, quoted identifiers and -- comments") {
    // plain CTE gets the hint; its self-reference check sees the body
    val simple = SparkEntry.materializeCtes(
      "WITH a AS (SELECT 1 AS x) SELECT x FROM a")
    assert(simple.contains("a AS MATERIALIZED (SELECT 1"), simple)
    // recursive CTE untouched (MATERIALIZED is invalid on it)
    val rec = "WITH r AS (SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 3) SELECT * FROM r"
    assert(SparkEntry.materializeCtes(rec) == rec)
    // unbalanced paren inside a single-quoted literal must not derail
    // the brace match for the FOLLOWING member
    val lit = SparkEntry.materializeCtes(
      "WITH a AS (SELECT '(' AS x), b AS (SELECT 2 AS y) SELECT * FROM a, b")
    assert(lit.contains("a AS MATERIALIZED") && lit.contains("b AS MATERIALIZED"), lit)
    // unbalanced paren inside a double-quoted IDENTIFIER: same guarantee
    val ident = SparkEntry.materializeCtes(
      "WITH a AS (SELECT 1 AS \"col(1\") , b AS (SELECT 2 AS y) SELECT * FROM a, b")
    assert(ident.contains("a AS MATERIALIZED") && ident.contains("b AS MATERIALIZED"), ident)
    // unbalanced paren inside a -- line comment: same guarantee
    val cmt = SparkEntry.materializeCtes(
      "WITH a AS (SELECT 1 AS x -- open ( paren in comment\n), b AS (SELECT 2 AS y) SELECT * FROM a, b")
    assert(cmt.contains("a AS MATERIALIZED") && cmt.contains("b AS MATERIALIZED"), cmt)
    // doubled-quote escape stays in-string: the '')'' is text
    val esc = SparkEntry.materializeCtes(
      "WITH a AS (SELECT 'it''s )' AS x), b AS (SELECT 2 AS y) SELECT * FROM a, b")
    assert(esc.contains("a AS MATERIALIZED") && esc.contains("b AS MATERIALIZED"), esc)
  }
}
