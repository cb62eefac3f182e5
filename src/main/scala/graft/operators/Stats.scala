package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact distributed second moments (mean/variance/stddev/correlation)
  * from integer fixed-point power sums.
  *
  * Raw-double variance/corr aggregates are partial-merge-order dependent
  * (each partition folds doubles in its own order), so results differ
  * run-to-run and engine-to-engine in the last bits. Instead: quantize
  * each value to integer fixed-point (e.g. cents), aggregate the power
  * sums EXACTLY, and derive the moments from the sums — bit-identical on
  * any partitioning and any engine.
  *
  * The sums accumulate as DECIMAL(38,0) (128-bit), not BIGINT: a
  * sum-of-squares of c-cent values overflows a 64-bit long at roughly
  * n·c² > 9.2e18 — for 5000-cent quantities that is ~4e11 rows (≈ sf70k
  * lineitem, i.e. well inside a 100 TB corpus). DECIMAL(38,0) pushes the
  * bound to 1e38 (~1e30 rows) with per-row products still computed in
  * cheap long arithmetic (values ≤ ~1e9 cents square inside a long).
  */
object Stats {

  private val dec38: DecimalType = DecimalType(38, 0)

  /** Exact power sums of two pre-quantized long columns per group:
    * n, Σq, Σd, Σq², Σd², Σq·d — the sufficient statistic for all second
    * moments. One shuffle on the group key; partial aggregation folds
    * map-side.
    */
  def powerSums(df: DataFrame, key: Column, q: Column, d: Column): DataFrame =
    df.select(key.as("k"), q.as("q"), d.as("d"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("q").cast(dec38)).as("sq"),
        sum(col("d").cast(dec38)).as("sd"),
        sum((col("q") * col("q")).cast(dec38)).as("sqq"),
        sum((col("d") * col("d")).cast(dec38)).as("sdd"),
        sum((col("q") * col("d")).cast(dec38)).as("sqd"))

  /** Sample variance from power sums: (n·Σx² − (Σx)²) / (n(n−1)) / scale²,
    * the subtraction exact in DECIMAL before the single final double cast.
    */
  def sampleVar(n: Column, s2: Column, s1: Column, scaleSq: Double): Column =
    (n * s2 - s1 * s1).cast("double") / (n * (n - 1)).cast("double") / scaleSq

  /** Pearson correlation from power sums — numerator and both variance
    * terms exact in DECIMAL, one sqrt/divide at the end.
    */
  def corrFromSums(n: Column, sq: Column, sd: Column, sqq: Column,
                   sdd: Column, sqd: Column): Column =
    (n * sqd - sq * sd).cast("double") /
      (sqrt((n * sqq - sq * sq).cast("double")) *
        sqrt((n * sdd - sd * sd).cast("double")))

  /** ANALYZE-style table statistics — the input a cost-based optimizer
    * collects per column: row count, non-null count, exact distinct
    * count, and (numeric columns) min/max. One aggregation pass over the
    * table; multiple exact distincts plan through Catalyst's Expand (one
    * row replica per distinct column), which is the exact-collection
    * cost — a 100 TB ANALYZE swaps `count_distinct` for
    * `approx_count_distinct` (HLL, one replica, mergeable) with the same
    * output shape. Min/max/counts always come map-side-combined.
    * Output: (col_name, n_rows, n_nonnull, ndv, min_v, max_v) — min/max
    * NULL for non-numeric columns (string formatting is engine-specific;
    * numeric stats are the ones selectivity estimation consumes).
    */
  def tableStats(df: DataFrame, numericCols: Seq[String],
                 otherCols: Seq[String]): DataFrame = {
    val all = numericCols ++ otherCols
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("_n")) ++
        all.flatMap { c => Seq(
          count(col(c)).as(s"_cnt_$c"),
          count_distinct(col(c)).as(s"_ndv_$c")) } ++
        numericCols.flatMap { c => Seq(
          min(col(c)).cast("double").as(s"_min_$c"),
          max(col(c)).cast("double").as(s"_max_$c")) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows =
      numericCols.map(c => struct(lit(c).as("col_name"), col("_n").as("n_rows"),
        col(s"_cnt_$c").as("n_nonnull"), col(s"_ndv_$c").as("ndv"),
        col(s"_min_$c").as("min_v"), col(s"_max_$c").as("max_v"))) ++
      otherCols.map(c => struct(lit(c).as("col_name"), col("_n").as("n_rows"),
        col(s"_cnt_$c").as("n_nonnull"), col(s"_ndv_$c").as("ndv"),
        lit(null).cast("double").as("min_v"), lit(null).cast("double").as("max_v")))
    one.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
  }

  /** The 100 TB ANALYZE path made concrete: per-column HLL sketch NDV
    * (`approx_count_distinct`, mergeable partials — no Expand replication,
    * one pass) checked against the exact NDV under the repo's
    * tolerance-flag contract (cf. q_approx_distinct). Output:
    * (col_name, ndv, within_tol) — the flag asserts the sketch landed
    * within `tol` relative error, so the scale lever's accuracy is a
    * tracked metric, not a claim.
    */
  def tableStatsApprox(df: DataFrame, cols: Seq[String], rsd: Double,
                       tol: Double): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c => Seq(
      count_distinct(col(c)).as(s"_ndv_$c"),
      approx_count_distinct(col(c), rsd).as(s"_andv_$c")) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(lit(c).as("col_name"),
      col(s"_ndv_$c").as("ndv"),
      (abs(col(s"_andv_$c") - col(s"_ndv_$c")) <=
        col(s"_ndv_$c") * lit(tol)).as("within_tol")))
    one.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
  }

  /** Exact equi-depth histogram (the other CBO statistic): `buckets`
    * bins of equal row count over `valueCol`, ties ordered by `tieCol`
    * for determinism. This exact form global-sorts (ntile over ONE
    * single-partition window) — acceptable ONLY for fixed-cardinality
    * relations (nation/region-sized); it is deliberately NOT declared
    * against any scaling table. The declared exact statistic is the
    * per-group form [[equiDepthHistogramBy]] (partitioned window — sorts
    * parallelize across groups); the declared fact-table statistic is
    * the sketch path [[equiDepthHistogramApprox]] (no sort anywhere).
    * Output: (bucket 1..k, n, lo, hi).
    */
  def equiDepthHistogram(df: DataFrame, valueCol: Column, tieCol: Column,
                         buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(valueCol.as("v"), tieCol.as("tb"))
      .withColumn("bucket",
        ntile(buckets).over(Window.orderBy(col("v"), col("tb"))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("bucket"))
  }

  /** Exact equi-depth histogram PER GROUP — the scale-shaped exact form:
    * the ntile window partitions by `groupCol`, so each group sorts
    * independently in parallel and no single task ever holds the whole
    * relation (the per-partition column statistics ANALYZE keeps for a
    * partitioned table). Skewed-group ceiling: one task per group, fine
    * for the bounded group domains this targets (nations, categories,
    * date partitions); an unbounded group domain should use
    * [[equiDepthHistogramApprox]] per group instead.
    * Output: (grp, bucket 1..k, n, lo, hi).
    */
  def equiDepthHistogramBy(df: DataFrame, groupCol: Column, valueCol: Column,
                           tieCol: Column, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(groupCol.as("grp"), valueCol.as("v"), tieCol.as("tb"))
      .withColumn("bucket",
        ntile(buckets).over(
          Window.partitionBy(col("grp")).orderBy(col("v"), col("tb")))
          .cast("long"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("grp"), col("bucket"))
  }

  /** The 100 TB equi-depth histogram: bucket boundaries from one
    * `approx_percentile` pass (a mergeable KLL-style sketch — map-side
    * partials, no global sort, no single-partition window anywhere in the
    * plan), then each row binned by a fold over the broadcast boundary
    * array (width_bucket against arbitrary boundaries). Because the
    * boundaries are sketch-derived they are not oracle-reproducible, so —
    * like [[tableStatsApprox]] — the accuracy is emitted as a tracked
    * tolerance flag instead of raw boundary values: each bucket's row
    * count must land within `tol` relative error of the ideal N/k depth.
    * Every bucket 1..k is ALWAYS present in the output: a bucket the
    * binning left empty (degenerate sketch boundaries) appears with
    * depth_within_tol = false rather than silently vanishing, so a
    * consumer checking "all flags true" cannot pass on a degenerate
    * boundary set. Output: (bucket 1..k, depth_within_tol).
    */
  def equiDepthHistogramApprox(df: DataFrame, valueCol: Column, buckets: Int,
                               accuracy: Int, tol: Double): DataFrame = {
    val vals = df.select(valueCol.cast("double").as("v")).where(col("v").isNotNull)
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val bounds = vals.agg(
      percentile_approx(col("v"), array(probs.map(lit): _*), lit(accuracy))
        .as("bounds"),
      count(lit(1)).as("n_total"))
    val binned = vals.join(broadcast(bounds))
      .select(
        (lit(1) + aggregate(col("bounds"), lit(0),
          (acc, b) => acc + when(col("v") > b, lit(1)).otherwise(lit(0))))
          .cast("long").as("bucket"))
    val counts = binned.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val allBuckets = df.sparkSession.range(1, buckets + 1)
      .select(col("id").as("bucket"))
      .crossJoin(broadcast(bounds.select(col("n_total"))))
    allBuckets.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (abs(coalesce(col("n"), lit(0L)) - col("n_total") / buckets) <=
          lit(tol) * col("n_total") / buckets).as("depth_within_tol"))
      .orderBy(col("bucket"))
  }
}
