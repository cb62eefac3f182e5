package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for joins whose key distribution is heavy-tailed
  * (the 100 TB failure mode AQE's skew-join can't always catch, e.g. when
  * the skewed side feeds a non-shuffle join or the hot key is known).
  *
  * Salted join: the large (skewed) side gets a random salt in [0, f); the
  * small side is replicated f times with every salt value. The join key
  * becomes (key, salt), spreading each hot key over f partitions. Classic
  * replicate-and-salt — exact same join result, f× replication of the
  * small side only.
  */
object Skew {

  /** Key-distribution diagnostic — the measurement that DECIDES whether a
    * join needs [[saltedJoin]] (or a bigger AQE skew threshold) before it
    * runs: per key-column, the exact hot-key profile as integers. One
    * keyed aggregation plus one tiny rollup; at 100 TB the first
    * aggregation's map-side partials absorb the hot keys themselves.
    * skew_fp = max_n * 1000 * n_keys DIV n_rows — the max/mean frequency
    * ratio in 1e-3 fixed point (1000 = perfectly uniform), computed
    * through DECIMAL(38,0) so the product can't overflow Long on a
    * heavy-skew high-cardinality table (max_n × n_keys ≥ ~9.2e15 is
    * exactly the 100 TB regime this diagnostic targets); hot_key is the
    * lowest key among those at max_n, found by a single-pass
    * max(struct(n, -k)) argmax — no window, no second pass over the key
    * counts. keyCol must be a NUMERIC key strictly above its type's
    * MinValue (the -k negation is the argmax trick; Long.MinValue has no
    * negation). Output: (n_keys, n_rows, max_n, hot_key, skew_fp).
    */
  def skewReport(df: DataFrame, keyCol: Column): DataFrame =
    df.groupBy(keyCol.as("k")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(struct(col("n"), (-col("k")).as("nk"))).as("m"))
      .select(col("n_keys"), col("n_rows"),
        col("m.n").as("max_n"), (-col("m.nk")).as("hot_key"),
        expr("CAST(CAST(m.n AS DECIMAL(38,0)) * 1000 * n_keys DIV n_rows AS BIGINT)")
          .as("skew_fp"))

  /** Equi-join `large ⋈ small` on `key`, salted `factor` ways.
    * `large` may have arbitrary skew on `key`; `small` is replicated.
    * Output columns: large.* ++ small.* (minus small's key copy).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 factor: Int = 8): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // salt must spread IDENTICAL duplicate rows too (duplicate records are a
    // common cause of the very skew this targets), so hash row content plus
    // a per-row id. The id (and thus a row's salt) varies with the input
    // partitioning — correctness never depends on WHICH salt a row gets
    // (the small side carries every salt), only that hot keys spread; a
    // content-only hash would be repartition-stable but would stack
    // duplicate rows back onto one salt.
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq :+ monotonically_increasing_id(): _*),
        lit(factor)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(lit((0 until factor).toArray)))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop(replicated(key))
      .drop(salted("__salt"))
      .drop(replicated("__salt"))
  }
}
