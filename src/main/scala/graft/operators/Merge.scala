package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed-table maintenance operators: lakehouse MERGE (upsert) and
  * SCD type-2 interval-history build — the two mutations every
  * warehouse/lakehouse ingest pipeline runs against dimension tables.
  * The reference's store mutates by whole-row add (email_fetching.py:54-57);
  * these are the general forms of that maintenance at engine level.
  *
  * Scale design: both are single-shuffle shapes. `merge` is one full-outer
  * hash/sort-merge join on the key (at petabyte scale the physical rewrite
  * would first partition-prune the touched files — the join itself is
  * unchanged); `scd2` is one shuffle on the entity key with all window
  * work inside the partition. No driver materialization, no O(n²).
  */
object Merge {

  /** Lakehouse MERGE: apply a batch of `source` rows onto a `target`
    * snapshot by `keys`. Semantics (MERGE INTO t USING s):
    *   - matched           -> UPDATE: the source row replaces the target
    *     row wholesale (including source NULLs — presence, not
    *     non-nullness, decides, via an internal marker column);
    *   - not matched       -> INSERT the source row;
    *   - not matched by source -> keep the target row.
    * Requires `source` to share `target`'s schema. Output = the new
    * snapshot, same schema.
    *
    * One shuffle per side on the key. Both relations stay distributed;
    * with a pre-bucketed target the exchange on the target side
    * disappears entirely (see ScaleLayoutSpec's bucketed-join proof).
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(target.columns.sameElements(source.columns),
      s"merge requires identical schemas; target ${target.columns.toSeq} " +
        s"vs source ${source.columns.toSeq}")
    val dataCols = target.columns.filterNot(keys.contains)
    val src = source.select(
      (source.columns.map(c => col(c).as("_src_" + c)) :+ lit(true).as("_src_present")): _*)
    val joinCond = keys.map(k => target(k) === src("_src_" + k)).reduce(_ && _)
    target.join(src, joinCond, "full_outer")
      .select(
        (keys.map(k => coalesce(target(k), src("_src_" + k)).as(k)) ++
          dataCols.map(c =>
            when(col("_src_present"), src("_src_" + c)).otherwise(target(c)).as(c))): _*)
  }

  /** SCD type-2 interval history from a change-event stream: collapse each
    * entity's consecutive identical states into validity intervals.
    * Input rows are (key, state, ts [, tiebreak]); output one row per
    * state *run* with
    *   (key, state, valid_from, valid_to, is_current)
    * where valid_to is the next run's valid_from (NULL on the open,
    * current run). Ordering inside an entity is (ts, tiebreak) so
    * same-timestamp events resolve deterministically.
    *
    * One shuffle on `key`; both window passes share that partitioning
    * (Catalyst plans a single Exchange). State per task is one lag row —
    * nothing accumulates, so a 100 TB change log streams through.
    */
  def scd2(changes: DataFrame, key: Column, state: Column, ts: Column,
           tiebreak: Column): DataFrame = {
    val marked = changes.select(key.as("key"), state.as("state"), ts.as("ts"),
        tiebreak.as("tb"))
      .withColumn("prev_state", lag(col("state"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("ts"), col("tb"))))
      .filter(col("prev_state").isNull || !(col("state") <=> col("prev_state")))
    marked
      .withColumn("valid_to", lead(col("ts"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("ts"), col("tb"))))
      .select(col("key"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** Corpus snapshot diff: classify every id across two corpus versions
    * as added / removed / changed / unchanged by comparing a content
    * fingerprint — the refresh audit a pipeline runs before re-embedding
    * or re-deduplicating an updated crawl (only `added`+`changed` need
    * reprocessing; `removed` ids need tombstoning downstream).
    *
    * One full-outer shuffle join on the id — the merge shape — with the
    * fingerprint comparison as a narrow projection. Output:
    * (id, status, old_fp, new_fp).
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
                 idCol: Column, fpCol: Column): DataFrame = {
    val o = oldDf.select(idCol.as("id"), fpCol.as("old_fp"), lit(1).as("_o"))
    val n = newDf.select(idCol.as("id"), fpCol.as("new_fp"), lit(1).as("_n"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("_o").isNull, "added")
          .when(col("_n").isNull, "removed")
          .when(col("old_fp") === col("new_fp"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_fp"), col("new_fp"))
  }
}
