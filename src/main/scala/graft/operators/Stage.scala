package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut strategy for iterative operators (PageRank rounds,
  * connected-components label propagation). Both cuts bound the plan to
  * constant size across iterations; they differ in durability:
  *
  *  - [[Stage.Local]] pins the materialized blocks to executor memory
  *    (`localCheckpoint`) — fastest, but non-recoverable: losing an
  *    executor kills the job. The right default on local[n] and for
  *    short fixed-round runs.
  *  - [[Stage.Parquet]] lands each cut in a parquet stage and reads it
  *    back — the cluster path: lineage-free, spillable, survives executor
  *    loss, and restartable mid-iteration from the last stage (the same
  *    discipline the dedup family uses for staged signatures,
  *    cf. Dedup.stageMinhashSignatures). Costs a write+read per cut and
  *    drops any pre-shuffled outputPartitioning, so round joins re-shuffle
  *    the staged side; that exchange is the price of durability.
  */
sealed trait Stage {
  /** Materialize `df`, cutting its lineage. `name` must be unique per cut
    * site+round within one operator invocation.
    */
  def cut(df: DataFrame, name: String): DataFrame
}

object Stage {

  /** Executor-memory cut — local default. */
  case object Local extends Stage {
    def cut(df: DataFrame, name: String): DataFrame = df.localCheckpoint()
  }

  /** Durable parquet-stage cut under `dir` — the 100 TB lever.
    *
    * A stage directory is SINGLE-RUN-OWNED: cut names are fixed per cut
    * site+round (`ppr_ranks_cut_3`, `km_cents_cut_2`, …), so two
    * concurrent runs sharing one `dir` would overwrite each other's cut
    * files mid-iteration. Allocate a fresh directory per run (as the
    * specs do with per-run temp dirs); that is also what makes a run
    * restartable from its own last stage.
    */
  final case class Parquet(dir: String) extends Stage {
    def cut(df: DataFrame, name: String): DataFrame = {
      val path = s"$dir/$name"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    }
  }
}
