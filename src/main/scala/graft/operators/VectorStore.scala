package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Persisted vector store with an LSH-partitioned layout — the engine's
  * answer to the reference's vector stores (pgvector table `rag.py:30-37`,
  * Chroma collection `email_fetching.py:21-27`), shaped for 100 TB:
  *
  *  - `write` lands vectors partitioned by their sign-bit LSH bucket
  *    (Ann.bucketOf), so the store directory layout IS the index — no
  *    server process, no in-memory graph, nothing to rebuild on restart.
  *  - `query` reads only the probed buckets: Spark's partition pruning
  *    turns the probe into a scan of (probes/2^H) of the data, then an
  *    exact re-rank inside (TakeOrderedAndProject — per-partition heaps).
  *  - multi-probe (query bucket + single-bit flips) is the recall lever,
  *    same tradeoff as Ann.annLshMulti but against the persisted layout.
  *
  * The bucket column rides along in the data, so exact brute-force over
  * the whole store (scan all partitions) remains available for recall
  * audits — the same store serves both paths.
  */
object VectorStore {

  /** Write (idCol, vecCol, carry...) partitioned by LSH bucket. Keeps all
    * input columns plus `bucket`.
    */
  def write(df: DataFrame, vecCol: Column, path: String,
            numPlanes: Int = 4, dim: Int = 64): Unit =
    df.withColumn("bucket", Ann.bucketOf(vecCol, numPlanes, dim))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Append new vectors into an existing store, idempotent on `idName`:
    * rows whose id is already present are dropped (anti-join against the
    * store's id projection — a column-pruned scan that never touches the
    * vectors), the rest land in their bucket partitions via dynamic
    * partition append. The reference's store is append-on-add
    * (`email_fetching.py:54-57`, `rag.py:52-59`); this is that ingest
    * path against the partitioned layout. The layout invariant (bucket =
    * partition directory) is preserved, so probes against an appended
    * store prune exactly like against a fresh write; periodic compaction
    * (rewrite of a bucket's small files) is an orthogonal maintenance
    * pass that never changes results.
    */
  def append(df: DataFrame, vecCol: Column, path: String,
             idName: String = "vec_id", numPlanes: Int = 4,
             dim: Int = 64): Unit = {
    val existing = df.sparkSession.read.parquet(path).select(col(idName))
    df.withColumn("bucket", Ann.bucketOf(vecCol, numPlanes, dim))
      .join(existing, Seq(idName), "left_anti")
      .write.mode("append").partitionBy("bucket").parquet(path)
  }

  /** Partition-targeted upsert — the re-embedding migration path: replace
    * the stored vectors of the given ids (and insert unseen ids),
    * rewriting ONLY the bucket partitions that hold an old copy of an
    * updated id or receive a new row. Affected buckets are identified by
    * two metadata-sized aggregations (at most 2^numPlanes values collect
    * to the driver), untouched bucket directories are never read or
    * written — at 100 TB an update wave that lands in 3 of 16 buckets
    * costs 3/16 of a rewrite, not a full-store pass. `df` must carry the
    * store's data columns (id, vector, carried metadata).
    */
  def upsert(df: DataFrame, vecCol: Column, path: String,
             idName: String = "vec_id", numPlanes: Int = 4,
             dim: Int = 64): Unit = {
    import java.nio.file.{Files, Paths}
    import java.util.Comparator
    val spark = df.sparkSession
    val updates = df.withColumn("bucket", Ann.bucketOf(vecCol, numPlanes, dim))
    val store = spark.read.parquet(path)
    // bounded driver collect: bucket ids live in [0, 2^numPlanes) — at
    // the default 4 planes this is ≤ 16 rows regardless of store size
    def bucketsOf(d: DataFrame): Set[Int] =
      d.select(col("bucket")).distinct().collect().map(_.getInt(0)).toSet
    val affected = bucketsOf(
      store.join(updates.select(col(idName)), Seq(idName), "left_semi")) ++
      bucketsOf(updates)
    if (affected.nonEmpty) {
      val tmp = path + "__upserting"
      store.filter(col("bucket").isin(affected.toSeq: _*))
        .join(updates.select(col(idName)), Seq(idName), "left_anti")
        .unionByName(updates)
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
      affected.foreach { b =>
        val dst = Paths.get(path, s"bucket=$b")
        val src = Paths.get(tmp, s"bucket=$b")
        if (Files.exists(dst))
          Files.walk(dst).sorted(Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => Files.delete(f))
        if (Files.exists(src)) Files.move(src, dst)
      }
      Files.walk(Paths.get(tmp)).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    }
  }

  /** Partition-targeted delete — the tombstoning path a corpus refresh
    * needs for removed documents (cf. Merge.corpusDiff's `removed`
    * class): drop the rows of the given ids, rewriting ONLY the bucket
    * partitions that actually hold one of them. Affected buckets come
    * from one metadata-sized aggregation (≤ 2^numPlanes values to the
    * driver), untouched bucket directories are never read or written —
    * the same cost shape as [[upsert]]. A delete wave hitting 3 of 16
    * buckets costs 3/16 of a rewrite, never a full-store pass.
    */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
             idName: String = "vec_id"): Unit = {
    import java.nio.file.{Files, Paths}
    import java.util.Comparator
    val store = spark.read.parquet(path)
    val victims = ids.select(col(idName))
    val affected = store.join(victims, Seq(idName), "left_semi")
      .select(col("bucket")).distinct().collect().map(_.getInt(0)).toSet
    if (affected.nonEmpty) {
      val tmp = path + "__deleting"
      store.filter(col("bucket").isin(affected.toSeq: _*))
        .join(victims, Seq(idName), "left_anti")
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
      affected.foreach { b =>
        val dst = Paths.get(path, s"bucket=$b")
        val src = Paths.get(tmp, s"bucket=$b")
        if (Files.exists(dst))
          Files.walk(dst).sorted(Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => Files.delete(f))
        if (Files.exists(src)) Files.move(src, dst)
        else Files.createDirectories(dst) // bucket emptied by the delete
      }
      Files.walk(Paths.get(tmp)).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    }
  }

  /** Compact a store in place: rewrite every bucket partition into one
    * file per bucket (repartition on the bucket column routes each
    * bucket's rows to a single task, partitionBy keeps the directory
    * layout), staged to a sibling directory then swapped. Results and
    * partition pruning are invariant — this is the maintenance pass that
    * keeps probe cost flat as streaming appends accumulate small files;
    * per-row work is zero (no re-hash, the bucket is already a column).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    import java.nio.file.{Files, Paths}
    import java.util.Comparator
    val tmp = path + "__compacting"
    spark.read.parquet(path)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    val p = Paths.get(path)
    Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => Files.delete(f))
    Files.move(Paths.get(tmp), p)
  }

  /** Partition-pruned L2 top-k against a written store. `multiProbe`
    * trades scan fraction for recall; the scanned fraction is
    * |probes| / 2^numPlanes either way.
    */
  def queryL2(spark: SparkSession, path: String, vecName: String, idName: String,
              query: Seq[Double], k: Int, numPlanes: Int = 4,
              multiProbe: Boolean = true): DataFrame = {
    val probes =
      if (multiProbe) Ann.probesOf(query, numPlanes)
      else Seq(Ann.bucketOfQuery(query, numPlanes))
    spark.read.parquet(path)
      .filter(col("bucket").isin(probes: _*))
      .withColumn("distance", l2(col(vecName), typedlit(query)))
      .orderBy(col("distance").asc, col(idName).asc)
      .limit(k)
  }
}
