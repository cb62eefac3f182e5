package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED IVF layout with a full maintenance lifecycle — the
  * inverted-file counterpart of [[GraphAnnIndex]] (the reference's
  * one-shot `create_collection`, `email_fetching.py:27`, crashes on
  * re-run and forces a rebuild on any corpus refresh; this is the
  * incremental alternative at the IVF layout level, closing the same
  * gap q_ivf_layout's one-shot `partitionBy("cell")` write had).
  *
  * Layout under `path` (the directory IS the index):
  *
  *   cells/  cell=N/ (caller's columns)  partitioned by IVF cell —
  *           nearest static centroid of the vector ([[Ann.cellOf]]),
  *           deterministic per vector, so probes partition-prune to
  *           nprobe/nlist of the store and APPENDS land each batch row
  *           in exactly its own cell (purely additive: no ranks, no
  *           derived relations — append ≡ rebuild by construction)
  *   ids/    ib=N/ (id, cell)            admission sidecar partitioned
  *           by id hash: cells/ is partitioned by the VECTOR's cell, so
  *           an "is this id stored?" lookup cannot prune it; this
  *           relation can — admission anti-joins ∝ the batch's id
  *           buckets, and because it also records each id's CELL,
  *           [[delete]] learns the victims' cells without any corpus
  *           scan (unlike the postings stage, which has no forward
  *           index) and rewrites only those partitions
  *   _IVF_META   `nlist dim idName vecName`; written LAST via atomic
  *               rename — the done marker certifying the layout landed
  *   _APPENDING  maintenance-intent marker (crash ⇒ detected + refused)
  */
object IvfIndex {

  final case class Meta(nlist: Int, dim: Int, idName: String,
                        vecName: String)

  private def metaFile(path: String) =
    java.nio.file.Paths.get(path, "_IVF_META")
  private def intentFile(path: String) =
    java.nio.file.Paths.get(path, "_APPENDING")

  def exists(path: String): Boolean =
    java.nio.file.Files.exists(metaFile(path))

  private def writeMeta(path: String, m: Meta): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Paths.get(path, "_IVF_META_TMP")
    Files.writeString(tmp, s"${m.nlist} ${m.dim} ${m.idName} ${m.vecName}")
    Files.move(tmp, metaFile(path),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readMeta(path: String): Meta = {
    require(exists(path), s"$path is not an IVF index (no _IVF_META)")
    if (java.nio.file.Files.exists(intentFile(path)))
      throw new IllegalStateException(
        s"$path has unfinished maintenance (_APPENDING intent present) — a " +
          "writer crashed mid-append/delete; rebuild with build()")
    val p = java.nio.file.Files.readString(metaFile(path)).trim.split(" ")
    Meta(p(0).toInt, p(1).toInt, p(2), p(3))
  }

  /** Id-hash bucket of the admission sidecar (crc32, cf. the Retrieval
    * stages' db key and GraphAnnIndex's ib key).
    */
  private val NumIdBuckets = 64
  private def ibCol(id: org.apache.spark.sql.Column) =
    pmod(crc32(id.cast("string")), lit(NumIdBuckets.toLong)).cast("int")

  /** Sidecar read with the DECLARED schema (ids stored as LONG —
    * schema inference would open an arbitrary file's footer, defeating
    * the pruning this relation exists for; cf. GraphAnnIndex.IdsSchema).
    */
  private val IdsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("ib",
      org.apache.spark.sql.types.IntegerType)))
  private def idsRel(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(IdsSchema).parquet(s"$path/ids")

  /** Build the index at `path` (wholesale overwrite): every caller
    * column rides into the cell partitions, the sidecar derives from
    * the STAGED rows (no second corpus pass).
    */
  def build(df: DataFrame, idName: String, vecName: String, path: String,
            nlist: Int = 8, dim: Int = 64): Unit = {
    val spark = df.sparkSession
    graft.tables.Staging.deleteRec(path)
    require(!df.columns.contains("cell"),
      "input already carries a 'cell' column — rename it, the IVF cell owns that name")
    df.withColumn("cell", Ann.cellOf(col(vecName), nlist, dim))
      .repartition(col("cell")) // one file per partition — small-files guard
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val staged = spark.read.parquet(s"$path/cells")
    staged.select(col(idName).cast("long").as("id"), col("cell"))
      .withColumn("ib", ibCol(col("id")))
      .repartition(col("ib"))
      .write.mode("overwrite").partitionBy("ib").parquet(s"$path/ids")
    writeMeta(path, Meta(nlist, dim, idName, vecName))
  }

  /** Incremental append: ids already stored are dropped (idempotent;
    * the anti-join runs against the sidecar PRUNED to the batch's id
    * buckets — a stored twin of an id always shares its bucket — so
    * admission is ∝ the batch, never the corpus, and correct even for
    * an id re-arriving with a CHANGED vector, which a cell-prune of the
    * data relation would miss). Admitted rows land purely additively in
    * their own cells; nothing that exists is read or rewritten —
    * append ≡ rebuild by construction, q_ivf_append hash-checks it.
    */
  def append(df: DataFrame, path: String): Unit = {
    val m = readMeta(path)
    val spark = df.sparkSession
    val batch = df
      .withColumn("cell", Ann.cellOf(col(m.vecName), m.nlist, m.dim))
      .withColumn("ib", ibCol(col(m.idName)))
      .localCheckpoint() // feeds the bucket collect AND the admission join
    // metadata-sized collect: ib lives in [0, NumIdBuckets)
    val batchIbs = batch.select(col("ib")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val fresh = batch
      .join(idsRel(spark, path)
          .filter(col("ib").isin(batchIbs: _*))
          .select(col("id").as(m.idName)),
        Seq(m.idName), "left_anti")
      .localCheckpoint() // feeds both writes under one lineage cut
    if (fresh.isEmpty) return
    java.nio.file.Files.createFile(intentFile(path))
    fresh.drop("ib")
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")
    fresh.select(col(m.idName).cast("long").as("id"), col("cell"), col("ib"))
      .repartition(col("ib"))
      .write.mode("append").partitionBy("ib").parquet(s"$path/ids")
    java.nio.file.Files.delete(intentFile(path))
  }

  /** Incremental delete: the sidecar's recorded (id → cell) mapping
    * finds the victims' cells with an id-bucket-pruned lookup (NO
    * corpus scan), then only those cell partitions and the victims' id
    * partitions rewrite. Delete-then-probe ≡ rebuild-on-remaining —
    * q_ivf_delete hash-checks it.
    */
  def delete(ids: DataFrame, path: String, idName: String = "id"): Unit = {
    val m = readMeta(path)
    val spark = ids.sparkSession
    val idsB = ids.select(col(idName).as("id"))
      .withColumn("ib", ibCol(col("id")))
      .localCheckpoint()
    val vib = idsB.select(col("ib")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (vib.isEmpty) return
    val sidecar = idsRel(spark, path)
    val victims = sidecar.filter(col("ib").isin(vib: _*))
      .join(idsB.select(col("id")), Seq("id"), "left_semi")
      .localCheckpoint() // (id, cell, ib) — feeds both rewrites
    if (victims.isEmpty) return
    java.nio.file.Files.createFile(intentFile(path))
    // metadata-sized: cell lives in [0, nlist)
    val vcells = victims.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val keptRows = spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(vcells: _*))
      .join(victims.select(col("id").as(m.idName)), Seq(m.idName),
        "left_anti")
      .localCheckpoint() // the write overwrites the dir it was read from
    graft.tables.Staging.overwritePartitionsExact(keptRows, "cell",
      s"$path/cells", vcells)
    val keptIds = sidecar.filter(col("ib").isin(vib: _*))
      .join(victims.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("cell"), col("ib"))
      .localCheckpoint()
    graft.tables.Staging.overwritePartitionsExact(keptIds, "ib",
      s"$path/ids", vib)
    java.nio.file.Files.delete(intentFile(path))
  }

  /** Replace changed rows (and insert unseen ids): delete-then-append,
    * cf. [[GraphAnnIndex.upsert]]. A crash between the halves leaves
    * the consistent deleted state; re-running heals.
    */
  def upsert(df: DataFrame, path: String): Unit = {
    val m = readMeta(path)
    delete(df.select(col(m.idName)), path, m.idName)
    append(df, path)
  }

  /** Rewrite every partition into one file — the maintenance pass that
    * keeps file counts flat as streaming appends accumulate. Rows and
    * probe results are invariant (QuantizeIvfSpec asserts it).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val _ = readMeta(path)
    java.nio.file.Files.createFile(intentFile(path))
    val cells = spark.read.parquet(s"$path/cells").localCheckpoint()
    graft.tables.Staging.dynamicOverwrite(cells, "cell", s"$path/cells")
    val ids = idsRel(spark, path).localCheckpoint()
    graft.tables.Staging.dynamicOverwrite(ids, "ib", s"$path/ids")
    java.nio.file.Files.delete(intentFile(path))
  }

  /** Partition-pruned probe scan: the query's nprobe nearest cells
    * ([[Ann.ivfProbes]], driver-side — static centroids), read as a
    * PartitionFilters-pruned scan of nprobe/nlist of the store. The
    * exact re-rank is the caller's (same contract as q_ivf_layout).
    */
  def probe(spark: SparkSession, path: String, query: Seq[Double],
            nprobe: Int): DataFrame = {
    val m = readMeta(path)
    require(query.length == m.dim,
      s"query dim ${query.length} != index dim ${m.dim}")
    val cells = Ann.ivfProbes(query, m.nlist, nprobe)
    spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(cells: _*))
  }
}
