package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, GraphAnnIndex, IvfIndex, Pq, Retrieval,
  VectorStore}
import graft.oracle.OracleGen.QueryVec
import graft.tables.Tables

/** BACKWARD-COMPAT sweep: every persisted layout must read a stage
  * written by an OLDER writer — either transparently (legacy fallback /
  * one-time migration) or with an explicit rebuild message, never a
  * silent wrong answer. The postings stage's generation-0 fallback got
  * this treatment in round 16 (RetrievalSpec); these are the other five
  * layouts, each exercised against a hand-degraded "pre-gen" fixture
  * (the current writer's output with the newer-format artifacts
  * stripped, which is byte-what an old writer produced).
  */
class LayoutCompatSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)
  private lazy val emb = Tables.embeddings(spark, sf0001)

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_compat_$tag")
      .resolve("s").toString

  test("windows: a pre-generation stage (no _GEN commit file) reads as " +
      "generation 0 — same MaxSim rows, and maintenance re-commits") {
    val p = tmp("win")
    Retrieval.stageWindows(docs, col("doc_id"), col("text"), p)
    val q = "customer order for table part data".split(" ").toSeq
    val before = Retrieval.maxSimPrunedFromStage(spark, p, q)
      .collect().map(_.toString).sorted.toSeq
    // strip the commit file — the legacy (pre-generation) layout
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p, "_GEN"))
    val legacy = Retrieval.maxSimPrunedFromStage(spark, p, q)
      .collect().map(_.toString).sorted.toSeq
    assert(legacy == before, "gen-0 fallback must not change a row")
    assert(Retrieval.committedWinGen(p) == 0L)
    // maintenance on the legacy stage refuses with the EXPLICIT rebuild
    // message (never a silent misread), naming the in-place migration…
    val e = intercept[IllegalArgumentException] {
      Retrieval.appendWindows(docs.limit(0), col("doc_id"), col("text"), p)
    }
    assert(e.getMessage.contains("predates the generation-committed") &&
      e.getMessage.contains("compactWindows"))
    // …and the named migration upgrades in place: append then works
    Retrieval.compactWindows(spark, p)
    Retrieval.appendWindows(docs.limit(0), col("doc_id"), col("text"), p)
    val after = Retrieval.maxSimPrunedFromStage(spark, p, q)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }

  test("ivf: a pre-ib sidecar (id, cell only) migrates whole on first " +
      "maintenance touch — append stays idempotent, no silent " +
      "re-admission") {
    import spark.implicits._
    val p = tmp("ivf")
    IvfIndex.build(emb, "vec_id", "embedding", p, nlist = 8, dim = 64)
    val probe = () => IvfIndex.probe(spark, p, QueryVec.values, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    val before = probe()
    // degrade the sidecar to the pre-ib layout: (id, cell), no marker
    val old = spark.read.schema("id LONG, cell INT, ib INT")
      .parquet(s"$p/ids").select(col("id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    graft.tables.Staging.deleteRec(s"$p/ids")
    old.toSeq.toDF("id", "cell").coalesce(1).write
      .mode("overwrite").parquet(s"$p/ids")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "ids", "_IDS_V2")))
    // re-appending already-stored vectors must stay a NO-OP (the bug a
    // null-ib read would cause is silent duplicate admission here)
    val nCells = spark.read.parquet(s"$p/cells").count()
    IvfIndex.append(emb.limit(64), p)
    assert(spark.read.parquet(s"$p/cells").count() == nCells,
      "re-admission after sidecar migration must be a no-op")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "ids", "_IDS_V2")),
      "first maintenance touch migrates the sidecar and marks it v2")
    assert(probe() == before)
    // and a real delete through the migrated sidecar still works
    IvfIndex.delete(emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id")), p, idName = "vec_id")
    val kept = spark.read.parquet(s"$p/cells").count()
    assert(kept == emb.filter(col("vec_id") % 3 =!= 0).count())
  }

  test("ivf: compact on a pre-ib sidecar migrates then compacts — it " +
      "must not strand an intent marker (heal's own prescription for a " +
      "fragmented legacy index)") {
    import spark.implicits._
    val p = tmp("ivfc")
    IvfIndex.build(emb, "vec_id", "embedding", p, nlist = 8, dim = 64)
    val probe = () => IvfIndex.probe(spark, p, QueryVec.values, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    val before = probe()
    // same degrade as above: (id, cell) sidecar, no _IDS_V2 marker
    val old = spark.read.schema("id LONG, cell INT, ib INT")
      .parquet(s"$p/ids").select(col("id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    graft.tables.Staging.deleteRec(s"$p/ids")
    old.toSeq.toDF("id", "cell").coalesce(1).write
      .mode("overwrite").parquet(s"$p/ids")
    // compact's FIRST maintenance touch triggers the sidecar migration,
    // which re-reads meta — if the intent marker goes down before that
    // read, readMeta refuses the index mid-compact and the thrown
    // exception strands the marker (index then refuses ALL probes until
    // recover(): compact would take a serving legacy index offline)
    IvfIndex.compact(spark, p)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "_APPENDING")),
      "compact must not strand the intent marker on a legacy sidecar")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "ids", "_IDS_V2")))
    assert(probe() == before, "compact is probe-invariant across the " +
      "migration")
    // and the migrated+compacted index still takes normal maintenance
    IvfIndex.append(emb.limit(64), p)
    assert(probe() == before)
  }

  test("graph-ann: a pre-bucket sidecar (no _IDS_V2 marker) rebuilds " +
      "whole from the node table on first maintenance touch") {
    import spark.implicits._
    val p = tmp("gann")
    GraphAnnIndex.build(emb.filter(col("vec_id") < 192), col("vec_id"),
      col("embedding"), p, sampleMod = 4, edgesPerBucket = 8)
    // degrade: strip the marker and the bucket column, as an old writer
    // left it
    val old = spark.read.parquet(s"$p/ids").select(col("id")).collect()
      .map(_.getLong(0))
    graft.tables.Staging.deleteRec(s"$p/ids")
    old.toSeq.toDF("id").coalesce(1).write.mode("overwrite")
      .parquet(s"$p/ids")
    // append through the migrated sidecar: stays idempotent on stored
    // ids, admits the genuinely new ones
    val nNodes = spark.read.parquet(s"$p/nodes").count()
    GraphAnnIndex.append(emb.filter(col("vec_id") < 64), col("vec_id"),
      col("embedding"), p)
    assert(spark.read.parquet(s"$p/nodes").count() == nNodes,
      "re-admitting stored ids after sidecar rebuild must be a no-op")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "ids", "_IDS_V2")))
    GraphAnnIndex.append(emb.filter(col("vec_id") >= 192 &&
      col("vec_id") < 256), col("vec_id"), col("embedding"), p)
    assert(spark.read.parquet(s"$p/nodes").count() > nNodes)
  }

  test("vector store: a pre-versioning store (no _VERSION/_RETAIN) " +
      "serves probes and takes every maintenance op; version-only ops " +
      "refuse with an explicit message") {
    val p = tmp("store")
    VectorStore.write(emb.select(col("vec_id"), col("label"),
      col("embedding")), col("embedding"), p)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "_VERSION")))
    val before = VectorStore.queryL2(spark, p, "embedding", "vec_id",
      QueryVec.values, 5).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(before.nonEmpty)
    // the new writer's full maintenance surface works on the old layout
    VectorStore.upsert(emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("label"), col("embedding")),
      col("embedding"), p)
    VectorStore.delete(spark, p,
      emb.filter(col("vec_id") % 5 === 0).select(col("vec_id")))
    VectorStore.compact(spark, p)
    VectorStore.recover(p) // no-op on healthy, must not misread layout
    val after = VectorStore.queryL2(spark, p, "embedding", "vec_id",
      QueryVec.values, Int.MaxValue).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(!after.exists(_ % 5 == 0), "deleted ids must stay deleted")
    // version-only surface refuses loudly, never misreads
    val e = intercept[IllegalArgumentException] {
      VectorStore.retain(p, keep = 1)
    }
    assert(e.getMessage.contains("not a versioned store"))
  }

  test("pq: a legacy un-versioned root publication (no _CURRENT) loads " +
      "as version 0 and republish supersedes it in place") {
    val p = tmp("pq")
    val pqEmb = emb.filter(col("vec_id") < 64)
    // produce the legacy layout: one versioned publish, then strip the
    // version artifacts so only root files remain — what the
    // pre-versioning writer left
    Pq.republish(pqEmb, col("vec_id"), col("embedding"), m = 4,
      subDim = 16, k = 4, iters = 1, path = p)
    val dir = java.nio.file.Paths.get(p)
    spark.read.parquet(s"$p/v1").coalesce(1).write.mode("overwrite")
      .parquet("file:" + p + "_root_tmp")
    java.nio.file.Files.walk(java.nio.file.Paths.get(p + "_root_tmp"))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .forEach(f => java.nio.file.Files.copy(f,
        dir.resolve(f.getFileName.toString)))
    graft.tables.Staging.deleteRec(s"$p/v1")
    java.nio.file.Files.delete(dir.resolve("_CURRENT"))
    java.nio.file.Files.createFile(dir.resolve("_GRAFT_DONE"))
    assert(Pq.currentVersion(p) == 0L)
    val books = Pq.loadPublished(spark, p, m = 4)
    assert(books.length == 4, "legacy root publication must load")
    // a republish on the legacy path versions it (v1) and supersedes
    // the root files for readers from then on
    Pq.republish(pqEmb, col("vec_id"), col("embedding"), m = 4,
      subDim = 16, k = 4, iters = 1, path = p)
    assert(Pq.currentVersion(p) == 1L)
    assert(Pq.loadPublished(spark, p, m = 4).length == 4)
  }
}
