package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Retrieval, StageAdmin, VectorStore}
import graft.operators.StageAdmin.Probe
import graft.tables.Tables

class StageAdminSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)
  private lazy val emb = Tables.embeddings(spark, sf0001)

  private def row(name: String, probes: Seq[Probe]) =
    StageAdmin.health(spark, probes).collect()
      .map(r => r.getString(0) -> r).toMap.apply(name)

  test("unknown stage kind is refused with a clear error") {
    val e = intercept[IllegalArgumentException] {
      StageAdmin.health(spark, Seq(Probe("x", "hnsw", "/tmp/nope"))).collect()
    }
    assert(e.getMessage.contains("unknown stage kind"))
  }

  test("a torn stage is REPORTED, not thrown on — even though its own " +
      "debt probe refuses torn state by design") {
    val p = java.nio.file.Files.createTempDirectory("graft_sa_torn").toString
    Retrieval.stagePostings(docs, col("doc_id"), col("text"), p)
    java.nio.file.Files.createFile(java.nio.file.Paths.get(p, "_APPENDING"))
    // the raw probe refuses (readers must not observe torn maintenance)
    intercept[IllegalStateException] { Retrieval.staleFraction(spark, p) }
    // the dashboard reports it instead
    val r = row("t", Seq(Probe("t", "postings", p)))
    assert(r.getBoolean(3) && !r.getBoolean(6) &&
      r.getString(7) == "Retrieval.recoverPostings")
  }

  test("a held writer lock reports locked + the stage's recover") {
    val p = java.nio.file.Files.createTempDirectory("graft_sa_lock").toString
    VectorStore.write(emb.select(col("vec_id"), col("embedding")),
      col("embedding"), p)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(p, "_WRITER_LOCK"))
    val r = row("l", Seq(Probe("l", "vector_store", p)))
    assert(!r.getBoolean(3) && r.getBoolean(4) && !r.getBoolean(6) &&
      r.getString(7) == "VectorStore.recover")
  }

  test("needs_compact follows the kind's policy default and the " +
      "per-probe threshold override") {
    val p = java.nio.file.Files.createTempDirectory("graft_sa_frag").toString
    IvfIndex.build(emb.filter(col("vec_id") % 3 =!= 0), "vec_id",
      "embedding", p, nlist = 8, dim = 64)
    Seq(0, 3, 6).foreach { w =>
      IvfIndex.append(emb.filter(col("vec_id") % 9 === w), p)
    }
    val frag = IvfIndex.fragmentation(p)
    assert(frag > 2.0)
    val healthy = row("f", Seq(Probe("f", "ivf", p)))
    assert(healthy.getBoolean(5) && healthy.getBoolean(6) &&
      healthy.getString(7) == "compact")
    // raising the threshold above the measured debt clears the flag
    val lax = row("f", Seq(Probe("f", "ivf", p, compactThreshold = frag + 1)))
    assert(!lax.getBoolean(5) && lax.getString(7) == "")
  }

  test("pq kind: retention debt past the threshold prescribes Pq.retain; " +
      "retain clears it; atomic-swap layout is never torn/locked") {
    import graft.operators.Pq
    val p = java.nio.file.Files.createTempDirectory("graft_sa_pq")
      .toString + "/pub"
    val pqEmb = emb.filter(col("vec_id") < 64)
    (1 to 5).foreach(_ => Pq.republish(pqEmb, col("vec_id"),
      col("embedding"), m = 4, subDim = 16, k = 4, iters = 1, path = p))
    val deep = row("p", Seq(Probe("p", "pq", p)))
    assert(deep.getBoolean(2) && !deep.getBoolean(3) && !deep.getBoolean(4))
    assert(deep.getBoolean(5) && deep.getString(7) == "Pq.retain")
    Pq.retain(p, keep = 2) // floor -> 4: live v4..v5 = 2 publications <= 3
    val ok = row("p", Seq(Probe("p", "pq", p)))
    assert(!ok.getBoolean(5) && ok.getBoolean(6) && ok.getString(7) == "")
  }

  private def healRow(name: String, probes: Seq[Probe], apply: Boolean) =
    StageAdmin.heal(spark, probes, apply).collect()
      .map(r => r.getString(0) -> r).toMap.apply(name)

  test("heal dry-run plans the prescribed actions and executes NOTHING") {
    val p = java.nio.file.Files.createTempDirectory("graft_sa_dry").toString
    IvfIndex.build(emb.filter(col("vec_id") < 64), "vec_id", "embedding",
      p, nlist = 8, dim = 64)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(p, "_APPENDING"))
    val r = healRow("d", Seq(Probe("d", "ivf", p)), apply = false)
    assert(r.getString(2) == "IvfIndex.recover" && !r.getBoolean(3))
    // nothing ran: the stage is still torn
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "_APPENDING")))
    assert(!r.getBoolean(7) && r.getString(8) == "IvfIndex.recover")
  }

  test("heal apply: torn index recovers, stale lock clears, debt " +
      "compacts, PQ retains, missing stays build — then all-clean") {
    import graft.operators.{Dedup, Pq}
    val base = java.nio.file.Files.createTempDirectory("graft_sa_heal")
    val torn = base.resolve("torn").toString
    IvfIndex.build(emb.filter(col("vec_id") < 64), "vec_id", "embedding",
      torn, nlist = 8, dim = 64)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(torn, "_APPENDING"))
    val locked = base.resolve("locked").toString
    VectorStore.write(emb.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding")), col("embedding"), locked)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(locked, "_WRITER_LOCK"))
    val stale = base.resolve("stale").toString
    Retrieval.stagePostings(docs.filter(col("doc_id") % 3 === 1),
      col("doc_id"), col("text"), stale)
    Retrieval.appendPostings(docs.filter(col("doc_id") % 3 === 2),
      col("doc_id"), col("text"), stale)
    Retrieval.appendPostings(docs.filter(col("doc_id") % 3 === 0),
      col("doc_id"), col("text"), stale)
    val pq = base.resolve("pq").toString
    val pqEmb = emb.filter(col("vec_id") < 64)
    (1 to 5).foreach(_ => Pq.republish(pqEmb, col("vec_id"),
      col("embedding"), m = 4, subDim = 16, k = 4, iters = 1, path = pq))
    val probes = Seq(Probe("torn", "ivf", torn),
      Probe("locked", "vector_store", locked),
      Probe("stale", "postings", stale), Probe("pq", "pq", pq),
      Probe("missing", "postings", base.resolve("nope").toString))
    val rs = StageAdmin.heal(spark, probes, apply = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rs("torn").getString(2) == "IvfIndex.recover" &&
      rs("torn").getBoolean(3) && rs("torn").getBoolean(7))
    assert(rs("locked").getString(2) == "VectorStore.recover" &&
      rs("locked").getBoolean(3) && rs("locked").getBoolean(7))
    assert(rs("stale").getString(2) == "compact" &&
      rs("stale").getBoolean(3) && !rs("stale").getBoolean(6))
    assert(rs("pq").getString(2) == "Pq.retain" &&
      rs("pq").getBoolean(3) && !rs("pq").getBoolean(6))
    // Pq.retain kept floor(threshold)=3 publications: floor 3, live v3..v5
    assert(Pq.retentionFloor(pq) == 3L && Pq.currentVersion(pq) == 5L)
    assert(rs("missing").getString(2) == "build" &&
      !rs("missing").getBoolean(3) && rs("missing").getString(8) == "build")
    rs.values.foreach(r => assert(r.getString(4) == ""))
    // a second apply finds nothing executable (idempotent fleet)
    val again = StageAdmin.heal(spark, probes, apply = true).collect()
    assert(again.forall(!_.getBoolean(3)))
  }

  test("heal two-pass: a stage both torn AND past its debt threshold " +
      "recovers first, then compacts the debt the re-probe reveals") {
    val p = java.nio.file.Files.createTempDirectory("graft_sa_2p")
      .resolve("s").toString
    Retrieval.stagePostings(docs.filter(col("doc_id") % 3 === 1),
      col("doc_id"), col("text"), p)
    Retrieval.appendPostings(docs.filter(col("doc_id") % 3 === 2),
      col("doc_id"), col("text"), p)
    Retrieval.appendPostings(docs.filter(col("doc_id") % 3 === 0),
      col("doc_id"), col("text"), p)
    java.nio.file.Files.createFile(java.nio.file.Paths.get(p, "_APPENDING"))
    // prescription is recover (debt probes refuse torn stages) …
    assert(row("s", Seq(Probe("s", "postings", p)))
      .getString(7) == "Retrieval.recoverPostings")
    val r = healRow("s", Seq(Probe("s", "postings", p)), apply = true)
    // … and apply chains the revealed compaction in pass 2
    assert(r.getString(2) == "Retrieval.recoverPostings+compact")
    assert(r.getBoolean(7) && !r.getBoolean(6) && r.getString(8) == "")
  }

  test("heal refuses to steal a LIVE writer's lock: the refusal is an " +
      "error row, the lock survives") {
    val p = java.nio.file.Files.createTempDirectory("graft_sa_live")
      .resolve("s").toString
    VectorStore.write(emb.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding")), col("embedding"), p)
    // a lock held by THIS (live) process must not be cleared
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p, "_WRITER_LOCK"),
      s"${ProcessHandle.current.pid}@test")
    val r = healRow("s", Seq(Probe("s", "vector_store", p)), apply = true)
    assert(!r.getBoolean(3) && r.getString(4).contains("LIVE"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "_WRITER_LOCK")))
    assert(!r.getBoolean(7) && r.getString(8) == "VectorStore.recover")
  }

  test("a missing stage reports build; a fresh one reports nothing") {
    val p = java.nio.file.Files.createTempDirectory("graft_sa_ok").toString
    IvfIndex.build(emb, "vec_id", "embedding", p, nlist = 8, dim = 64)
    val rs = StageAdmin.health(spark, Seq(
      Probe("ok", "ivf", p),
      Probe("gone", "ivf", p + "_nope"))).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rs("ok").getBoolean(2) && rs("ok").getBoolean(6) &&
      rs("ok").getString(7) == "")
    assert(!rs("gone").getBoolean(2) && !rs("gone").getBoolean(6) &&
      rs("gone").getString(7) == "build")
  }
}
