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
    Pq.retain(p, keep = 2) // floor -> 3: live versions 5 - 3 = 2 <= 3
    val ok = row("p", Seq(Probe("p", "pq", p)))
    assert(!ok.getBoolean(5) && ok.getBoolean(6) && ok.getString(7) == "")
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
