package graft

import org.apache.spark.sql.functions._

import graft.operators.Rag

class RagSpec extends SparkSpec {

  test("intent routing: 3 classes + fallback (rag.py:93-123)") {
    assert(Rag.intentOf("customer order please") == "product_search")
    assert(Rag.intentOf("why is it slow") == "niche_advice")
    assert(Rag.intentOf("customer query is slow") == "mixed")
    assert(Rag.intentOf("nothing matching at all") == "product_search") // fallback
  }

  test("retrieval path returns k results with ascending distance") {
    import graft.tables.Tables
    val corpus = Rag.embedCorpus(Tables.documents(spark, sf0001), col("text"))
    val topk = Rag.retrieve(corpus, col("doc_id"), "table data scan", 7).collect()
    assert(topk.length == 7)
    val dists = topk.map(_.getAs[Double]("distance"))
    assert(dists.sameElements(dists.sorted))
  }

  test("context assembly joins docs with blank line in distance order (rag.py:189)") {
    import spark.implicits._
    val topk = Seq((0.5, 2L, "second"), (0.1, 1L, "first"), (0.9, 3L, "third"))
      .toDF("distance", "id", "doc")
    val ctx = Rag.assembleContext(topk, $"distance", $"id", $"doc").head().getString(0)
    assert(ctx == "first\n\nsecond\n\nthird")
  }

  test("embedBatched: batch-call path equals the expression path, no shuffle") {
    import graft.tables.Tables
    import graft.operators.BatchedInference
    val docs = Tables.documents(spark, sf0001)
    val viaExpr = Rag.embedCorpus(docs, col("text"))
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // batchSize 7 forces many batches per partition plus a remainder tail
    val batched = BatchedInference.embedBatched(docs, "doc_id", "text",
      new BatchedInference.HashEmbedScorer(64), batchSize = 7)
    val viaBatch = batched.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaBatch == viaExpr,
      "batched scorer must be bit-identical to the HashEmbed expression")
    // the inference stage is narrow — a shuffle here would mean the
    // boundary broke the one-stage plan real models rely on
    assert(!planNodes(batched).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "batched inference must stay one narrow stage")
  }

  test("model seam under failure modes: poison rows isolate per-row, " +
      "dim/count contract violations die loudly, batch boundaries stay " +
      "invisible") {
    import spark.implicits._
    import graft.operators.BatchedInference
    import graft.operators.BatchedInference.BatchScorer
    // a scorer with a real model's failure surface: throws on a poison
    // text, returns a wrong-dim vector on another, variable per-batch
    // latency on the rest (latency must be invisible in results)
    class FlakyScorer(val dim: Int) extends BatchScorer {
      def score(texts: Array[String]): Array[Array[Double]] = {
        if (texts.exists(_.contains("POISON")))
          throw new RuntimeException("tokenizer exploded")
        Thread.sleep(texts.length % 3) // variable batch latency
        texts.map {
          case t if t.contains("BADDIM") => Array(1.0, 2.0) // wrong dim
          case t => graft.expressions.HashEmbed.embed(t, dim)
        }
      }
    }
    val rows = (0L until 40L).map { i =>
      (i, if (i == 17L) s"POISON doc $i"
          else if (i == 23L) s"BADDIM doc $i"
          else s"plain document number $i about customers")
    }
    val df = rows.toDF("doc_id", "text").repartition(3)
    def safe(bs: Int) = BatchedInference.embedBatchedSafe(df, "doc_id",
        "text", new FlakyScorer(64), batchSize = bs)
      .collect().map(r => (r.getLong(0),
        Option(r.getSeq[Double](1)).map(_.toVector),
        Option(r.getString(2)))).sortBy(_._1).toVector
    val got = safe(7)
    assert(got.length == 40, "every input row must come back exactly once")
    // errors are PER-ROW: only the poison and bad-dim rows carry one
    val errs = got.filter(_._3.nonEmpty).map(x => (x._1, x._3.get))
    assert(errs.map(_._1) == Vector(17L, 23L), s"wrong error rows: $errs")
    assert(errs.exists(_._2.contains("tokenizer exploded")))
    assert(errs.exists(_._2.contains("2-dim vector")))
    // every innocent row — including the poison rows' batch-mates — is
    // bit-identical to the expression path
    got.filter(_._3.isEmpty).foreach { case (id, vec, _) =>
      assert(vec.get == graft.expressions.HashEmbed
        .embed(rows(id.toInt)._2, 64).toVector, s"row $id drifted")
    }
    // batch boundaries invisible: any batchSize gives the same relation
    assert(safe(3) == got && safe(64) == got)
    // the STRICT path dies loudly, naming the contract breach
    val eDim = intercept[org.apache.spark.SparkException] {
      BatchedInference.embedBatched(df.filter(col("doc_id") =!= 17),
        "doc_id", "text", new FlakyScorer(64), batchSize = 7).collect()
    }
    assert(eDim.getMessage.contains("2-dim vector"))
    // a scorer that DROPS a row (count mismatch → silent id
    // misalignment without the check) is refused by name
    class DroppingScorer(val dim: Int) extends BatchScorer {
      def score(texts: Array[String]): Array[Array[Double]] =
        texts.drop(1).map(graft.expressions.HashEmbed.embed(_, dim))
    }
    val eCnt = intercept[org.apache.spark.SparkException] {
      BatchedInference.embedBatched(df, "doc_id", "text",
        new DroppingScorer(64), batchSize = 7).collect()
    }
    assert(eCnt.getMessage.contains("misalign"))
  }

  test("OnnxShapedScorer: weights build ONCE per executor JVM across a " +
      "multi-partition multi-batch run; output unit-norm, batch-size " +
      "invariant") {
    import graft.operators.BatchedInference
    import graft.operators.BatchedInference.OnnxShapedScorer
    val docs = graft.tables.Tables.documents(spark, sf0001).repartition(8)
    BatchedInference.OnnxShapedScorer.initCount.set(0)
    def run(bs: Int) = BatchedInference.embedBatched(docs, "doc_id",
        "text", new OnnxShapedScorer(64), batchSize = bs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val a = run(7)
    assert(a.nonEmpty)
    // 8 partitions × many batches × a fresh scorer instance per run —
    // the JVM-level session cache must have built the weights exactly
    // once (a per-instance lazy val would rebuild per task closure)
    assert(BatchedInference.OnnxShapedScorer.initCount.get() == 1,
      s"weights built ${BatchedInference.OnnxShapedScorer.initCount.get()}×")
    val b = run(64)
    assert(b == a, "batch size must be invisible in results")
    assert(BatchedInference.OnnxShapedScorer.initCount.get() == 1)
    a.values.foreach { v =>
      val norm = v.map(x => x * x).sum
      assert(norm == 0.0 || math.abs(norm - 1.0) < 1e-9,
        s"encoder output must be L2-normalized, got $norm")
    }
  }

  test("FileWeightsScorer: disk artifact loads once per executor from a " +
      "distributed path, equals the in-memory scorer; missing/corrupt/" +
      "truncated/mismatched artifacts fail LOUDLY at the seam") {
    import graft.operators.BatchedInference
    import graft.operators.BatchedInference.{FileWeightsScorer, OnnxShapedScorer}
    val dir = java.nio.file.Files.createTempDirectory("graft_weights")
    val wp = dir.resolve("encoder_v1.gw").toString
    FileWeightsScorer.writeWeights(wp, dim = 64, vocabSize = 4096)
    val docs = graft.tables.Tables.documents(spark, sf0001).repartition(8)
    FileWeightsScorer.loadCount.set(0)
    def run(bs: Int) = BatchedInference.embedBatched(docs, "doc_id",
        "text", new FileWeightsScorer(wp, 64), batchSize = bs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val a = run(7)
    assert(a.nonEmpty)
    // 8 partitions × many batches × a fresh scorer per run: the
    // JVM-level session cache must have read the artifact exactly once
    assert(FileWeightsScorer.loadCount.get() == 1,
      s"artifact loaded ${FileWeightsScorer.loadCount.get()}×")
    assert(run(64) == a, "batch size must be invisible in results")
    assert(FileWeightsScorer.loadCount.get() == 1)
    // same weights rows as the synthesized matrix ⟹ same embeddings:
    // exporting-to-disk must not change a single bit of the model
    val mem = BatchedInference.embedBatched(docs, "doc_id", "text",
        new OnnxShapedScorer(64, vocabSize = 4096), batchSize = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(mem == a, "disk-loaded weights must equal the in-memory model")
    // REPUBLISH at the same path (new bytes, same name): the session
    // key carries (len, mtime), so the new artifact must be a fresh
    // load, never a stale cache hit — the gen-token discipline
    FileWeightsScorer.writeWeights(wp, dim = 64, vocabSize = 2048)
    new java.io.File(wp).setLastModified(System.currentTimeMillis() + 5000)
    run(16)
    assert(FileWeightsScorer.loadCount.get() == 2,
      "a republished artifact must load fresh, not serve the stale session")
    // poison case 1: MISSING artifact — names the path and the fix
    val missing = intercept[org.apache.spark.SparkException] {
      run0(dir.resolve("nope.gw").toString, 64)
    }
    assert(missing.getMessage.contains("MISSING") ||
      Option(missing.getCause).exists(_.getMessage.contains("MISSING")))
    // poison case 2: CORRUPT artifact (wrong magic)
    val bad = dir.resolve("bad.gw").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      Array.fill[Byte](64)(0x5a))
    val corrupt = intercept[org.apache.spark.SparkException] { run0(bad, 64) }
    assert(deepMsg(corrupt).contains("CORRUPT"))
    // poison case 3: TRUNCATED artifact (torn copy)
    val torn = dir.resolve("torn.gw").toString
    FileWeightsScorer.writeWeights(torn, dim = 64, vocabSize = 4096)
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(torn),
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(ch.size() / 2) finally ch.close()
    val trunc = intercept[org.apache.spark.SparkException] { run0(torn, 64) }
    assert(deepMsg(trunc).contains("TRUNCATED"))
    // poison case 4: dim MISMATCH (model/tokenizer version skew) — the
    // artifact says 32, the pipeline declares 64
    val skew = dir.resolve("skew.gw").toString
    FileWeightsScorer.writeWeights(skew, dim = 32, vocabSize = 4096)
    val mism = intercept[org.apache.spark.SparkException] { run0(skew, 64) }
    assert(deepMsg(mism).contains("mismatch"))
  }

  private def run0(path: String, dim: Int): Unit =
    graft.operators.BatchedInference.embedBatched(
      graft.tables.Tables.documents(spark, sf0001).limit(4),
      "doc_id", "text",
      new graft.operators.BatchedInference.FileWeightsScorer(path, dim),
      batchSize = 4).collect()

  private def deepMsg(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("generateBatched: batch boundaries invisible, dropped-completion " +
      "contract violation dies loudly") {
    import spark.implicits._
    import graft.operators.BatchedInference
    import graft.operators.BatchedInference.{ExtractiveGenerator, Generator}
    val prompts = (0L until 23L).map(i =>
      (i, s"Context:\ndoc body $i about customers\nmore\n\nQuestion: q"))
      .toDF("id", "prompt").repartition(2)
    def run(bs: Int) = BatchedInference.generateBatched(prompts, "id",
        "prompt", new ExtractiveGenerator(80), batchSize = bs)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toVector
    val got = run(4)
    assert(got.length == 23)
    got.foreach { case (id, c) =>
      assert(c == s"A: doc body $id about customers", s"row $id: $c")
    }
    assert(run(1) == got && run(64) == got,
      "any batchSize must give the same relation")
    class Dropping extends Generator {
      def generate(ps: Array[String]): Array[String] =
        ps.drop(1).map(_ => "x")
    }
    val e = intercept[org.apache.spark.SparkException] {
      BatchedInference.generateBatched(prompts, "id", "prompt",
        new Dropping, batchSize = 4).collect()
    }
    assert(e.getMessage.contains("misalign"))
    // over-returning is the same contract violation as dropping: one
    // duplicated completion shifts every later id's answer by one
    class Duplicating extends Generator {
      def generate(ps: Array[String]): Array[String] =
        ps.map(_ => "x") :+ "extra"
    }
    val e2 = intercept[org.apache.spark.SparkException] {
      BatchedInference.generateBatched(prompts, "id", "prompt",
        new Duplicating, batchSize = 4).collect()
    }
    assert(e2.getMessage.contains("misalign"))
    // a generator THROWING mid-run (a model/client error on one batch)
    // fails the job loudly — never a partial relation: the batches that
    // succeeded before the throw must not surface as output rows
    class ThrowingOn(marker: String) extends Generator {
      def generate(ps: Array[String]): Array[String] = {
        if (ps.exists(_.contains(marker)))
          throw new RuntimeException("model backend exploded")
        ps.map(_ => "ok")
      }
    }
    val e3 = intercept[org.apache.spark.SparkException] {
      BatchedInference.generateBatched(prompts, "id", "prompt",
        new ThrowingOn("body 19"), batchSize = 4).collect()
    }
    assert(e3.getMessage.contains("model backend exploded"))
    // and a throw-free subset still generates whole — the failure above
    // was the generator's, not residue in the operator
    val ok = BatchedInference.generateBatched(
        prompts.filter(!col("prompt").contains("body 19")), "id", "prompt",
        new ThrowingOn("body 19"), batchSize = 4)
      .collect()
    assert(ok.length == 22 && ok.forall(_.getString(1) == "ok"))
  }

  test("ragQuery takes advisory path for niche_advice intent (rag.py:187-191)") {
    import graft.tables.Tables
    val corpus = Rag.embedCorpus(Tables.documents(spark, sf0001), col("text"))
    val out = Rag.ragQuery(corpus, col("doc_id"), col("text"), "why so slow", 5).head()
    assert(out.getAs[String]("intent") == "niche_advice")
    assert(out.getAs[String]("context") == "General niche advice requested.")
  }

  test("shapeResponse emits the M2 JSON contract (rag.py:136-141)") {
    import spark.implicits._
    val df = Seq(("answer", Seq("p1", "p2"), "more?")).toDF("r", "p", "f")
    val json = Rag.shapeResponse(df, $"r", $"p", $"f").head().getString(0)
    assert(json == """{"response":"answer","products":["p1","p2"],"follow-up_question":"more?"}""")
  }
}
