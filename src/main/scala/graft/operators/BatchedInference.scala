package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The batched model-inference boundary, made explicit and pluggable.
  *
  * The reference embeds with `model.encode(texts)` over a Python LIST —
  * one batched model call per ingest chunk (reference `rag.py:27,49`;
  * Chroma's implicit add-time embedding, `email_fetching.py:54-57`, is
  * the same call hidden in the store). In this engine the deterministic
  * [[graft.expressions.HashEmbed]] expression covers the oracle-checked
  * path; THIS object is the seam a real model plugs into: a
  * `mapPartitions` stage that buffers rows into fixed-size batches and
  * makes ONE scorer call per batch — the iterator→iterator shape
  * [[Multimodal.decodeBatch]] also uses, and the signature ONNX/Torch
  * serving wrappers expose (per-row model calls are the classic
  * inference anti-pattern; batch amortizes weight access / JNI / RPC).
  *
  * Scale: the stage is NARROW — no shuffle, batch memory bounded by
  * `batchSize`, parallelism = input partitions, so it distributes like
  * any projection. A real scorer (loading weights once per executor via
  * lazy/transient state) slots in behind [[BatchScorer]] with zero plan
  * change; `q_embed_batched` pins the plan and the results against the
  * expression path's oracle.
  */
object BatchedInference {

  /** The pluggable model contract: a whole batch of texts in, one
    * vector per text out (same order), called once per batch. Must be
    * serializable — it ships to executors; heavyweight state (weights,
    * sessions) belongs in a `@transient lazy val` inside the impl so
    * each executor materializes it once.
    */
  trait BatchScorer extends Serializable {
    def dim: Int
    def score(texts: Array[String]): Array[Array[Double]]
  }

  /** Deterministic stand-in model: the engine's hash-embedding applied
    * batch-at-a-time — bit-identical to the [[graft.expressions.HashEmbed]]
    * expression, so the DuckDB oracle replays the batched path exactly.
    */
  final class HashEmbedScorer(val dim: Int) extends BatchScorer {
    def score(texts: Array[String]): Array[Array[Double]] =
      texts.map(t => graft.expressions.HashEmbed.embed(t, dim))
  }

  /** Enforce the [[BatchScorer]] OUTPUT contract on one batch's result:
    * exactly one vector per input text (anything else would silently
    * MISALIGN ids with vectors downstream — the zip truncates, it does
    * not throw) and every vector at the declared dim (a wrong-dim
    * vector poisons every fixed-width consumer: the store layout, the
    * distance kernels, the PQ codebooks). A misbehaving model must die
    * loudly at the seam, not corrupt quietly past it.
    */
  private def validated(vecs: Array[Array[Double]], nTexts: Int,
                        dim: Int): Array[Array[Double]] = {
    if (vecs.length != nTexts) throw new IllegalStateException(
      s"scorer returned ${vecs.length} vectors for $nTexts texts — a " +
        "model dropping or duplicating rows would silently misalign ids")
    var i = 0
    while (i < vecs.length) {
      if (vecs(i) == null || vecs(i).length != dim)
        throw new IllegalStateException(
          s"scorer returned a ${if (vecs(i) == null) "null"
            else vecs(i).length.toString}-dim vector at batch offset $i " +
            s"— the declared dim is $dim")
      i += 1
    }
    vecs
  }

  /** (id, text) → (id, embedding) through `scorer`, one call per
    * ≤`batchSize` rows. Output column is `embedding` ARRAY<DOUBLE>.
    * STRICT: a scorer violating the output contract (row count, dim)
    * or throwing fails the task — use [[embedBatchedSafe]] when poison
    * rows must be isolated instead of aborting the job.
    */
  def embedBatched(df: DataFrame, idName: String, textName: String,
                   scorer: BatchScorer, batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1, s"batchSize must be ≥ 1, got $batchSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idName).cast("long"), col(textName).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val vecs = validated(
            scorer.score(batch.iterator.map(_._2).toArray),
            batch.size, scorer.dim)
          batch.iterator.zip(vecs.iterator)
            .map { case ((id, _), v) => (id, v) }
        }
      }
      .toDF(idName, "embedding")
  }

  /** FAULT-ISOLATING variant of [[embedBatched]] — the seam contract a
    * real model needs under real inputs: a batch whose scorer call
    * throws (one poison row — an OOM-ing sequence, a tokenizer crash)
    * is retried ONE ROW PER CALL, so errors surface PER-ROW, never
    * per-partition: the poison row comes back as (id, null,
    * embed_error) and every innocent row in its batch still embeds.
    * Batch boundaries stay invisible in the results either way —
    * q_embed_batched-family oracles hold at any batchSize. Output:
    * (id, embedding, embed_error) with exactly one of the last two
    * null per row. Contract violations (wrong row count / wrong dim)
    * are isolated the same way: the strict [[validated]] check runs
    * per call, so a batch-level violation bisects to the row(s) that
    * caused it. Cost: the row-at-a-time retry is the inference
    * anti-pattern by design — it prices the POISON rows only; healthy
    * batches keep the one-call-per-batch shape.
    */
  def embedBatchedSafe(df: DataFrame, idName: String, textName: String,
                       scorer: BatchScorer,
                       batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1, s"batchSize must be ≥ 1, got $batchSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idName).cast("long"), col(textName).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val texts = batch.iterator.map(_._2).toArray
          val whole: Option[Array[Array[Double]]] =
            try Some(validated(scorer.score(texts), texts.length,
              scorer.dim))
            catch { case _: Exception => None }
          whole match {
            case Some(vecs) =>
              batch.iterator.zip(vecs.iterator)
                .map { case ((id, _), v) => (id, v, null: String) }
            case None => // bisect to rows: isolate the poison
              batch.iterator.map { case (id, t) =>
                try {
                  val v = validated(scorer.score(Array(t)), 1, scorer.dim)
                  (id, v(0), null: String)
                } catch { case e: Exception =>
                  (id, null: Array[Double],
                    s"${e.getClass.getSimpleName}: ${e.getMessage}".take(200))
                }
              }
          }
        }
      }
      .toDF(idName, "embedding", "embed_error")
  }

  /** An ONNX-RUNTIME-SHAPED scorer: the full lifecycle and compute
    * shape of a MiniLM-family sentence encoder behind ONNX Runtime
    * (reference `rag.py:27,49` — SentenceTransformer.encode), with the
    * runtime itself replaced by deterministic arithmetic. What it
    * proves about the seam, beyond [[HashEmbedScorer]]'s plumbing:
    *
    *  - WEIGHTS LOAD ONCE PER EXECUTOR, in the JVM-level
    *    [[OnnxShapedScorer.sessions]] cache — NOT a per-instance
    *    `@transient lazy val`, which re-initializes on every task's
    *    deserialized closure copy (the classic seam trap: a 90 MB model
    *    re-loaded per task). RagSpec asserts exactly one init across a
    *    multi-partition, multi-batch run.
    *  - The per-call shape is a real encoder's: tokenize → pad/truncate
    *    to `maxSeqLen` int ids → ONE batched pass over the embedding
    *    matrix → mean-pool non-pad positions → L2 normalize. Swapping
    *    the pass body for `session.run(inputIds, attentionMask)` is the
    *    whole integration.
    *
    * Deterministic (hash-derived weights), so results are reproducible
    * and batch-size-invariant — but NOT SQL-replayable cheaply; the
    * oracle-checked path stays [[HashEmbedScorer]]. This class is the
    * day-one template a real user copies.
    */
  final class OnnxShapedScorer(val dim: Int = 64, maxSeqLen: Int = 32,
                               vocabSize: Int = 4096) extends BatchScorer {
    private def session: Array[Array[Double]] =
      OnnxShapedScorer.sessionFor(dim, vocabSize)

    private def tokenIds(text: String): Array[Int] = {
      val toks = text.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      val ids = toks.iterator.take(maxSeqLen).map { t =>
        math.floorMod(scala.util.hashing.MurmurHash3.stringHash(t, 42),
          vocabSize - 1) + 1 // 0 is the pad id
      }.toArray
      ids ++ Array.fill(maxSeqLen - ids.length)(0)
    }

    def score(texts: Array[String]): Array[Array[Double]] = {
      val w = session // one cache hit per call; one BUILD per executor
      texts.map(t => OnnxShapedScorer.meanPoolNormalize(w, tokenIds(t), dim))
    }
  }

  object OnnxShapedScorer {
    /** Executor-wide session cache — the JVM singleton a real ONNX
      * `OrtSession` belongs in (keyed by model identity). A plain
      * `@transient lazy val` on the scorer instance is WRONG at this
      * seam: every task deserializes its own closure copy and would
      * rebuild the "weights" per task.
      */
    private val sessions =
      new java.util.concurrent.ConcurrentHashMap[(Int, Int),
        Array[Array[Double]]]()

    /** Builds observable for the lifecycle spec. */
    val initCount = new java.util.concurrent.atomic.AtomicInteger(0)

    /** The encoder's compute body (gather → mean-pool non-pad positions
      * → L2 normalize), shared with [[FileWeightsScorer]]: id 0 is pad.
      */
    private[operators] def meanPoolNormalize(w: Array[Array[Double]],
                                             ids: Array[Int],
                                             dim: Int): Array[Double] = {
      val out = new Array[Double](dim)
      var n = 0
      var i = 0
      while (i < ids.length) { // the "batched pass": gather + mean-pool
        if (ids(i) != 0) {
          val row = w(ids(i))
          var j = 0
          while (j < dim) { out(j) += row(j); j += 1 }
          n += 1
        }
        i += 1
      }
      if (n > 0) { var j = 0; while (j < dim) { out(j) /= n; j += 1 } }
      var norm = 0.0
      var j = 0
      while (j < dim) { norm += out(j) * out(j); j += 1 }
      if (norm > 0) {
        val inv = 1.0 / math.sqrt(norm)
        j = 0
        while (j < dim) { out(j) *= inv; j += 1 }
      }
      out
    }

    private def sessionFor(dim: Int, vocabSize: Int): Array[Array[Double]] =
      sessions.computeIfAbsent((dim, vocabSize), { _ =>
        initCount.incrementAndGet()
        Array.tabulate(vocabSize) { t =>
          Array.tabulate(dim) { j =>
            val h = scala.util.hashing.MurmurHash3
              .productHash((t, j), 1337)
            math.floorMod(h, 2000) / 1000.0 - 1.0
          }
        }
      })
  }

  /** The DISK-LOADED scorer — [[OnnxShapedScorer]] with the weights
    * coming from a distributed artifact file instead of in-memory
    * synthesis: the lifecycle a REAL integration hits first (RagSpec
    * proved one-session-per-executor, but a real model's day-one
    * failure modes are the ARTIFACT PATH — file not distributed to an
    * executor, torn/corrupt download, a weights file that doesn't match
    * the tokenizer/encoder configuration). Every poison case fails
    * LOUDLY at session init, naming the artifact and the mismatch —
    * never a quiet garbage embedding:
    *
    *  - missing file → error naming the path and the distribution fix;
    *  - wrong magic / truncated body → "corrupt artifact" with the path;
    *  - unsupported format version → names both versions;
    *  - artifact dim ≠ the scorer's configured dim (the model/tokenizer
    *    version-mismatch class) → names both dims.
    *
    * The session cache is the executor-wide JVM singleton (cf.
    * [[OnnxShapedScorer.sessions]]), keyed by (canonical path, length,
    * mtime, dim) so a REPUBLISHED artifact at the same path is a new
    * session, never a stale hit — the same stale-cache discipline the
    * staged indexes' gen tokens enforce. Swapping [[FileWeightsScorer
    * .load]]'s body for `OrtEnvironment.createSession(bytes)` is the
    * whole real-runtime integration.
    */
  final class FileWeightsScorer(weightsPath: String, val dim: Int,
                                maxSeqLen: Int = 32) extends BatchScorer {
    def score(texts: Array[String]): Array[Array[Double]] = {
      val w = FileWeightsScorer.sessionFor(weightsPath, dim)
      val vocabSize = w.length
      texts.map { t =>
        val toks = t.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty)
        val ids = toks.iterator.take(maxSeqLen).map { tok =>
          math.floorMod(scala.util.hashing.MurmurHash3.stringHash(tok, 42),
            vocabSize - 1) + 1 // 0 is the pad id
        }.toArray
        OnnxShapedScorer.meanPoolNormalize(w, ids, dim)
      }
    }
  }

  object FileWeightsScorer {
    private val Magic = 0x47524657 // "GRFW"
    private val Version = 1

    private final case class SessionKey(path: String, len: Long,
                                        mtime: Long, dim: Int)
    private val sessions = new java.util.concurrent.ConcurrentHashMap[
      SessionKey, Array[Array[Double]]]()

    /** Loads observable for the lifecycle spec (cf.
      * [[OnnxShapedScorer.initCount]]).
      */
    val loadCount = new java.util.concurrent.atomic.AtomicInteger(0)

    /** Write a deterministic weights artifact (magic, version,
      * vocabSize, dim, then vocabSize×dim doubles) — the test/dev twin
      * of exporting a real model; rows match [[OnnxShapedScorer]]'s
      * synthesized matrix so the two scorers agree given the same
      * (dim, vocabSize).
      */
    def writeWeights(path: String, dim: Int, vocabSize: Int): Unit = {
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(path)))
      try {
        out.writeInt(Magic)
        out.writeInt(Version)
        out.writeInt(vocabSize)
        out.writeInt(dim)
        var t = 0
        while (t < vocabSize) {
          var j = 0
          while (j < dim) {
            val h = scala.util.hashing.MurmurHash3.productHash((t, j), 1337)
            out.writeDouble(math.floorMod(h, 2000) / 1000.0 - 1.0)
            j += 1
          }
          t += 1
        }
      } finally out.close()
    }

    private[operators] def sessionFor(path: String,
                                      dim: Int): Array[Array[Double]] = {
      val f = new java.io.File(path)
      if (!f.exists()) throw new IllegalStateException(
        s"weights artifact MISSING at $path on ${java.net.InetAddress
          .getLocalHost.getHostName} — distribute it to every executor " +
          "(spark.files / --files / a shared filesystem) before running " +
          "the embed stage")
      val key = SessionKey(f.getCanonicalPath, f.length(), f.lastModified(),
        dim)
      sessions.computeIfAbsent(key, { _ => load(f, dim) })
    }

    private def load(f: java.io.File, dim: Int): Array[Array[Double]] = {
      loadCount.incrementAndGet()
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(new java.io.FileInputStream(f)))
      try {
        val magic = in.readInt()
        if (magic != Magic) throw new IllegalStateException(
          s"weights artifact at $f is CORRUPT (magic 0x${magic.toHexString}" +
            s", expected 0x${Magic.toHexString}) — re-export or re-download it")
        val ver = in.readInt()
        if (ver != Version) throw new IllegalStateException(
          s"weights artifact at $f has format version $ver; this build " +
            s"supports $Version — upgrade the artifact or the library")
        val vocabSize = in.readInt()
        val fdim = in.readInt()
        if (vocabSize <= 1 || fdim <= 0) throw new IllegalStateException(
          s"weights artifact at $f is CORRUPT (vocabSize=$vocabSize, " +
            s"dim=$fdim)")
        if (fdim != dim) throw new IllegalStateException(
          s"weights artifact at $f encodes dim $fdim but the scorer is " +
            s"configured for dim $dim — model/tokenizer version mismatch; " +
            "align the artifact with the pipeline's declared dim")
        val w = Array.ofDim[Array[Double]](vocabSize)
        var t = 0
        try {
          while (t < vocabSize) {
            val row = new Array[Double](fdim)
            var j = 0
            while (j < fdim) { row(j) = in.readDouble(); j += 1 }
            w(t) = row
            t += 1
          }
        } catch { case _: java.io.EOFException =>
          throw new IllegalStateException(
            s"weights artifact at $f is TRUNCATED (ends inside row $t of " +
              s"$vocabSize) — a torn download/copy; re-distribute it")
        }
        w
      } finally in.close()
    }
  }

  /** The batched GENERATION contract — the M2 boundary (reference
    * `rag.py:126-166`: one POST per composed prompt to an external
    * LLM). The engine owns everything up to and after this seam —
    * context assembly, the prompt template (Rag.promptOf), JSON
    * response shaping (Rag.shapeResponse) — and a real LLM client
    * (HTTP batch endpoint, local llama.cpp, ONNX decoder) slots in
    * behind this trait with zero plan change: one call per ≤batchSize
    * prompts, same batching rationale as [[BatchScorer]] (per-prompt
    * calls are the N+1 serving shape; batch amortizes connection /
    * weight access / KV-cache setup).
    */
  trait Generator extends Serializable {
    /** One completion per prompt, same order. */
    def generate(prompts: Array[String]): Array[String]
  }

  /** Deterministic stand-in generator: an EXTRACTIVE answer — the first
    * context line of the M2 prompt template ("Context:\n{context}\n\n
    * Question: {query}"), truncated to `maxChars`, prefixed "A: ". Pure
    * string arithmetic on the prompt, so the DuckDB oracle replays the
    * batched generation path exactly (q_generate_batched) — the
    * generation twin of [[HashEmbedScorer]].
    */
  final class ExtractiveGenerator(maxChars: Int = 80) extends Generator {
    def generate(prompts: Array[String]): Array[String] =
      prompts.map { p =>
        val body = p.indexOf("Context:\n") match {
          case -1 => p
          case i => p.substring(i + "Context:\n".length)
        }
        "A: " + body.takeWhile(_ != '\n').take(maxChars)
      }
  }

  /** (id, prompt) → (id, completion) through `gen`, one call per
    * ≤`batchSize` prompts — the M2 generation stage as an engine
    * operator. STRICT on the output contract (exactly one completion
    * per prompt — a generator dropping or duplicating rows would
    * silently misalign ids, cf. [[validated]]); a generator that throws
    * fails the task. Narrow stage: no shuffle, batch memory bounded,
    * parallelism = input partitions.
    */
  def generateBatched(df: DataFrame, idName: String, promptName: String,
                      gen: Generator, batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, s"batchSize must be ≥ 1, got $batchSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idName).cast("long"), col(promptName).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val outs = gen.generate(batch.iterator.map(_._2).toArray)
          if (outs.length != batch.size) throw new IllegalStateException(
            s"generator returned ${outs.length} completions for " +
              s"${batch.size} prompts — a model dropping or duplicating " +
              "rows would silently misalign ids")
          batch.iterator.zip(outs.iterator)
            .map { case ((id, _), o) => (id, o) }
        }
      }
      .toDF(idName, "completion")
  }

  /** The batched PAIR-scorer contract — the cross-encoder boundary. A
    * cross-encoder reads query and document JOINTLY (one forward pass
    * per pair), which is why it reranks better than any bi-encoder dot
    * and why it only ever runs over a small candidate set: cost is per
    * pair, so it slots AFTER first-stage retrieval (BM25/vector/RRF
    * top-N), never over the corpus. Same batching rationale as
    * [[BatchScorer]]: one model call per ≤batchSize pairs.
    */
  trait PairScorer extends Serializable {
    /** One integer fixed-point relevance score per (query, doc) pair,
      * same order.
      */
    def score(pairs: Array[(String, String)]): Array[Long]
  }

  /** Deterministic stand-in cross-encoder: floor(dot(hash_embed(q),
    * hash_embed(d)) · 1e6) + 100000 · |distinct shared tokens| — a
    * genuinely PAIRWISE function (the overlap term cannot be factored
    * into independent encodings), replayed exactly by the DuckDB oracle
    * (the dot is the bit-identical left-associated chain the whole
    * vector family uses; the overlap is an integer set intersection).
    */
  final class HashCrossScorer(val dim: Int = 64) extends PairScorer {
    def score(pairs: Array[(String, String)]): Array[Long] =
      pairs.map { case (q, d) =>
        val qe = graft.expressions.HashEmbed.embed(q, dim)
        val de = graft.expressions.HashEmbed.embed(d, dim)
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += de(i) * qe(i); i += 1 }
        val shared = graft.expressions.HashEmbed.tokens(q).toSet
          .intersect(graft.expressions.HashEmbed.tokens(d).toSet).size
        math.floor(dot * 1e6).toLong + 100000L * shared
      }
  }

  /** (id, query, doc) → (id, rerank_fp) through `scorer`, one call per
    * ≤`batchSize` pairs — the rerank stage. Narrow (no shuffle), batch
    * memory bounded, parallelism = input partitions; a real ONNX/RPC
    * cross-encoder slots in behind [[PairScorer]] with zero plan change.
    */
  def scorePairsBatched(df: DataFrame, idName: String, queryName: String,
                        docName: String, scorer: PairScorer,
                        batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1, s"batchSize must be ≥ 1, got $batchSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idName).cast("long"), col(queryName).cast("string"),
        col(docName).cast("string"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val scores = scorer.score(batch.iterator
            .map(r => (r._2, r._3)).toArray)
          batch.iterator.zip(scores.iterator)
            .map { case ((id, _, _), s) => (id, s) }
        }
      }
      .toDF(idName, "rerank_fp")
  }
}
