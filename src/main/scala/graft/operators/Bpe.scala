package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed byte-pair-encoding merge training — the tokenizer-learning
  * step of an LLM data pipeline (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"), run as a Spark
  * aggregation instead of a single-machine loop.
  *
  * Scale design: the corpus is touched EXACTLY ONCE — one map-side-combined
  * word-frequency shuffle ([[wordCounts]]). Every merge iteration after
  * that operates on the vocabulary relation (word, freq, syms): pair
  * counting is an explode + one keyed aggregation over the vocabulary,
  * the argmax is a 1-row TakeOrdered collect, and the merge application
  * is a codegen'd fold over each word's symbol array. 100 TB of text
  * reduces to a word table whose size is the corpus' distinct-word count;
  * the iterative phase never rescans the corpus. The vocabulary relation
  * is lineage-cut every round (the same [[Stage]] discipline as
  * Graph.pagerank / Clustering.lloyd), so the composed plan stays bounded
  * and [[Stage.Parquet]] gives a durable mid-training restart point.
  *
  * Determinism: pair counts are integer sums of Long frequencies; the
  * argmax tie-breaks on (count DESC, lhs ASC, rhs ASC) under binary
  * string order — both engines replay the identical merge sequence, so
  * the whole training run is oracle-checkable (the driver's DuckDB twin
  * unrolls the same iterations in SQL).
  *
  * No word-boundary marker is appended (open-vocabulary variant); merges
  * therefore never span words, because symbols only exist within a word.
  */
object Bpe {

  /** One learned merge rule: `lhs`+`rhs` fused at `rank`, supported by
    * `cnt` weighted adjacent occurrences at learn time.
    */
  final case class Merge(rank: Long, lhs: String, rhs: String, cnt: Long)

  /** Word-frequency relation of the corpus: the single corpus-wide
    * shuffle. Tokenization is the engine-standard [[TextFunctions.tokens]]
    * (lowercase, whitespace split) — mirrored by the oracle's `toksSql`.
    */
  def wordCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextFunctions.tokens(textCol)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial symbolization: one single-character symbol per position
    * (1-based substring — identical to the oracle's `word[i]`).
    */
  private def initSyms: Column =
    expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")

  /** Apply one merge rule greedily left-to-right as a fold: append each
    * symbol, fusing it with the accumulator's last element when they
    * spell (lhs, rhs). The fold is equivalent to the classic
    * scan-with-skip application because a fused token `lhs+rhs` can
    * never equal `lhs` again (rhs is non-empty), so a merge can't
    * cascade within the pass; for lhs==rhs runs ("aaaa") both semantics
    * fuse alternate pairs. Pure built-in array ops — whole-stage
    * codegen, no UDF.
    */
  def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(lhs) && s === lit(rhs),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
        .otherwise(concat(acc, array(s))))

  /** Learn `merges` BPE rules from the corpus. Returns the learned rule
    * sequence and the final vocabulary relation
    * (word, freq, syms = subword segmentation under all learned rules) —
    * the table a tokenizer ships to encode new text.
    */
  def train(docs: DataFrame, textCol: Column, merges: Int,
            stage: Stage = Stage.Local): (Seq[Merge], DataFrame) = {
    require(merges >= 1, "bpe: need at least one merge")
    var words = stage.cut(
      wordCounts(docs, textCol).withColumn("syms", initSyms), "bpe_words_0")
    val out = Seq.newBuilder[Merge]
    for (t <- 1 to merges) {
      val best = words.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      require(best.nonEmpty, s"bpe: no adjacent symbol pairs left at merge $t")
      val (l, r, cnt) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      out += Merge(t.toLong, l, r, cnt)
      words = stage.cut(
        words.withColumn("syms", applyMerge(col("syms"), l, r)),
        s"bpe_words_$t")
    }
    (out.result(), words)
  }
}
