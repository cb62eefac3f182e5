package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for q_corpus_build (r21, VERDICT task 4):
  * replicates the declared query stage by stage and times each natural
  * action boundary, so "which of the 6 pipeline stages dominates now
  * that listing is fixed" has a measured answer instead of a shrug.
  * Phases: (1) gate+md5-dedup materialize, (2) minhash pairs + connected
  * components + keeper filter (CC's fixed-point loop runs its own jobs),
  * (3) LR train (driver head), (4) decon + score materialize, (5) final
  * relative-cutoff filter + pack + manifest.
  */
object ProfileCorpusBuild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LISTING_PAR_THRESHOLD", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, TrainData}
    import graft.functions.{TextAnalysis, TextFunctions}
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"[profile] ######## ROUND $round ########")
      val t0 = System.nanoTime()
      val d = graft.tables.Tables.documents(spark, dir)
      val lb = TrainData.hashBucket(col("doc_id"))
      val base = d.select(col("doc_id").as("id"),
        when(lb < 2 || (lb >= 90 && lb < 92),
          concat(col("text"),
            lit(" leak alpha beta gamma delta epsilon zeta eta")))
          .otherwise(col("text")).as("text"))
      val corpus = base
        .unionAll(base.filter(col("id") % 10 === 0)
          .select((col("id") + 100000).as("id"),
            concat(col("text"), lit(" "), col("text")).as("text")))
        .unionAll(base.filter(col("id") % 7 === 0)
          .select((col("id") + 200000).as("id"), col("text")))
      val gated = corpus.filter(
        TextAnalysis.langId(col("text")) =!= "und" &&
          TextAnalysis.qualityScore(col("text")) >= 0.3 &&
          TextFunctions.repetitionRatio(col("text"), 3) < 0.3)
      val deduped = time("1 gate+dedup checkpoint") {
        gated.groupBy(md5(col("text")).as("ck"))
          .agg(min(col("id")).as("id"), max(col("text")).as("text"))
          .select(col("id"), col("text"))
          .localCheckpoint()
      }
      val kept = time("2 minhash pairs + CC + keeper filter") {
        val pairs = Dedup.minhashPairs(deduped, col("id"), col("text"),
            maxBucket = 50)
          .select(col("a_id"), col("b_id"))
        val nonKeepers = Dedup.connectedComponents(pairs)
          .filter(col("comp") =!= col("id")).select(col("id"))
        deduped.join(nonKeepers, Seq("id"), "left_anti")
          .withColumn("split", TrainData.hashSplit(col("id")))
          .localCheckpoint()
      }
      val train = kept.filter(col("split") === "train")
        .select(col("id"), col("text"))
      val test = kept.filter(col("split") === "test")
        .select(col("id"), col("text"))
      def shSide(df: DataFrame, side: String) =
        df.select(col("id").as(side + "_id"),
          explode(TextFunctions.shingles(col("text"), 3, distinct = true))
            .as("sh"))
      val weights = time("3 LR train (head)") {
        val wRow = TrainData.lrQualityTrain(d, col("doc_id"), col("text"),
          col("lang") === "en", steps = 3).head()
        (0 to 3).map(wRow.getLong)
      }
      val (decon, scored) = time("4 decon + score checkpoint") {
        val contaminated = Dedup.crossOverlapFromShingles(
            shSide(train, "train"), shSide(test, "test"),
            minShared = 5, maxDf = 50)
          .select(col("train_id").as("id")).distinct()
        val dec = train.join(contaminated, Seq("id"), "left_anti")
        val sc = TrainData.lrQualityScore(dec, col("id"), col("text"),
          weights).localCheckpoint()
        (dec, sc)
      }
      time("5 cutoff + pack + manifest") {
        val scStats = scored.agg(count(lit(1)).as("n_sc"),
          sum(col("p_fp")).as("sum_sc"))
        val qual = decon.join(
          scored.crossJoin(broadcast(scStats))
            .filter(col("p_fp") * col("n_sc") > col("sum_sc"))
            .select(col("id")),
          Seq("id"), "left_semi")
        TrainData.packSequences(qual, col("id"), col("text"),
            seqLen = 512L, shards = 4)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_bins"), sum(col("n_docs")).as("n_docs"),
            sum(col("sum_tokens")).as("sum_tokens"),
            min(col("min_id")).as("min_id"), max(col("max_id")).as("max_id"))
          .orderBy(col("shard"))
          .count()
      }
      println(f"[profile] total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
