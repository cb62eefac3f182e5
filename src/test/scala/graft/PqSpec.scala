package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Knn, Pq}
import graft.oracle.OracleGen.QueryVec
import graft.tables.Tables

class PqSpec extends SparkSpec {

  private val M = 8
  private val SubDim = 8
  private val K = 16
  private val Iters = 2

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val books =
    Pq.train(emb, col("vec_id"), col("embedding"), M, SubDim, K, Iters)

  test("grouped training equals m independent Lloyd runs") {
    // the one-job grouped trainer must reproduce the per-subspace
    // Clustering.lloyd centroids bit for bit
    books.foreach { b =>
      val sub = emb.select(col("vec_id").as("id"),
        Pq.subvector(col("embedding"), b.sub, SubDim).as("sv"))
      val solo = Clustering.lloyd(sub, col("id"), col("sv"), K, Iters, SubDim)
        ._2.orderBy(col("cid")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toIndexedSeq))
      assert(b.cents == solo.toIndexedSeq,
        s"subspace ${b.sub}: grouped != independent Lloyd")
    }
  }

  test("codebooks have k centroids of subDim doubles per subspace") {
    assert(books.map(_.sub) == (0 until M))
    books.foreach { b =>
      assert(b.cents.nonEmpty && b.cents.size <= K)
      assert(b.cents.map(_._1) == b.cents.map(_._1).sorted)
      b.cents.foreach { case (_, cv) => assert(cv.size == SubDim) }
    }
  }

  test("codes are valid cids and deterministic across runs") {
    val coded = Pq.encode(emb, col("embedding"), books, SubDim)
    val validCids = books.map(_.cents.map(_._1).toSet)
    val codeCols = (0 until M).map(j => col(s"code_$j"))
    val rows = coded.select((col("vec_id") +: codeCols): _*).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (0 until M).foreach { j => assert(validCids(j).contains(r.getInt(j + 1))) }
    }
    val again = Pq.encode(emb, col("embedding"), books, SubDim)
      .select((col("vec_id") +: codeCols): _*).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("adc is the sum of the codes' table entries") {
    val dtabs = Pq.adcTables(QueryVec.values, books, SubDim)
    val r = Pq.encode(emb, col("embedding"), books, SubDim)
      .withColumn("adc", Pq.adcColumn(dtabs))
      .select((Seq(col("vec_id"), col("adc")) ++
        (0 until M).map(j => col(s"code_$j"))): _*)
      .orderBy(col("vec_id")).limit(20).collect()
    r.foreach { row =>
      val expected = (0 until M).map { j =>
        dtabs(j)._2(row.getInt(2 + j))
      }.reduceLeft(_ + _)
      assert(row.getDouble(1) == expected)
    }
  }

  test("ivf-pq composition: every shortlisted row is in a probed cell") {
    import graft.operators.Ann
    val probes = Ann.ivfProbes(QueryVec.values, 8, 2)
    val dtabs = Pq.adcTables(QueryVec.values, books, SubDim)
    val short = Pq.encode(emb, col("embedding"), books, SubDim)
      .withColumn("cell", Ann.cellOf(col("embedding"), 8, 64))
      .filter(col("cell").isin(probes: _*))
      .withColumn("adc", Pq.adcColumn(dtabs))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(20)
    val cells = short.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(probes.toSet))
    assert(short.count() > 0)
  }

  test("adcBatchColumn equals per-query adcColumn for every batch member") {
    // the batched serving contract: the CASE-dispatched batch column
    // must reproduce each member's single-query map-literal chain bit
    // for bit — same doubles, same lookups, just routed on q_id
    import spark.implicits._
    val bs = Seq(0, 3, 5)
    val perQuery = bs.map(b =>
      b.toLong -> Pq.adcTables(QueryVec.shiftedValues(b), books, SubDim))
    val codes = Pq.encode(emb, col("embedding"), books, SubDim)
    val batched = bs.map(b => codes.withColumn("q_id", lit(b.toLong)))
      .reduce(_.unionByName(_))
      .withColumn("adc", Pq.adcBatchColumn(perQuery))
      .select(col("q_id"), col("vec_id"), col("adc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    bs.foreach { b =>
      val solo = codes
        .withColumn("adc", Pq.adcColumn(
          Pq.adcTables(QueryVec.shiftedValues(b), books, SubDim)))
        .select(col("vec_id"), col("adc"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1))
      solo.foreach { case (vid, d) =>
        assert(batched((b.toLong, vid)) == d,
          s"q$b vec $vid: batched ADC != single-query ADC")
      }
    }
  }

  test("adc approximates true distance: shortlist-rerank beats floor") {
    val dtabs = Pq.adcTables(QueryVec.values, books, SubDim)
    val short = Pq.encode(emb, col("embedding"), books, SubDim)
      .withColumn("adc", Pq.adcColumn(dtabs))
      .orderBy(col("adc").asc, col("vec_id").asc).limit(50)
      .select(col("vec_id"))
    val rerank = emb.join(short, Seq("vec_id"), "left_semi")
      .withColumn("d",
        graft.functions.VectorFunctions.l2(col("embedding"),
          typedlit(QueryVec.values)))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .select(col("vec_id"))
    val exact = Knn.knn(emb, col("embedding"), col("vec_id"),
      QueryVec.values, 10, Knn.L2).select(col("vec_id"))
    val hits = rerank.join(exact, Seq("vec_id"), "left_semi").count()
    assert(hits >= 5, s"recall@10 $hits/10 below 0.5 floor")
  }
}
