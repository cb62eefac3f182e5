package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Knn, Quantize}
import graft.oracle.OracleGen.QueryVec
import graft.tables.Tables

class QuantizeIvfSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001)

  test("ivf cells are within [0, nlist) and every vector gets one") {
    val cells = emb.select(Ann.cellOf(col("embedding"), 8, 64).as("c"))
    val mm = cells.agg(min(col("c")), max(col("c")), count(lit(1))).head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 8)
    assert(mm.getLong(2) == emb.count())
  }

  test("ivfProbes matches the column-side cell of the query vector") {
    // the query's own cell must be the first probe
    val probes = Ann.ivfProbes(QueryVec.values, 8, 2)
    import spark.implicits._
    val qCell = Seq(1).toDF("x")
      .select(Ann.cellOf(typedlit(QueryVec.values), 8, 64)).head().getInt(0)
    assert(probes.head == qCell)
    assert(probes.distinct.length == probes.length)
  }

  test("annIvf hits carry exact distances (subset of brute-force knn)") {
    val ann = Ann.annIvf(emb, col("embedding"), col("vec_id"), QueryVec.values,
      k = 10, nlist = 8, nprobe = 2).collect()
    assert(ann.nonEmpty)
    val exact = Knn.knn(emb, col("embedding"), col("vec_id"), QueryVec.values, 500)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("distance")).toMap
    ann.foreach { r =>
      assert(exact(r.getAs[Long]("vec_id")) == r.getAs[Double]("distance"))
    }
  }

  test("quantized codes are within [-127, 127] and zero vectors stay zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val q = df.select(col("id"),
        Quantize.int8(col("v"), Quantize.maxAbs(col("v"))).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(q(1L) == Seq(64L, -127L, 32L))
    assert(q(2L) == Seq(0L, 0L, 0L))
  }

  test("quantized knn ranks near the exact dot-product top-k") {
    val quant = Quantize.knnQuantized(emb, col("embedding"), col("vec_id"),
      QueryVec.values, k = 10).collect().map(_.getAs[Long]("vec_id")).toSet
    val exactTop = Knn.knn(emb, col("embedding"), col("vec_id"),
      QueryVec.values, 20, Knn.Dot).collect().map(_.getAs[Long]("vec_id")).toSet
    // int8 quantization error is small relative to the top-k margin: the
    // quantized top-10 should mostly sit inside the exact top-20
    assert((quant intersect exactTop).size >= 7)
  }
}
