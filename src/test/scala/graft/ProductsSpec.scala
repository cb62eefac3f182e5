package graft

import org.apache.spark.sql.functions._

import graft.operators.Products
import graft.tables.Tables

class ProductsSpec extends SparkSpec {

  private lazy val csvPath =
    getClass.getResource("/products_sample.csv").getPath

  test("productsCsv reads the 7-column schema with RFC-4180 quoting") {
    val df = Tables.productsCsv(spark, csvPath)
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "name", "price", "img_url", "color", "category", "description"))
    val rows = df.orderBy(col("id")).collect()
    assert(rows.length == 5)
    assert(rows(0).getAs[String]("description") == "Lightweight trail shoe, grippy sole")
    assert(rows(0).getAs[Double]("price") == 79.99)
  }

  test("buildProductEmbeddings: content template byte-matches rag.py:48 shape") {
    val out = Products.buildProductEmbeddings(Tables.productsCsv(spark, csvPath))
      .orderBy(col("product_id")).collect()
    assert(out.length == 5)
    val c0 = out(0).getAs[String]("content")
    assert(c0 == "Trail Runner, category: shoes, color: red, price: 79.99$, " +
      "image: http://img.example/1.png, description: Lightweight trail shoe, grippy sole")
    // embeddings are unit-norm 64-dim
    val e0 = out(0).getSeq[Double](2)
    assert(e0.length == 64)
    assert(math.abs(math.sqrt(e0.map(x => x * x).sum) - 1.0) < 1e-12)
    // and equal the pure-Scala embedding of the same content
    assert(e0 == graft.expressions.HashEmbed.embed(c0, 64).toSeq)
  }

  test("importAndEmbed: CSV -> embed -> parquet sink round-trips (S2/S5)") {
    val out = java.nio.file.Files.createTempDirectory("graft_pe").toFile.getAbsolutePath
    Products.importAndEmbed(spark, csvPath, s"$out/product_embeddings")
    val back = spark.read.parquet(s"$out/product_embeddings")
    assert(back.schema.fieldNames.toSeq == Seq("product_id", "content", "embedding"))
    assert(back.count() == 5)
    // append semantics (S5 is an append sink)
    Products.importAndEmbed(spark, csvPath, s"$out/product_embeddings")
    assert(spark.read.parquet(s"$out/product_embeddings").count() == 10)
  }

  test("buildEmailTexts: E1 chain produces (id, document, embedding)") {
    import spark.implicits._
    val raw = "Content-Type: text/plain\n\nan email body with words"
    val msgs = Seq(("m1", raw), ("m2", "Content-Type: text/html\n\n<b>x</b>")).toDF("id", "raw")
    val out = Products.buildEmailTexts(msgs).collect()
    assert(out.length == 1) // html-only dropped
    assert(out(0).getString(0) == "m1")
    assert(out(0).getString(1) == "an email body with words")
    assert(out(0).getSeq[Double](2) ==
      graft.expressions.HashEmbed.embed("an email body with words", 64).toSeq)
  }
}
