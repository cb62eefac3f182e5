package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-first readers for the driver testdata (TESTDATA.md / FIXTURES.md §B)
  * plus the reference's product-CSV schema (reference `data/dummy-products.csv:1`,
  * `products_import.py:20`). Explicit schemas — never inference in production
  * paths (SURVEY.md §1.4): at 100 TB a schema-inference pass is a full extra
  * scan of the data.
  */
object Tables {

  /** reference `data/dummy-products.csv` header — id,name,price,img_url,color,category,description */
  val productsSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("price", DoubleType),
    StructField("img_url", StringType),
    StructField("color", StringType),
    StructField("category", StringType),
    StructField("description", StringType)
  ))

  /** reference `rag.py:30-37` — product_embeddings(product_id, content, embedding vector(dim)) */
  def productEmbeddingsSchema(dim: Int): StructType = StructType(Seq(
    StructField("product_id", LongType),
    StructField("content", StringType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))
  ))

  /** reference `email_fetching.py:54-57` — email_texts(id, document, embedding) */
  val emailTextsSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("document", StringType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))
  ))

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Products CSV reader — same shape the reference bulk-loads via COPY
    * (`products_import.py:18-20`). Header skipped, RFC-4180 quoting.
    */
  def productsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .schema(productsSchema)
      .csv(path)
}
