package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits (known values)") {
    import spark.implicits._
    val r = Seq((3L, 5L), (255L, 255L), (0L, 0L), (255L, 0L), (0L, 255L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 8)).as[Long].collect()
    // x=3 (bits 0,1 -> z bits 0,2 = 5), y=5 (bits 0,2 -> z bits 1,5 = 34)
    assert(r(0) === 39L)
    assert(r(1) === 65535L)              // full 8+8 bits
    assert(r(2) === 0L)
    assert(r(3) === 0x5555L)             // x occupies the even bits
    assert(r(4) === 0xAAAAL)             // y occupies the odd bits
  }

  test("z-clustered layout bounds BOTH dims per file; single-col sort only one") {
    import spark.implicits._
    // full 256x256 grid, one row per cell
    val grid = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), 8))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    grid.repartitionByRange(16, col("z")).sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(s"$dir/zorder")
    grid.repartitionByRange(16, col("x"))
      .write.mode("overwrite").parquet(s"$dir/xsort")
    def avgRanges(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
        .agg(avg("xr"), avg("yr")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (zx, zy) = avgRanges(s"$dir/zorder")
    val (sx, sy) = avgRanges(s"$dir/xsort")
    // z-order: each of 16 files pins the top 2 bits of BOTH dims (~1/4 of
    // each 256-wide domain; repartitionByRange boundaries are SAMPLED, so
    // files straddle quadrant edges and the average lands near 100 — still
    // a bounded box on both dims, vs the full 255 span single-sort leaves)
    assert(zx < 128, s"z-order avg x-range $zx should be quadrant-bounded")
    assert(zy < 128, s"z-order avg y-range $zy should be quadrant-bounded")
    // single-column sort: x pruned hard, y not at all — a y-predicate
    // reads every file
    assert(sx < 32, s"x-sort avg x-range $sx should be ~16")
    assert(sy > 200, s"x-sort avg y-range $sy should span the domain")
  }
}
