package graft.core

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton-key layout: bit interleave exactness against a scalar
  * mirror, quantizer clamping, and the locality property a 2-D box
  * predicate actually buys. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1))
    }

  test("interleave equals the scalar Morton mirror") {
    val pts = for (x <- 0L to 16L; y <- Seq(0L, 1L, 7L, 255L, 65535L))
      yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", ZOrder.interleave(Seq(col("x"), col("y")), 16))
      .select("x", "y", "z").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y, 16), s"($x,$y)")
    }
  }

  test("quantize is equi-width and clamps out-of-range values") {
    val got = Seq(-5.0, 0.0, 24.9, 25.0, 99.9, 100.0, 1e9)
      .toDF("v")
      .withColumn("q", ZOrder.quantize(col("v"), 0.0, 100.0, bits = 2))
      .select("v", "q").as[(Double, Long)].collect().toMap
    assert(got(-5.0) == 0L && got(0.0) == 0L)
    assert(got(24.9) == 0L && got(25.0) == 1L && got(99.9) == 3L)
    assert(got(100.0) == 3L && got(1e9) == 3L, "clamped to the edge bucket")
  }

  test("a non-prefix range predicate touches few z-ordered files") {
    val root = Files.createTempDirectory("zorder_spec_").toString
    val grid = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).as("y"))
    ZOrder.writeZOrdered(grid, s"$root/z",
      Seq(col("x"), col("y")), files = 16, bits = 8)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$root/linear")

    def touched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()

    // a y-slab is the case 1-D x-clustering cannot help: its matches
    // live in EVERY x-sorted file, but only in the z-files whose
    // hyper-rectangle crosses the slab
    val ySlab = col("y").between(64, 79)
    assert(touched(s"$root/linear", ySlab) == 16L,
      "x-sorted layout spreads a y-slab across every file")
    val zy = touched(s"$root/z", ySlab)
    assert(zy <= 8L, s"z-layout confines the y-slab to few files: $zy")

    // and the SAME layout still confines an x-slab — locality in both
    // interleaved dimensions at once is the point of the Morton key
    val zx = touched(s"$root/z", col("x").between(96, 111))
    assert(zx <= 8L, s"z-layout confines the x-slab too: $zx")
  }

  test("the interleave stays inside whole-stage codegen") {
    val df = spark.range(1000)
      .select((col("id") % 32).as("x"), (col("id") / 32).as("y"))
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 8).as("z"))
    df.collect() // AQE finalizes codegen on execution
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "shift/mask interleave must not break the WSCG span")
  }
}
