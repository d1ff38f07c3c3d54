package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class VecOpsSpec extends SparkSpec {

  import spark.implicits._

  private def floats(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("vec_dot / vec_cosine match the builtin aggregate(zip_with) formulation") {
    val df = Seq(
      (floats(1, 2, 3), floats(4, 5, 6)),
      (floats(0.5, -1.5, 2.25), floats(-3, 0.25, 8)),
      (floats(1, 0, 0), floats(0, 1, 0))
    ).toDF("a", "b")
    val builtinDot = aggregate(zip_with($"a", $"b", _ * _), lit(0.0d),
      (acc, x) => acc + x.cast("double"))
    val builtinCos = builtinDot /
      (sqrt(aggregate(zip_with($"a", $"a", _ * _), lit(0.0d),
        (acc, x) => acc + x.cast("double"))) *
       sqrt(aggregate(zip_with($"b", $"b", _ * _), lit(0.0d),
        (acc, x) => acc + x.cast("double"))))
    val rows = df.select(
      Similarity.dot($"a", $"b").as("d"), builtinDot.as("bd"),
      Similarity.cosine($"a", $"b").as("c"), builtinCos.as("bc")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9)
    }
  }

  test("vec_cosine: zero vector yields null, identical vectors yield 1") {
    val df = Seq(
      (floats(0, 0, 0), floats(1, 2, 3)),
      (floats(1, 2, 3), floats(1, 2, 3))
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b").as("c")).collect()
    assert(out(0).isNullAt(0))
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-12)
  }

  test("sorted_intersect_size matches size(array_intersect) on sorted input") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(2L, 3L, 5L, 9L)),   // overlap {3,5}
      (Seq(1L, 2L), Seq(3L, 4L)),                    // disjoint
      (Seq.empty[Long], Seq(1L, 2L)),                // empty side
      (Seq(1L, 1L, 2L, 2L), Seq(1L, 2L, 2L, 3L)),    // dup values count once
      (Seq(-5L, 0L, 5L), Seq(-5L, 0L, 5L))           // identical
    ).toDF("a", "b")
    val got = df.select(
      org.apache.spark.sql.GraftColumnBridge.column(
        SortedIntersectSize(
          org.apache.spark.sql.GraftColumnBridge.expression($"a"),
          org.apache.spark.sql.GraftColumnBridge.expression($"b"))).as("m"),
      size(array_intersect($"a", $"b")).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // registered for SQL text too
    df.createOrReplaceTempView("sis_spec")
    val viaSql = sql("SELECT sorted_intersect_size(a, b) FROM sis_spec")
      .collect().map(_.getInt(0)).toSeq
    assert(viaSql == Seq(2, 0, 0, 2, 3))
  }

  test("vec_dot / vec_cosine are registered for SQL text") {
    Seq((floats(1, 2), floats(3, 4))).toDF("a", "b")
      .createOrReplaceTempView("vec_ops_spec")
    val r = sql("""SELECT vec_dot(a, b) AS d, vec_cosine(a, b) AS c
                   FROM vec_ops_spec""").collect().head
    assert(math.abs(r.getDouble(0) - 11.0) < 1e-9)
    assert(r.getDouble(1) > 0.98)
  }

  test("vec expressions survive both codegen and interpreted paths") {
    // filter forcing interpreted eval via explicit expression evaluation
    val a = org.apache.spark.sql.catalyst.expressions.Literal.create(
      floats(1, 2, 3), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    val dot = VecDot(a, a)
    assert(math.abs(dot.eval(null).asInstanceOf[Double] - 14.0) < 1e-9)
    val cos = VecCosine(a, a)
    assert(math.abs(cos.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }
}
