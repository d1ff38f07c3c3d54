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
