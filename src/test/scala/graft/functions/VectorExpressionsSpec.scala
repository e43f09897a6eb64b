package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  test("graft_dot matches the higher-order fold bit-for-bit") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val df = Seq((Seq(1.5, -2.25, 3.0), Seq(0.5, 4.0, -1.25)))
      .toDF("a", "b")
    val native = df.select(call_function("graft_dot", col("a"), col("b"))).collect()(0).getDouble(0)
    val folded = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .collect()(0).getDouble(0)
    assert(native == folded)
    assert(native == 1.5 * 0.5 + -2.25 * 4.0 + 3.0 * -1.25)
  }

  test("graft_dot is callable from SQL after registration") {
    VectorExpressions.register(spark)
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 11.0)
  }

  test("mismatched lengths fold over the common prefix; nulls propagate") {
    VectorExpressions.register(spark)
    val v = spark.sql("SELECT graft_dot(array(2.0d, 3.0d), array(10.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 20.0)
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .collect()(0)
    assert(n.isNullAt(0))
  }
}
