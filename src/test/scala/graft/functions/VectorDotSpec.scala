package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  private def floats(xs: Double*) = xs.map(_.toFloat).toArray

  test("vector_dot matches the interpreted zip_with+aggregate result") {
    val df = Seq(
      (floats(1, 2, 3), floats(4, 5, 6)),
      (floats(0.5, -0.25), floats(-2, 8)),
      (floats(), floats())
    ).toDF("a", "b")
    val got = df.select(
      GraftFunctions.vectorDot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
    assert(got.head.getDouble(0) == 32.0)
  }

  test("vector_dot handles nulls and length mismatch") {
    val df = Seq(
      (Option(floats(1, 2, 3)), Option(floats(2, 2))),
      (None: Option[Array[Float]], Option(floats(1)))
    ).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.vectorDot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) == 6.0) // common prefix: 1*2 + 2*2
    assert(rows(1).isNullAt(0))
  }

  test("vector_dot is available in SQL after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect()
    assert(r.head.getDouble(0) == 11.0)
  }

  test("fused vector_cosine is BIT-identical to the 3-pass dot/norm form") {
    val rnd = new scala.util.Random(42)
    val df = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() - 0.5f),
      Array.fill(64)(rnd.nextFloat() - 0.5f))).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.vectorCosine(col("a"), col("b")).as("fused"),
      (GraftFunctions.vectorDot(col("a"), col("b")) /
        (sqrt(GraftFunctions.vectorDot(col("a"), col("a"))) *
          sqrt(GraftFunctions.vectorDot(col("b"), col("b"))))).as("unfused"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"${r.getDouble(0)} != ${r.getDouble(1)}"))
  }

  test("vector_dot rejects non-float-array inputs") {
    val df = Seq((Array(1L, 2L), floats(1, 2))).toDF("a", "b")
    val err = intercept[Exception] {
      df.select(GraftFunctions.vectorDot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("vector_dot"))
  }
}
