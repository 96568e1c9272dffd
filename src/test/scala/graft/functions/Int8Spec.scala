package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class Int8Spec extends SparkSuite {
  import spark.implicits._

  test("quantize_int8 rounds half away from zero and clamps") {
    // 2.5/127 quantizes to round(2.5)=3 (not banker's 2 / half-up edge);
    // -2.5/127 to -3; ±big clamps to ±127
    val v = Seq(Seq(2.5 / 127, -2.5 / 127, 1.0, -1.0, 5.0, -5.0, 0.0))
      .toDF("v")
    val bytes = v.select(Int8Functions.quantizeInt8(col("v"))).as[Array[Byte]].head()
    assert(bytes.toList === List[Byte](3, -3, 127, -127, 127, -127, 0))
  }

  test("dot_int8 equals the integer dot of the quantized values") {
    val df = Seq((Seq(0.5, -0.25, 1.0), Seq(0.5, 0.25, -1.0))).toDF("a", "b")
    val got = df.select(Int8Functions.dotInt8(
      Int8Functions.quantizeInt8(col("a")),
      Int8Functions.quantizeInt8(col("b")))).as[Long].head()
    // quantized: a=(64,-32,127), b=(64,32,-127) → 4096-1024-16129
    assert(got === (64L * 64 - 32L * 32 - 127L * 127))
  }

  test("interpreted eval matches codegen results on random vectors") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map(_ =>
      (Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val viaExpr = df.select(Int8Functions.dotInt8(
      Int8Functions.quantizeInt8(col("a")),
      Int8Functions.quantizeInt8(col("b")))).as[Long].collect()
    def q(x: Double): Long = {
      val s = x * 127.0
      val r = if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)
      math.max(-127.0, math.min(127.0, r)).toLong
    }
    val viaScala = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => q(x) * q(y) }.sum
    }
    assert(viaExpr.toList === viaScala.toList)
  }

  test("dot_int8 rejects mismatched vector lengths") {
    val ex = intercept[Exception] {
      Seq((Seq(1.0, 1.0), Seq(1.0, 1.0, 1.0))).toDF("a", "b")
        .select(Int8Functions.dotInt8(
          Int8Functions.quantizeInt8(col("a")),
          Int8Functions.quantizeInt8(col("b")))).collect()
    }
    assert(ex.getMessage.contains("length mismatch") ||
      (ex.getCause != null && ex.getCause.getMessage.contains("length mismatch")))
  }

  test("SQL functions registered via GraftExtensions") {
    Seq(Seq(1.0, -1.0)).toDF("v").createOrReplaceTempView("i8_in")
    val got = spark.sql(
      "SELECT dot_int8(quantize_int8(v), quantize_int8(v)) FROM i8_in")
      .as[Long].head()
    assert(got === 127L * 127 * 2)
  }
}
