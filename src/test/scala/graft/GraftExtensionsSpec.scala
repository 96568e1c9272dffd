package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the custom-function SQL surface. `withExtensions` only
  * applies when this suite creates the first session in the JVM (other
  * suites' getOrCreate would win the race), so the registration triples
  * are also applied directly to the active session's function registry —
  * the same (identifier, info, builder) path injectFunction uses. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("GraftExtensionsSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    for (f <- Seq(GraftExtensions.dotProduct, GraftExtensions.wordShingles))
      s.sessionState.functionRegistry.registerFunction(f._1, f._2, f._3)
    s
  }

  test("dot_product is callable from SQL") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r === 32.0)
  }

  test("word_shingles is callable from SQL as a generator") {
    val rows = spark.sql(
      """SELECT id, s.pos, s.s
         FROM VALUES (1, 'a b c d') AS t(id, text)
         LATERAL VIEW word_shingles(split(text, ' '), 3) s AS pos, s""")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toList
    assert(rows === List((1, 0, "a b c"), (1, 1, "b c d")))
  }

  test("salted_key rejects a bucket that does not fit the prefix width") {
    // lpad would silently TRUNCATE 300 (hex 12C) to bucket 0x12 — must
    // raise instead
    val ex = intercept[Exception] {
      spark.sql("SELECT salted_key(300L, 1L, 1)").collect()
    }
    assert(ex.getMessage.contains("salted_key") ||
      (ex.getCause != null && ex.getCause.getMessage.contains("salted_key")))
  }

  test("key algebra is callable from SQL: hash, bucket, salt, unsalt") {
    import spark.implicits._
    val got = spark.sql(
      """SELECT k,
           hash31(k) AS h,
           hash31_bucket(k, 16) AS b,
           original_key(salted_key(hash31_bucket(k, 16), k, 1), 1) AS back
         FROM VALUES (0L), (42L), (123456789L) AS t(k)""")
      .as[(Long, Long, Long, Long)].collect().toList
    got.foreach { case (k, h, b, back) =>
      assert(back === k, "salt → unsalt must round-trip")
      assert(b >= 0 && b < 16)
      // SQL function agrees with the Column API
      val viaCol = Seq(k).toDF("k")
        .select(graft.keys.Hash31.hash32(org.apache.spark.sql.functions.col("k")))
        .as[Long].head()
      assert(h === viaCol)
    }
  }
}
