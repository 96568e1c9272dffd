package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  private def z(x: Long, y: Long): Long =
    ZOrderKey.spread(x) | (ZOrderKey.spread(y) << 1)

  test("expression matches the scala reference on random inputs") {
    val rnd = new scala.util.Random(7)
    val pairs = List.fill(500)((rnd.nextLong().abs % 4294967296L,
                                rnd.nextLong().abs % 4294967296L))
    val got = pairs.toDF("a", "b")
      .select(ZOrderFunctions.zorderKey(col("a"), col("b")))
      .as[Long].collect().toList
    assert(got === pairs.map { case (a, b) => z(a, b) })
  }

  test("interleave is a bijection: deinterleave recovers both dims") {
    def unspread(v: Long): Long = {
      var x = v & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
      x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
      x = (x | (x >> 8)) & 0x0000ffff0000ffffL
      (x | (x >> 16)) & 0xffffffffL
    }
    val g = Gen.chooseNum(0L, 4294967295L)
    (1 to 200).foreach { i =>
      val a = g.sample.get; val b = g.sample.get
      val k = z(a, b)
      assert(unspread(k) === a && unspread(k >> 1) === b, s"roundtrip ($a, $b)")
    }
  }

  test("componentwise monotone: any box is inside its z-range (pruning)") {
    // the property q_zorder_scan's pushable pre-filter relies on
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val x0 = rnd.nextInt(1000).toLong; val x1 = x0 + rnd.nextInt(100)
      val y0 = rnd.nextInt(1000).toLong; val y1 = y0 + rnd.nextInt(100)
      val lo = z(x0, y0); val hi = z(x1, y1)
      for (_ <- 1 to 20) {
        val px = x0 + (rnd.nextInt((x1 - x0 + 1).toInt))
        val py = y0 + (rnd.nextInt((y1 - y0 + 1).toInt))
        val k = z(px, py)
        assert(k >= lo && k <= hi, s"($px,$py) z=$k outside [$lo,$hi]")
      }
    }
  }

  test("out-of-range input fails loudly (layout contract)") {
    val ex = intercept[Exception] {
      Seq((-1L, 0L)).toDF("a", "b")
        .select(ZOrderFunctions.zorderKey(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("zorder_key") ||
      ex.getCause != null && ex.getCause.getMessage.contains("zorder_key"))
  }

  test("callable from SQL via GraftExtensions") {
    val r = spark.sql("SELECT zorder_key(5L, 3L)").as[Long].head()
    assert(r === z(5L, 3L))
  }
}
