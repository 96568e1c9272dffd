package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CentroidSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val D = 8
  private val cents: IndexedSeq[Seq[Double]] =
    IndexedSeq.fill(5)(Seq.fill(D)(rnd.nextDouble() * 2 - 1))

  private def dotSeq(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
  private def n2(a: Seq[Double]): Double = dotSeq(a, a)

  test("nearest_centroid cosine matches the reference argmax with smallest-cid ties") {
    val vecs = (1 to 100).map(_ => Seq.fill(D)(rnd.nextDouble() * 2 - 1))
    val df = vecs.toDF("v").withColumn("n2v",
      graft.functions.VectorFunctions.dotProduct(col("v"), col("v")))
    val got = df.select(
      CentroidFunctions.nearestCentroidCosine(col("v"), col("n2v"), cents)).as[Long].collect()
    val exp = vecs.map { v =>
      val scores = cents.map(c => dotSeq(v, c) / (math.sqrt(n2(v)) * math.sqrt(n2(c))))
      scores.zipWithIndex.maxBy { case (s, i) => (s, -i) }._2.toLong
    }
    assert(got.toList === exp.toList)
  }

  test("nearest_centroid pq matches argmin L2 via the dot identity") {
    val vecs = (1 to 50).map(_ => Seq.fill(D)(rnd.nextDouble() * 2 - 1))
    val df = vecs.toDF("v")
    val got = df.select(
      CentroidFunctions.nearestCentroidPq(col("v"), cents)).as[Long].collect()
    val exp = vecs.map { v =>
      val l2 = cents.map(c => v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      l2.zipWithIndex.minBy { case (s, i) => (s, i) }._2.toLong
    }
    assert(got.toList === exp.toList)
  }

  test("exact tie goes to the smallest centroid id") {
    // duplicate centroid → identical scores at cid 1 and 3; 1 must win
    val dup = IndexedSeq(cents(0), cents(2), cents(1), cents(2))
    val v = Seq.fill(D)(0.5)
    val df = Seq(v).toDF("v").withColumn("n2v", lit(n2(v)))
    val got = df.select(
      CentroidFunctions.nearestCentroidCosine(col("v"), col("n2v"), dup)).as[Long].head()
    val scores = dup.map(c => dotSeq(v, c) / (math.sqrt(n2(v)) * math.sqrt(n2(c))))
    val expected = scores.zipWithIndex.maxBy { case (s, i) => (s, -i) }._2.toLong
    assert(got === expected)
    // sanity: the winner's duplicate twin scored identically
    assert(scores.count(_ == scores(got.toInt)) >= (if (expected == 1L) 2 else 1))
  }

  test("centroid_scores array equals per-centroid sequential-fold dots/cosines") {
    val v = Seq.fill(D)(rnd.nextDouble())
    val df = Seq(v).toDF("v").withColumn("n2v", lit(n2(v)))
    val cos = df.select(CentroidFunctions.centroidCosines(col("v"), col("n2v"), cents))
      .as[Seq[Double]].head()
    val dots = df.select(CentroidFunctions.centroidDots(col("v"), cents))
      .as[Seq[Double]].head()
    cents.indices.foreach { i =>
      assert(dots(i) === dotSeq(v, cents(i)))
      assert(cos(i) === dotSeq(v, cents(i)) / (math.sqrt(n2(v)) * math.sqrt(n2(cents(i)))))
    }
  }

  test("SQL functions registered via GraftExtensions") {
    val book = cents.map(c => c.mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    Seq(Seq.fill(D)(0.3)).toDF("v").createOrReplaceTempView("cent_in")
    val cell = spark.sql(
      s"SELECT nearest_centroid(v, dot_product(v, v), $book) FROM cent_in")
      .collect().head.getLong(0)
    assert(cell >= 0 && cell < cents.size)
    val pqCell = spark.sql(
      s"SELECT nearest_centroid(v, 0.0d, $book, 'pq') FROM cent_in")
      .collect().head.getLong(0)
    assert(pqCell >= 0 && pqCell < cents.size)
    val scores = spark.sql(
      s"SELECT centroid_scores(v, 0.0d, $book, 'dot') FROM cent_in")
      .as[Seq[Double]].head()
    val v = Seq.fill(D)(0.3)
    cents.indices.foreach(i => assert(scores(i) === dotSeq(v, cents(i))))
  }

  test("property: argmax matches the struct-argmax reference on adversarial values") {
    import org.scalacheck.Gen
    // values that stress the ordering: ±0.0, ±Inf, NaN, tiny/huge magnitudes
    val edgy = Gen.oneOf(
      Gen.chooseNum(-1.0, 1.0),
      Gen.oneOf(0.0, -0.0, Double.PositiveInfinity, Double.NegativeInfinity,
        Double.NaN, 1e-300, -1e300))
    val vecGen = Gen.listOfN(4, edgy).map(_.toSeq)
    val books = Gen.listOfN(20, Gen.listOfN(3, vecGen)).sample.get
    val vs = Gen.listOfN(20, vecGen).sample.get
    // Spark's nan-safe double ordering (array_max semantics this replaces)
    def nanSafeGt(a: Double, b: Double): Boolean =
      if (a.isNaN) !b.isNaN
      else if (b.isNaN) false
      else a > b
    books.zip(vs).foreach { case (book, v) =>
      val cents = book.map(_.toIndexedSeq).toIndexedSeq
      val df = Seq(v).toDF("v")
      val got = df.select(CentroidFunctions.nearestCentroidPq(col("v"), cents))
        .as[Long].head()
      // reference: pq score via the same driver-side fold, first-wins ties
      var best = Double.NegativeInfinity
      var bestI = 0
      cents.zipWithIndex.foreach { case (c, i) =>
        val s = dotSeq(v, c) - n2(c) / 2.0
        if (nanSafeGt(s, best)) { best = s; bestI = i }
      }
      assert(got === bestI.toLong,
        s"v=$v book=$book: got $got expected $bestI")
    }
  }

  test("SQL codebook with a NULL coordinate is rejected, not zero-filled") {
    val ex = intercept[Exception] {
      spark.sql("SELECT nearest_centroid(array(1.0d), 1.0d, " +
        "array(array(1.0d, cast(null as double)), array(0.0d, 1.0d)))").collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("NULL")), s"got: ${messages(ex)}")
  }

  test("interpreted eval matches codegen (whole-stage off vs on)") {
    val vecs = (1 to 64).map(_ => Seq.fill(D)(rnd.nextDouble() * 2 - 1))
    val df = vecs.toDF("v").withColumn("n2v",
      graft.functions.VectorFunctions.dotProduct(col("v"), col("v")))
    def run(): (List[Long], List[Seq[Double]]) = (
      df.select(CentroidFunctions.nearestCentroidCosine(col("v"), col("n2v"), cents))
        .as[Long].collect().toList,
      df.select(CentroidFunctions.centroidCosines(col("v"), col("n2v"), cents))
        .as[Seq[Double]].collect().toList)
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val off = run()
      assert(on === off)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
