package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Persisted IVF index: layout, pruning, and parity with the unindexed
  * IVF query (the scale claim is that ONLY probed cell=N partitions are
  * read — checked here against the actual scanned files/plan). */
class VectorIndexSpec extends SparkSuite {
  import spark.implicits._

  private val D = 16
  private val rnd = new scala.util.Random(11)
  private def vec() = Seq.fill(D)(rnd.nextDouble() * 2 - 1)
  private val cents: IndexedSeq[Seq[Double]] = IndexedSeq.fill(8)(vec())

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("vindex").toString
    val corpus = (0L until 400L).map(i => (i, vec())).toDF("vec_id", "v")
    VectorIndex.write(corpus, col("v"), cents, d)
    d
  }

  test("index write lays out one cell=N partition per non-empty cell") {
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("cell=\\d+")))
    // stored rows keep id, vector, norm and the partition cell
    val cols = VectorIndex.read(spark, dir).columns.toSet
    assert(Set("vec_id", "v", "n2", "cell").subsetOf(cols))
  }

  test("static probe reads ONLY the probed cell partitions") {
    val q = vec()
    val nProbe = 2
    val probed = VectorIndex.probeCells(q, cents, nProbe).toSet
    val df = VectorIndex.probe(spark, dir, "vec_id", "v", q, cents, nProbe, k = 5)
    // the probe read now prunes at LISTING construction — stronger than
    // a partition filter: only the probed cell dirs are ever enumerated
    // (SaltedStore.readPartitions), so the scan's file index roots at
    // exactly the probed cells
    val roots = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.getName)
    }.flatten.filter(_.startsWith("cell="))
      .map(_.stripPrefix("cell=").toLong).toSet
    assert(roots == probed,
      s"scan must root at exactly the probed cells $probed, got $roots")
    // and the results really come only from those cells
    val cells = df.collect().map(_.getLong(0)).toSet
    val cellOf = VectorIndex.read(spark, dir)
      .select(col("vec_id"), col("cell").cast("bigint")).as[(Long, Long)]
      .collect().toMap
    assert(cells.forall(id => probed.contains(cellOf(id))))
  }

  test("probe top-k equals brute force within the probed cells") {
    val q = vec()
    val qn2 = q.foldLeft(0.0)((a, x) => a + x * x)
    val probed = VectorIndex.probeCells(q, cents, 3)
    val got = VectorIndex.probe(spark, dir, "vec_id", "v", q, cents, 3, 10)
      .as[(Long, Double)].collect().toList
    val exp = VectorIndex.read(spark, dir)
      .filter(col("cell").isin(probed: _*))
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .collect()
      .map { case (id, v) =>
        val dot = q.zip(v).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
        val n2 = v.foldLeft(0.0)((a, x) => a + x * x)
        (id, dot / (math.sqrt(qn2) * math.sqrt(n2)))
      }
      .sortBy { case (id, cos) => (-cos, id) }.take(10).toList
    assert(got.map(_._1) === exp.map(_._1))
  }

  test("probe with a stale codebook fails loudly") {
    // the manifest written at index time is the versioning contract: a
    // probe whose centroids differ from the stored ones would silently
    // rank against the WRONG cells — it must throw instead
    assert(VectorIndex.storedCodebookHash(spark, dir)
      === Some(VectorIndex.codebookHash(cents)))
    val stale = cents.updated(0, cents(0).map(_ + 0.25))
    val e = intercept[IllegalStateException] {
      VectorIndex.probe(spark, dir, "vec_id", "v", vec(), stale, 2, 5)
    }
    assert(e.getMessage.contains("DIFFERENT codebook"))
    val e2 = intercept[IllegalStateException] {
      VectorIndex.probeSet(spark, dir, "vec_id", "v",
        Seq((1L, vec())).toDF("q_id", "qv"), "q_id", "qv", stale, 2, 5)
    }
    assert(e2.getMessage.contains("DIFFERENT codebook"))
    // and an append with a diverged codebook is refused the same way
    val batch = Seq((9999L, vec())).toDF("vec_id", "v")
    intercept[IllegalStateException] {
      VectorIndex.write(batch, col("v"), stale, dir, mode = "append")
    }
  }

  test("write rejects reserved columns and wrong-dimension vectors") {
    val clobber = Seq((1L, vec(), 0.0)).toDF("vec_id", "v", "n2")
    val e = intercept[IllegalArgumentException] {
      VectorIndex.write(clobber, col("v"), cents,
        java.nio.file.Files.createTempDirectory("vx").toString)
    }
    assert(e.getMessage.contains("reserves columns"))
    // a vector shorter than the codebook dim must FAIL in the kernel,
    // not silently truncate the dot product (mis-scored cell otherwise)
    val short = Seq((1L, Seq.fill(D / 2)(0.5))).toDF("vec_id", "v")
    val e2 = intercept[Exception] {
      VectorIndex.write(short, col("v"), cents,
        java.nio.file.Files.createTempDirectory("vx2").toString)
    }
    assert(exceptionChain(e2).exists(_.getMessage != null) &&
      exceptionChain(e2).exists(m => Option(m.getMessage).exists(_.contains("codebook dim"))),
      s"expected a codebook-dim error, got: $e2")
  }

  private def exceptionChain(e: Throwable): List[Throwable] =
    e :: Option(e.getCause).map(exceptionChain).getOrElse(Nil)

  test("crashed cell compaction leaves the index readable via marker recovery") {
    spark.conf.set("spark.graft.compact.waitMs", "0")
    try {
      val d = java.nio.file.Files.createTempDirectory("vindex_crash").toString
      val corpus = (0L until 200L).map(i => (i, vec())).toDF("vec_id", "v")
      VectorIndex.write(corpus, col("v"), cents, d)
      val fs = new org.apache.hadoop.fs.Path(d)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def p(s: String) = new org.apache.hadoop.fs.Path(d, s)
      val firstCell = fs.listStatus(new org.apache.hadoop.fs.Path(d))
        .map(_.getPath.getName).filter(_.startsWith("cell=")).sorted.head
      // freeze the compact swap window: one cell parked, marker up —
      // exactly the state a crashed VectorIndex.compact leaves behind
      assert(fs.rename(p(firstCell), p(s".old_$firstCell")))
      fs.create(p(graft.store.SaltedStore.CompactingMarker), true).close()
      // a naive spark.read would silently drop that cell...
      assert(spark.read.parquet(d).count() < 200)
      // ...but the marker-aware index read recovers it
      val recovered = VectorIndex.read(spark, d)
      assert(recovered.count() === 200)
      assert(recovered.select("cell").distinct().count()
        === fs.listStatus(new org.apache.hadoop.fs.Path(d))
          .count(s => s.getPath.getName.startsWith("cell=")
            || s.getPath.getName.startsWith(".old_cell=")).toLong)
    } finally spark.conf.unset("spark.graft.compact.waitMs")
  }

  test("delete tombstones immediately; compact folds physically; update re-assigns cells") {
    val d = java.nio.file.Files.createTempDirectory("vindexDel").toString
    val corpus = (0L until 200L).map(i => (i, vec())).toDF("vec_id", "v")
    VectorIndex.write(corpus, col("v"), cents, d)
    val q = vec()
    // pick a currently-returned id and delete it: it must vanish from
    // the probe BEFORE any compaction (tombstone anti-join)
    val top = VectorIndex.probe(spark, d, "vec_id", "v", q, cents, 8, 5)
      .select("vec_id").as[Long].collect()
    VectorIndex.delete(spark, d, Seq(top.head))
    assert(VectorIndex.hasPendingDeletes(spark, d))
    val after = VectorIndex.probe(spark, d, "vec_id", "v", q, cents, 8, 5)
      .select("vec_id").as[Long].collect()
    assert(!after.contains(top.head))
    // appends refuse while deletes are pending
    val more = Seq((900L, vec())).toDF("vec_id", "v")
    val e = intercept[IllegalStateException] {
      VectorIndex.write(more, col("v"), cents, d, mode = "append")
    }
    assert(e.getMessage.contains("pending deletes"))
    // compact folds the tombstone physically and clears it
    VectorIndex.compact(spark, d, "vec_id")
    assert(!VectorIndex.hasPendingDeletes(spark, d))
    assert(VectorIndex.read(spark, d).filter(col("vec_id") === top.head).isEmpty)
    assert(VectorIndex.read(spark, d).count() == 199)
    // update replaces a vector with one that lands in a DIFFERENT cell:
    // exactly one row for the id afterwards, in the new cell
    val victim = 5L
    val newVec = cents(3).map(_ * 10.0) // unambiguously nearest centroid 3
    VectorIndex.update(Seq((victim, newVec)).toDF("vec_id", "v"),
      col("v"), cents, d, idCol = "vec_id")
    val rows = VectorIndex.read(spark, d).filter(col("vec_id") === victim)
      .select("cell").as[Int].collect()
    assert(rows.length == 1 && rows.head == 3)
  }

  test("probeSet joins on the partition column with dynamic partition pruning") {
    val qs = (900L to 902L).map(i => (i, vec())).toDF("q_id", "qv")
    val df = VectorIndex.probeSet(spark, dir, "vec_id", "v", qs, "q_id", "qv",
      cents, nProbe = 2, k = 5)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the cell partition column:\n$plan")
    // per query: k results, ranked by cosine
    val rows = df.collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 5))
  }
}
