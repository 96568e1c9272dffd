package graft.pipeline

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** VectorIndex.recluster — the codebook migration (IVF analog of
  * SaltedStore.resalt): row fidelity, one-generation swap of cells +
  * manifest, tombstone fold, loud reads mid-migration, idempotent
  * resume from planted crashes, and refused mismatched resumes. */
class VectorReclusterSpec extends SparkSuite {
  import spark.implicits._

  private val D = 16
  private val rnd = new scala.util.Random(23)
  private def vec() = Seq.fill(D)(rnd.nextDouble() * 2 - 1)
  private val oldCents: IndexedSeq[Seq[Double]] = IndexedSeq.fill(4)(vec())
  private val newCents: IndexedSeq[Seq[Double]] = IndexedSeq.fill(12)(vec())

  private def freshIndex(): (String, Set[Long]) = {
    val dir = java.nio.file.Files.createTempDirectory("recluster").toString
    val corpus = (0L until 300L).map(i => (i, vec())).toDF("vec_id", "v")
    VectorIndex.write(corpus, col("v"), oldCents, dir)
    (dir, (0L until 300L).toSet)
  }

  private def fsOf(dir: String) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  private def ids(dir: String): Set[Long] =
    VectorIndex.read(spark, dir).select("vec_id").as[Long].collect().toSet

  test("recluster 4 -> 12 cells: rows identical, manifest = new codebook") {
    val (dir, all) = freshIndex()
    VectorIndex.recluster(spark, dir, "vec_id", "v", newCents)
    assert(ids(dir) === all)
    assert(VectorIndex.storedCodebookHash(spark, dir)
      .contains(VectorIndex.codebookHash(newCents)))
    // every stored row sits in its nearest NEW centroid's cell: probing
    // a stored vector's own cell finds it as its own top-1
    val row = VectorIndex.read(spark, dir)
      .filter(col("vec_id") === 7L).select("v").as[Seq[Double]].head()
    val top = VectorIndex.probe(spark, dir, "vec_id", "v", row, newCents,
      nProbe = 1, k = 1).select("vec_id").as[Long].collect()
    assert(top.headOption.contains(7L))
  }

  test("pending tombstones fold into the rebuild; deletes dir gone after") {
    val (dir, all) = freshIndex()
    VectorIndex.delete(spark, dir, Seq(5L, 6L))
    VectorIndex.recluster(spark, dir, "vec_id", "v", newCents)
    assert(ids(dir) === (all - 5L - 6L))
    assert(!VectorIndex.hasPendingDeletes(spark, dir))
  }

  test("read refuses a standing migration marker") {
    val (dir, _) = freshIndex()
    val (fs, root) = fsOf(dir)
    val m = fs.create(new Path(root, VectorIndex.ReclusterMarker), true)
    try m.writeUTF(VectorIndex.codebookHash(newCents)) finally m.close()
    val e = intercept[IllegalArgumentException](ids(dir))
    assert(e.getMessage.contains("in-flight codebook migration"))
  }

  test("crash mid-PARK resumes to a complete migration") {
    val (dir, all) = freshIndex()
    val (fs, root) = fsOf(dir)
    // stage exactly as recluster does, then crash after parking ONE child
    val rows = VectorIndex.read(spark, dir).drop("cell", "n2")
    VectorIndex.write(rows, col("v"), newCents, s"$dir/.recluster_new")
    val m = fs.create(new Path(root, VectorIndex.ReclusterMarker), true)
    try m.writeUTF(VectorIndex.codebookHash(newCents)) finally m.close()
    fs.mkdirs(new Path(root, ".recluster_old"))
    val victim = fs.listStatus(root).map(_.getPath.getName)
      .find(_.startsWith("cell=")).get
    assert(fs.rename(new Path(root, victim), new Path(root, s".recluster_old/$victim")))
    VectorIndex.recluster(spark, dir, "vec_id", "v", newCents)
    assert(ids(dir) === all)
    assert(!fs.exists(new Path(root, VectorIndex.ReclusterMarker)))
    assert(!fs.exists(new Path(root, ".recluster_old")))
    assert(VectorIndex.storedCodebookHash(spark, dir)
      .contains(VectorIndex.codebookHash(newCents)))
  }

  test("crash mid-SWAP resumes: _DONE present, one staged child already in") {
    val (dir, all) = freshIndex()
    val (fs, root) = fsOf(dir)
    val rows = VectorIndex.read(spark, dir).drop("cell", "n2")
    VectorIndex.write(rows, col("v"), newCents, s"$dir/.recluster_new")
    val m = fs.create(new Path(root, VectorIndex.ReclusterMarker), true)
    try m.writeUTF(VectorIndex.codebookHash(newCents)) finally m.close()
    fs.mkdirs(new Path(root, ".recluster_old"))
    fs.listStatus(root).map(_.getPath.getName)
      .filterNot(n => n == VectorIndex.ReclusterMarker ||
        n == ".recluster_new" || n == ".recluster_old")
      .foreach { n =>
        assert(fs.rename(new Path(root, n), new Path(root, s".recluster_old/$n")))
      }
    fs.create(new Path(root, ".recluster_old/_DONE"), true).close()
    val staged = fs.listStatus(new Path(root, ".recluster_new"))
      .map(_.getPath.getName).find(_.startsWith("cell=")).get
    assert(fs.rename(new Path(root, s".recluster_new/$staged"), new Path(root, staged)))
    VectorIndex.recluster(spark, dir, "vec_id", "v", newCents)
    assert(ids(dir) === all)
  }

  test("resume with a DIFFERENT codebook is refused") {
    val (dir, _) = freshIndex()
    val (fs, root) = fsOf(dir)
    val m = fs.create(new Path(root, VectorIndex.ReclusterMarker), true)
    try m.writeUTF(VectorIndex.codebookHash(newCents)) finally m.close()
    val e = intercept[IllegalArgumentException](
      VectorIndex.recluster(spark, dir, "vec_id", "v", oldCents))
    assert(e.getMessage.contains("in-flight migration targets codebook"))
  }
}
