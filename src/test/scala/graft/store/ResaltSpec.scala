package graft.store

import graft.SparkSuite
import graft.keys.{DistributorCodec, HashPrefix}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SaltedStore.resalt — the bucket-count migration (the operation the
  * reference's pinned-distributor design cannot offer). Pins: row
  * fidelity, the new layout's bucket assignment, loud reads mid-
  * migration, and idempotent resume from a crash in EVERY phase of the
  * stage → park → swap protocol. */
class ResaltSpec extends SparkSuite {
  import spark.implicits._

  private def freshStore(n: Int = 4): (String, Set[(Long, Long)]) = {
    val dir = Files.createTempDirectory("resalt").toString
    val rows = (0L until 997L).map(i => (i, i * 37 % 1000))
    SaltedStore.write(rows.toDF("k", "v"), col("k"), HashPrefix(n), dir)
    (dir, rows.toSet)
  }

  private def readBack(dir: String): Set[(Long, Long)] =
    SaltedStore.read(spark, dir).select("k", "v").as[(Long, Long)].collect().toSet

  private def bucketDirs(dir: String): Set[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("bucket=")).toSet
  }

  test("resalt 4 -> 16: rows identical, layout follows the new hash") {
    val (dir, rows) = freshStore()
    SaltedStore.resalt(spark, dir, col("k"), HashPrefix(16))
    assert(readBack(dir) === rows)
    // every row sits in its Hash31(k, 16) bucket: partition col == expr
    val misplaced = SaltedStore.read(spark, dir)
      .filter(col("bucket").cast("int") =!=
        graft.keys.Hash31.bucket(col("k"), 16).cast("int"))
      .count()
    assert(misplaced === 0L)
    assert(bucketDirs(dir).size > 4) // actually re-fanned, not renamed
  }

  test("read refuses a store with a standing migration marker") {
    val (dir, _) = freshStore()
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val m = fs.create(new Path(root, SaltedStore.ResaltMarker), true)
    try m.writeUTF(DistributorCodec.encode(HashPrefix(16))) finally m.close()
    val e = intercept[IllegalArgumentException](readBack(dir))
    assert(e.getMessage.contains("in-flight bucket migration"))
  }

  test("crash before marker commit: stale staging is discarded, restage succeeds") {
    val (dir, rows) = freshStore()
    // attempt died mid-stage: partial staging dir, NO marker
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(root, ".resalt_new/bucket=99"))
    SaltedStore.resalt(spark, dir, col("k"), HashPrefix(16))
    assert(readBack(dir) === rows)
    assert(!bucketDirs(dir).contains("bucket=99"))
  }

  test("crash mid-PARK resumes: parked debris + marker, no _DONE") {
    val (dir, rows) = freshStore()
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // real staging via the write shape resalt uses
    SaltedStore.write(
      SaltedStore.read(spark, dir).drop("bucket"),
      col("k"), HashPrefix(16), s"$dir/.resalt_new")
    val m = fs.create(new Path(root, SaltedStore.ResaltMarker), true)
    try m.writeUTF(DistributorCodec.encode(HashPrefix(16))) finally m.close()
    // one old bucket already parked, then crash (no _DONE)
    fs.mkdirs(new Path(root, ".resalt_old"))
    assert(fs.rename(new Path(root, "bucket=0"), new Path(root, ".resalt_old/bucket=0")))
    SaltedStore.resalt(spark, dir, col("k"), HashPrefix(16))
    assert(readBack(dir) === rows)
  }

  test("crash mid-SWAP resumes: _DONE present, one staged dir already in") {
    val (dir, rows) = freshStore()
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    SaltedStore.write(
      SaltedStore.read(spark, dir).drop("bucket"),
      col("k"), HashPrefix(16), s"$dir/.resalt_new")
    val m = fs.create(new Path(root, SaltedStore.ResaltMarker), true)
    try m.writeUTF(DistributorCodec.encode(HashPrefix(16))) finally m.close()
    // park phase fully done
    fs.mkdirs(new Path(root, ".resalt_old"))
    bucketDirs(dir).foreach { b =>
      assert(fs.rename(new Path(root, b), new Path(root, s".resalt_old/$b")))
    }
    fs.create(new Path(root, ".resalt_old/_DONE"), true).close()
    // one staged dir already swapped in, then crash
    val staged = fs.listStatus(new Path(root, ".resalt_new"))
      .map(_.getPath.getName).filter(_.startsWith("bucket=")).head
    assert(fs.rename(new Path(root, s".resalt_new/$staged"), new Path(root, staged)))
    SaltedStore.resalt(spark, dir, col("k"), HashPrefix(16))
    assert(readBack(dir) === rows)
    assert(!fs.exists(new Path(root, SaltedStore.ResaltMarker)))
    assert(!fs.exists(new Path(root, ".resalt_old")))
  }

  test("crash mid-CLEANUP: marker already gone, parked+staging debris remain") {
    // The round-13 ADVICE data-loss window: under the old cleanup order
    // (parked, staging, marker) a crash after delete(parked) left the
    // marker standing with `_DONE` gone, so a resume re-entered PARK and
    // destroyed the freshly swapped-in generation. The fix deletes the
    // marker FIRST; the only post-swap crash debris is therefore
    // marker-less dot-dirs. Pin: reads see the new generation through the
    // debris, and a re-invoked resalt clears it without losing a row.
    val (dir, rows) = freshStore()
    SaltedStore.resalt(spark, dir, col("k"), HashPrefix(16))
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // reconstruct the crash state: swap done, marker deleted, dot debris left
    fs.mkdirs(new Path(root, ".resalt_old"))
    fs.create(new Path(root, ".resalt_old/_DONE"), true).close()
    fs.mkdirs(new Path(root, ".resalt_new"))
    assert(readBack(dir) === rows)            // debris invisible to readers
    SaltedStore.resalt(spark, dir, col("k"), HashPrefix(16)) // idempotent re-run
    assert(readBack(dir) === rows)
    assert(!fs.exists(new Path(root, ".resalt_old")))
    assert(!fs.exists(new Path(root, ".resalt_new")))
  }

  test("marker is never the last survivor: marker standing implies staging exists") {
    // The ordering invariant that closes the data-loss window. If an
    // external actor strips staging while the marker stands, cleanup
    // would otherwise delete the parked dir — the only copy. Pin the
    // loud refusal instead.
    val (dir, _) = freshStore()
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(root, ".resalt_old"))
    fs.create(new Path(root, ".resalt_old/_DONE"), true).close()
    val m = fs.create(new Path(root, SaltedStore.ResaltMarker), true)
    try m.writeUTF(DistributorCodec.encode(HashPrefix(16))) finally m.close()
    // no .resalt_new on disk
    val e = intercept[IllegalArgumentException](
      SaltedStore.resalt(spark, dir, col("k"), HashPrefix(16)))
    assert(e.getMessage.contains("staging dir missing"))
    assert(fs.exists(new Path(root, ".resalt_old"))) // old generation preserved
  }

  test("resume with a DIFFERENT target distributor is refused") {
    val (dir, _) = freshStore()
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val m = fs.create(new Path(root, SaltedStore.ResaltMarker), true)
    try m.writeUTF(DistributorCodec.encode(HashPrefix(16))) finally m.close()
    val e = intercept[IllegalArgumentException](
      SaltedStore.resalt(spark, dir, col("k"), HashPrefix(8)))
    assert(e.getMessage.contains("in-flight migration targets"))
  }
}
