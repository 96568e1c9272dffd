package graft.store

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** LISTING-FREE shard reads off a persisted FILE MANIFEST — the last
  * O(corpus) term in the index probes' cost model, removed.
  *
  * `SaltedStore.readPartitions` already constructs the probed shard
  * DIRS directly, but the read still pays per-dir filesystem work that
  * grows with the shard count: one driver `exists` per probed value,
  * then Spark's `InMemoryFileIndex` LISTS every constructed dir (past
  * 32 dirs that is a distributed listing JOB per probe read). With the
  * shard count sized ∝ corpus (the bounded-shard-bytes rule) and a
  * batch whose tokens touch most shards, that listing is the one probe
  * cost that grows with the CORPUS — measured as the refresh screens'
  * only corpus-axis growth term (10.5→37.7s for a FIXED 500-doc
  * increment across a 100× corpus, SCALING.md refresh_corpus).
  *
  * The fix is the lakehouse one: the file SET of a sharded layout only
  * changes under its owner's maintenance ops (write / compact /
  * reshard — appends land in delta segments, tombstones in `_deletes`),
  * so the owner records it once, at rest, in `_graft_files.json`
  * inside the layout dir: relative path + length + mtime per file,
  * keyed by partition value, plus the data schema DDL. A probe then
  * builds its scan from the manifest alone — a custom [[FileIndex]]
  * handing Spark pre-built `FileStatus`es — with ZERO exists/list
  * calls at any shard count. Readers fall back to the listing path
  * when no manifest exists ([[readPartitions]] returns None), and the
  * OWNER's discipline keeps the manifest trustworthy: it is deleted
  * BEFORE any operation that mutates the file set and rewritten only
  * after the new state is at rest, so a crash mid-maintenance leaves
  * probes on the slow-but-correct listing path, never on stale paths.
  */
object FileManifest {
  val ManifestFile = "_graft_files.json"

  private def fsOf(spark: SparkSession, path: String) = {
    val root = new Path(path)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  /** Record the CURRENT file set of a `prefix=N`-partitioned layout.
    * One recursive driver listing (the same cost one probe's listing
    * pays, paid once per maintenance cadence instead). Call only with
    * the layout at rest — after write/compact/reshard commit.
    *
    * Every recorded name is VALIDATED here, not trusted at read time:
    * the manifest's hand-built JSON is parsed by regex, so a partition
    * value that is not a plain integer or a file name carrying '"',
    * '\\' or ']' would silently DROP entries from a probe's file set
    * (rows missing, no error). Spark's own writers never produce such
    * names (partition dirs are `prefix=<int>`, part files are
    * `part-NNNNN-<uuid>` + extension), so a hit here means a foreign
    * file landed in the layout — refuse loudly at write() (the same
    * fail-at-write contract as the schema-DDL guard below) rather than
    * corrupt probes later. */
  def write(spark: SparkSession, layoutPath: String,
            partitionPrefix: String = "shard"): Unit = {
    val (fs, root) = fsOf(spark, layoutPath)
    val parts = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionPrefix="))
    val sb = new StringBuilder
    var firstFile: Option[Path] = None
    var nFiles = 0L
    sb ++= "{\"parts\":{"
    var firstPart = true
    parts.foreach { p =>
      val v = p.getPath.getName.stripPrefix(s"$partitionPrefix=")
      require(v.nonEmpty && v.forall(_.isDigit),
        s"file-manifest: partition dir '${p.getPath.getName}' does not carry " +
          s"a plain non-negative integer value — the regex-parsed manifest " +
          "would silently drop it from every probe; fix the layout")
      val files = fs.listStatus(p.getPath).filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
      files.foreach { f =>
        val n = f.getPath.getName
        require(!n.exists(c => c == '"' || c == '\\' || c == ']'),
          s"file-manifest: data file name '$n' in ${p.getPath} contains a " +
            "JSON/regex metacharacter (\", \\ or ]) — it would be silently " +
            "dropped from the probe file set; rename the foreign file")
      }
      if (files.nonEmpty) {
        if (firstFile.isEmpty) firstFile = Some(files.head.getPath)
        if (!firstPart) sb += ','
        firstPart = false
        nFiles += files.length
        sb ++= s""""$v":["""
        sb ++= files.map(f =>
          s"""["${p.getPath.getName}/${f.getPath.getName}",${f.getLen},${f.getModificationTime}]""")
          .mkString(",")
        sb ++= "]"
      }
    }
    sb ++= s"},\"nfiles\":$nFiles,\"schema\":\""
    val schema = firstFile match {
      case Some(f) => spark.read.parquet(f.toString).schema.toDDL
      case None => ""
    }
    require(!schema.contains('"') && !schema.contains('\\'),
      s"file-manifest schema DDL needs JSON escaping (unsupported): $schema")
    sb ++= schema
    sb ++= "\"}"
    val tmp = new Path(root, ManifestFile + ".tmp")
    val dst = new Path(root, ManifestFile)
    val out = fs.create(tmp, true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"file-manifest rename failed: $tmp -> $dst")
  }

  /** Drop the manifest — the FIRST step of any maintenance op that will
    * mutate the layout's file set (probes fall back to listing reads
    * until the op completes and rewrites it). */
  def delete(spark: SparkSession, layoutPath: String): Unit = {
    val (fs, root) = fsOf(spark, layoutPath)
    fs.delete(new Path(root, ManifestFile), false)
  }

  /** Whether a manifest is present (diagnostics/specs). */
  def exists(spark: SparkSession, layoutPath: String): Boolean = {
    val (fs, root) = fsOf(spark, layoutPath)
    fs.exists(new Path(root, ManifestFile))
  }

  /** The manifest-backed pruned read: a DataFrame over exactly the
    * requested partition values' files, built with no filesystem
    * listing at all (one small manifest read). None when no manifest
    * exists or a compaction marker stands — callers fall back to
    * [[SaltedStore.readPartitions]], which handles every in-flight
    * state. Output schema = data columns ++ `partitionPrefix` (int),
    * the discovered-partition shape of the listing read.
    *
    * Foreign-mutation hardening (the trust boundary of a file recorded
    * by someone else): before handing the file set to Spark the read
    * (a) cross-checks the parsed TOTAL file count against the `nfiles`
    * field write() stored — a torn/corrupted manifest whose entries the
    * regex silently skipped degrades to the listing fallback instead of
    * missing rows; and (b) `exists`-probes the FIRST selected file — a
    * manually deleted or partially copied layout degrades to the
    * fallback instead of a task-level FileNotFoundException. One driver
    * RPC, not one per file: the owner's delete-before-mutate discipline
    * covers the library's own ops; this catches the foreign hand. */
  def readPartitions(spark: SparkSession, layoutPath: String, values: Seq[Long],
                     partitionPrefix: String = "shard"): Option[DataFrame] =
    readImpl(spark, layoutPath, Some(values.map(_.toString).toSet), partitionPrefix)

  /** [[readPartitions]] over EVERY recorded partition — the whole-layout
    * read (prefix probes, audits) without the O(partitions) dir listing. */
  def readAllPartitions(spark: SparkSession, layoutPath: String,
                        partitionPrefix: String = "shard"): Option[DataFrame] =
    readImpl(spark, layoutPath, None, partitionPrefix)

  private def readImpl(spark: SparkSession, layoutPath: String,
                       wanted: Option[Set[String]],
                       partitionPrefix: String): Option[DataFrame] = {
    val (fs, root) = fsOf(spark, layoutPath)
    val mf = new Path(root, ManifestFile)
    // belt-and-braces: the owner deletes the manifest before compacting,
    // so a standing compact marker implies no manifest — but a foreign
    // compactor (SaltedStore.compact called directly) wouldn't know
    if (fs.exists(new Path(root, SaltedStore.CompactingMarker))) return None
    if (!fs.exists(mf)) return None
    val in = fs.open(mf)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val schemaDdl = """"schema":"([^"]*)"""".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse(return None)
    if (schemaDdl.isEmpty) return None // empty layout: let the caller's fallback decide
    val dataSchema = StructType.fromDDL(schemaDdl)
    val partSchema = StructType(Seq(StructField(partitionPrefix, IntegerType)))
    val partRe = """"(\d+)":\[((?:\[[^\]]*\],?)*)\]""".r
    val fileRe = """\["([^"]+)",(\d+),(\d+)\]""".r
    var parsedFiles = 0L
    val dirs: Seq[(Int, Seq[FileStatusWithMetadata])] =
      partRe.findAllMatchIn(txt).flatMap { m =>
        val files = fileRe.findAllMatchIn(m.group(2)).map { f =>
          FileStatusWithMetadata(new FileStatus(
            f.group(2).toLong, false, 1, 128L * 1024 * 1024,
            f.group(3).toLong, new Path(root, f.group(1))),
            Map.empty)
        }.toSeq
        parsedFiles += files.size
        if (wanted.exists(!_.contains(m.group(1)))) None
        else Some((m.group(1).toInt, files))
      }.toSeq
    // (a) stored-total cross-check: entries the regex skipped (a torn
    // write, foreign edits) must not silently shrink the probe file set
    val stored = """"nfiles":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    if (stored.exists(_ != parsedFiles)) {
      System.err.println(s"[graft] FileManifest at $layoutPath parsed " +
        s"$parsedFiles file entries but records nfiles=${stored.get} — " +
        "corrupted/foreign-edited manifest; falling back to the listing read")
      return None
    }
    // (b) spot-check one recorded file still exists (foreign deletion)
    val gone = dirs.iterator.flatMap(_._2.headOption).nextOption()
      .filter(f => !fs.exists(f.getPath))
    if (gone.isDefined) {
      System.err.println(s"[graft] FileManifest at $layoutPath lists " +
        s"${gone.get.getPath}, which no longer exists — the file set was " +
        "mutated outside the owner's lifecycle; falling back to the listing read")
      return None
    }
    val idx = new ManifestFileIndex(root, partSchema, dirs)
    val rel = HadoopFsRelation(idx, partSchema, dataSchema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map.empty)(spark)
    Some(spark.baseRelationToDataFrame(rel))
  }

  /** The largest recorded per-partition file count, manifest-only —
    * the `SaltedStore.needsCompaction` signal WITHOUT its O(partitions)
    * per-dir listing (which itself grows with a ∝-corpus shard count).
    * None when no manifest stands (callers take the listing check). */
  def maxFilesPerPartition(spark: SparkSession, layoutPath: String): Option[Int] = {
    val (fs, root) = fsOf(spark, layoutPath)
    val mf = new Path(root, ManifestFile)
    if (!fs.exists(mf)) return None
    val in = fs.open(mf)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val partRe = """"(\d+)":\[((?:\[[^\]]*\],?)*)\]""".r
    val fileRe = """\["([^"]+)",(\d+),(\d+)\]""".r
    val counts = partRe.findAllMatchIn(txt)
      .map(m => fileRe.findAllMatchIn(m.group(2)).size).toSeq
    Some(if (counts.isEmpty) 0 else counts.max)
  }
}

/** A [[FileIndex]] whose file set comes from a manifest instead of a
  * filesystem listing — `listFiles` serves pre-built statuses and
  * honors partition filters by interpreting them against the partition
  * rows (the `PartitioningAwareFileIndex.prunePartitions` contract). */
private[graft] class ManifestFileIndex(
    root: Path,
    override val partitionSchema: StructType,
    dirs: Seq[(Int, Seq[FileStatusWithMetadata])]) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val all = dirs.map { case (v, files) =>
      PartitionDirectory(InternalRow(v), files)
    }
    if (partitionFilters.isEmpty) all
    else {
      val partAttrs: Seq[Attribute] =
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(partitionSchema)
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(org.apache.spark.sql.catalyst.expressions.And)
          .transform { case a: AttributeReference =>
            val i = partAttrs.indexWhere(_.name == a.name)
            BoundReference(i, partAttrs(i).dataType, nullable = true)
          })
      all.filter(p => bound.eval(p.values))
    }
  }

  override def inputFiles: Array[String] =
    dirs.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = dirs.flatMap(_._2.map(_.getLen)).sum
}
