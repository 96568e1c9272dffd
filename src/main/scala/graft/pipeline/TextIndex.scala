package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Persisted inverted text index — the reference's salted bucketed
  * store applied to term lookup, the third instance of the same layout
  * idea (hash-prefix bucket → IVF cell → term shard): postings are
  * partitioned by a hash SHARD of the term, so a query's shard list is
  * computable from the query terms alone and the scan prunes to those
  * `shard=N` directories at file-listing time — the reference's
  * point-get bucket prune (wd/RowKeyDistributorByHashPrefix.java:111-114)
  * with the term hash as the "key".
  *
  * Layout: one row per (term, doc_id) with its term frequency, sorted by
  * (t, doc_id) inside each shard — sorted runs give parquet min/max
  * row-group skipping on the term column within a shard, the same
  * second-level pruning the salted store gets on its key column.
  *
  * Scale: the build is ONE shuffle of (term, doc) pairs (the groupBy
  * combines tf map-side); at query time only |terms| shards of the
  * layout are listed and only matching row groups read. A conjunctive
  * (AND) query then groups the few surviving postings by doc —
  * bounded by the rarest term's posting list, never the corpus.
  */
object TextIndex {

  /** Shard count. Like the salted store's bucket count this is part of
    * the layout contract — probing with a different count would prune to
    * the WRONG shards and silently miss postings, so it is recorded in a
    * manifest and verified on probe (the VectorIndex codebook-hash
    * pattern, failure mode and fix both inherited). */
  val Shards = 16

  val ManifestFile = "_graft_textindex.json"

  /** md5-derived term shard — identical arithmetic in DuckDB via
    * [[Dedup.duckBaseHash32]], so the oracle can replay pruning. */
  def shardOf(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(Dedup.baseHash32(t), lit(Shards.toLong))

  def shardOfTerm(t: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % Shards
  }

  private def fsOf(spark: SparkSession, path: String) = {
    val root = new org.apache.hadoop.fs.Path(path)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  /** Build the index from `docs(doc_id, text)`: tokenize, count term
    * frequency per (term, doc), shard by term hash, write sorted
    * postings. The manifest lands strictly after the data (matching
    * manifest ⇒ complete index — the ensure() contract). `append` (the
    * streaming-ingest mode) verifies the shard contract first and
    * requires batches with DISJOINT doc sets (the same contract as any
    * append ingest); [[searchAll]] aggregates per doc across files, so
    * a doc whose postings span batches still sums correctly. */
  def write(docs: DataFrame, path: String, mode: String = "overwrite"): Unit = {
    if (mode == "append") storedShards(docs.sparkSession, path).foreach { s =>
      if (s != Shards) throw new IllegalStateException(
        s"text index at $path has $s shards, writer expects $Shards — re-index")
    }
    val postings = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("shard", shardOf(col("t")))
    postings
      .repartition(col("shard"))
      .sortWithinPartitions("t", "doc_id")
      .write.partitionBy("shard").mode(mode).parquet(path)
    val (fs, root) = fsOf(docs.sparkSession, path)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, ManifestFile), true)
    try out.write(s"""{"shards":$Shards}""".getBytes("UTF-8")) finally out.close()
  }

  /** Compact streaming-appended postings: one file set per micro-batch
    * per shard accumulates until probe cost is file-open cost — the
    * memstore problem again, solved the same way: SaltedStore.compact's
    * marker-guarded two-rename swap on the `shard=N` layout, each shard
    * rewritten sorted by term. Pause the streaming writer while
    * compacting (same discipline as the salted store / vector index). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Unit =
    graft.store.SaltedStore.compact(spark, path, col("t"), targetBytes,
      partitionPrefix = "shard")

  def storedShards(spark: SparkSession, path: String): Option[Int] = {
    val (fs, root) = fsOf(spark, path)
    val p = new org.apache.hadoop.fs.Path(root, ManifestFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      """"shards":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    }
  }

  /** Idempotent build (the VectorIndex.ensure pattern): skip when a
    * complete index with the current shard count is already at `path`. */
  def ensure(docs: DataFrame, path: String): Boolean = {
    val fresh = storedShards(docs.sparkSession, path).contains(Shards)
    if (!fresh) write(docs, path)
    !fresh
  }

  /** Conjunctive (all-terms) search against the persisted index: the
    * probe computes the terms' shard list DRIVER-SIDE (the point-get
    * prune — static `shard IN (...)`, partitions skipped at file-listing
    * time), filters to the exact terms (sorted-run row-group skipping),
    * and keeps docs matching ALL terms, ranked by summed tf. A stale or
    * foreign layout fails loudly. */
  def searchAll(spark: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAll needs at least one term")
    storedShards(spark, path) match {
      case Some(s) if s != Shards => throw new IllegalStateException(
        s"text index at $path was built with $s shards, probe expects $Shards " +
          "— pruning would silently miss postings. Re-index.")
      case Some(_) => ()
      case None => throw new IllegalStateException(
        s"no $ManifestFile manifest at $path — not a graft text index")
    }
    val shards = terms.map(shardOfTerm).distinct
    // SaltedStore's marker-aware read on the shard layout: a probe during
    // (or after a crash of) compact waits out the swap instead of
    // silently missing a shard
    graft.store.SaltedStore.read(spark, path, partitionPrefix = "shard")
      .filter(col("shard").isin(shards: _*))
      .filter(col("t").isin(terms: _*))
      .groupBy("doc_id")
      // count_distinct, not count: a doc whose postings span appended
      // micro-batch files carries one row per (term, file-batch)
      .agg(count_distinct(col("t")).as("n_terms"), sum("tf").as("total_tf"))
      .filter(col("n_terms") === terms.distinct.size)
      .select("doc_id", "total_tf")
  }
}
