package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Persistent IVF vector-index layout — the reference's salted
  * bucketed store with a LEARNED hash. An IVF cell is exactly a
  * hash-prefix bucket whose "hash" is nearest-centroid assignment: the
  * write path salts each vector with its cell id and partitions the
  * corpus by it (one narrow projection + one small-key shuffle — the
  * same §3.1 pipeline as graft.store.SaltedStore.write), and the probe
  * path is the reference's point-get bucket prune (recompute the
  * bucket from the key, read only that bucket;
  * wd/RowKeyDistributorByHashPrefix.java:111-114 / README:75-78)
  * applied to vector search: rank cells by query-centroid cosine, scan
  * only the nProbe best `cell=N` partitions.
  *
  * At 100 TB this is the difference between an ANN scan that reads the
  * corpus and one that reads nProbe/C of it: partition pruning happens
  * at FILE LISTING time, before any IO. A single query vector prunes
  * with a static `cell IN (...)` predicate; a query SET joins on the
  * cell column and prunes the same partitions via dynamic partition
  * pruning (the DataFrame analog of the reference's per-bucket scan
  * fan-out, driven by the broadcast probe list at runtime).
  */
object VectorIndex {

  /** Build the index: assign every vector its IVF cell (one fused
    * native projection — graft.functions.NearestCentroid) and write the
    * corpus partitioned by cell, each partition sorted by id for stable
    * scans. `vecCol` must be array<double>. The stored columns are the
    * caller's `df` columns plus `n2` (‖v‖², so probes never recompute
    * norms) and the `cell` partition column. */
  def write(df: DataFrame, vecCol: Column, cents: IndexedSeq[Seq[Double]],
            path: String, mode: String = "overwrite"): Unit = {
    val n2 = graft.functions.VectorFunctions.dotProduct(vecCol, vecCol)
    df.withColumn("n2", n2)
      .withColumn("cell",
        graft.functions.CentroidFunctions.nearestCentroidCosine(vecCol, col("n2"), cents))
      .repartition(col("cell"))
      .write
      .partitionBy("cell")
      .mode(mode)
      .parquet(path)
  }

  /** Read the whole index back (cell comes back partition-pruning-capable). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Driver-side probe-cell ranking for ONE query vector: cells ordered
    * by cosine(q, centroid) descending, centroid id ascending — the same
    * sequential-fold arithmetic and tiebreak as the stored assignment
    * (and the DuckDB oracle), evaluated on the driver because the query
    * vector is driver data. */
  def probeCells(q: Seq[Double], cents: IndexedSeq[Seq[Double]], nProbe: Int): Seq[Long] = {
    val qn2 = q.foldLeft(0.0)((a, x) => a + x * x)
    cents.zipWithIndex.map { case (c, i) =>
      val dot = q.zip(c).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val cn2 = c.foldLeft(0.0)((a, x) => a + x * x)
      (dot / (math.sqrt(qn2) * math.sqrt(cn2)), i.toLong)
    }.sortBy { case (cos, cid) => (-cos, cid) }.take(nProbe).map(_._2)
  }

  /** Probe with one query vector: STATIC partition pruning — the cell
    * list is literal, so pruning happens at file-listing time and the
    * scan touches only nProbe of C partitions. Exact cosine re-rank
    * inside them; output (vec_id, cos, rnk). */
  def probe(spark: SparkSession, path: String, idCol: String, vecCol: String,
            q: Seq[Double], cents: IndexedSeq[Seq[Double]],
            nProbe: Int, k: Int): DataFrame = {
    val cells = probeCells(q, cents, nProbe)
    val qn2 = q.foldLeft(0.0)((a, x) => a + x * x)
    read(spark, path)
      .filter(col("cell").isin(cells: _*))
      .withColumn("cos",
        graft.functions.VectorFunctions.dotProduct(col(vecCol), typedlit(q)) /
          (sqrt(lit(qn2)) * sqrt(col("n2"))))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cos"))
  }

  /** Probe with a query SET: the probe list (q_id → cell) is built with
    * one centroid_scores projection over the query vectors, broadcast,
    * and equi-joined on the partition column — eligible for dynamic
    * partition pruning, so the corpus side still skips unprobed `cell=N`
    * partitions at runtime. `queries` must carry (qIdCol, qVecCol). */
  def probeSet(spark: SparkSession, path: String, idCol: String, vecCol: String,
               queries: DataFrame, qIdCol: String, qVecCol: String,
               cents: IndexedSeq[Seq[Double]], nProbe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qn2 = graft.functions.VectorFunctions.dotProduct(col(qVecCol), col(qVecCol))
    val probes = queries
      .withColumn("qn2", qn2)
      .select(col(qIdCol), col(qVecCol), col("qn2"),
        posexplode(graft.functions.CentroidFunctions.centroidCosines(
          col(qVecCol), col("qn2"), cents)).as(Seq("cell", "ccos")))
      // cell stays INT: the index's partition column reads back as int,
      // and an un-cast equi-join keeps the scan eligible for dynamic
      // partition pruning
      .withColumn("prnk", row_number().over(
        Window.partitionBy(qIdCol).orderBy(col("ccos").desc, col("cell"))))
      .filter(col("prnk") <= nProbe)
      .select(col(qIdCol), col(qVecCol), col("qn2"), col("cell"))
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    broadcast(probes).join(read(spark, path), "cell")
      .withColumn("cos",
        graft.functions.VectorFunctions.dotProduct(col(qVecCol), col(vecCol)) /
          (sqrt(col("qn2")) * sqrt(col("n2"))))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col(qIdCol), col(idCol), col("cos"), col("rnk"))
  }
}
