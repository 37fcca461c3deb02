package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side layout helpers (SURVEY.md §2.1 sink row). The reference's
  * sink is an Elasticsearch bulk index of nested fact docs
  * [R: genesapi/elastic.py — UNVERIFIED]; Spark-first, the sink is a
  * columnar lake write whose LAYOUT is the index: partition directories
  * give coarse pruning (a query on one `lang`/`cube`/day touches one
  * directory subtree), buckets give shuffle-free joins on the bucket
  * key (see ScaleSpec's bucketed-join evidence).
  *
  * Scale notes (100 TB):
  *   - Partition by LOW-cardinality columns only (lang, date, cube id).
  *     A high-cardinality partition column (doc_id!) means millions of
  *     tiny directories — metadata death. Bucket high-cardinality keys
  *     instead.
  *   - `maxRecordsPerFile` bounds file size under skewed partitions so
  *     a hot partition becomes many parallel-readable files, not one
  *     giant one.
  *   - Writers repartition on the partition columns first: each task
  *     then writes to ONE directory (without it, every task appends a
  *     file into every open partition — small-file explosion).
  */
object Sinks {

  /** Hive-style partitioned parquet write. Read-back filters on
    * `partCols` prune whole directories (PartitionFilters in the scan,
    * asserted in SinkSpec).
    */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(partCols.map(df.col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCols: _*)
      .parquet(path)

  /** Bucketed + sorted table write: co-locates rows by `bucketCol` so
    * equi-joins and aggregations on that key need no shuffle at read
    * time. Requires a table name (bucketing metadata lives in the
    * catalog, not the directory layout).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** JSON-lines export of nested fact documents, partitioned — the
    * Elasticsearch-bulk-index analogue: each partition directory is an
    * independently shippable index segment.
    */
  def writeJsonDocs(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.repartition(partCols.map(df.col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .json(path)

  /** Latest-revision-wins storage refresh (the reference's re-download
    * semantics [R: genesapi/storage.py — UNVERIFIED]): overwrite ONLY
    * the partitions present in `df`, leave every other partition
    * untouched. Dynamic partition-overwrite does this natively — no
    * read-modify-write of the whole table, so a 100 TB store refreshes
    * one cube's directory in O(new data).
    */
  def replacePartitions(df: DataFrame, path: String,
      partCols: Seq[String]): Unit = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = conf.get(key, "STATIC")
    conf.set(key, "dynamic")
    try df.repartition(partCols.map(df.col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .parquet(path)
    finally conf.set(key, prev)
  }
}
