package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance operator every
  * long-lived 100-TB dataset needs: streaming ingest and per-batch
  * nightly appends accumulate thousands of KB-sized files, and scan
  * cost becomes dominated by file-open/footer-read overhead instead of
  * bytes. Compaction rewrites a directory into ~targetFileBytes-sized
  * files: list the input's total bytes (one driver-side FS call — a
  * metadata listing, not a data read), pick
  * ceil(bytes / targetFileBytes) output files, and rewrite through a
  * round-robin repartition. The repartition is a full shuffle by
  * design: `coalesce` would be shuffle-free but cannot split large
  * inputs, inherits upstream skew, and collapses parallelism of the
  * read stage; for an IO-bound maintenance job evenly-sized output
  * files are worth one shuffle of the data.
  *
  * The rewrite goes to a NEW directory and the swap is left to the
  * caller's catalog/orchestration layer (atomic rename or partition
  * re-point) — same job-level atomicity story as q19's
  * overwrite-refresh.
  */
object Compaction {

  /** Rewrite `inPath` (parquet) into `outPath` with evenly-sized
    * files near `targetFileBytes`. Returns the number of files
    * ACTUALLY written — counted from the output listing, because
    * `repartition(n)` writes no file for an empty partition, so when
    * the row count is below the byte-derived partition count the
    * written-file count is smaller than n.
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // degenerate inputs no-op instead of crashing (r14 review): a
    // nightly that landed zero rows leaves a marker-only directory
    // (Spark writes no part file for an empty task set), and
    // spark.read.parquet on it dies with 'Unable to infer schema' —
    // maintenance over an empty slice is a no-op, not an error. The
    // recursive probe stops at the FIRST data file, so the steady
    // (non-empty) path pays one listing step, not a full walk.
    if (!fs.exists(p)) return 0
    val probe = fs.listFiles(p, true)
    var hasData = false
    while (!hasData && probe.hasNext)
      hasData = probe.next().getPath.getName.endsWith(".parquet")
    if (!hasData) return 0
    val bytes = fs.getContentSummary(p).getLength
    // Long math, clamped: a typo'd tiny target on a huge input would
    // overflow toInt negative and fail repartition AFTER planning
    val n = math.min(
      math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes),
      Int.MaxValue.toLong).toInt
    spark.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    // outPath may live on a DIFFERENT filesystem than inPath (hdfs →
    // s3a compaction): resolve its own FS for the listing
    val outP = new Path(outPath)
    outP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(outP)
      .count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
