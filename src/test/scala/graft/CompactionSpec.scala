package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compactParquet: marker-only and nonexistent inputs no-op instead of crashing") {
    // r14 review: a nightly that landed zero rows leaves a dir with
    // only _SUCCESS (Spark writes no part file for an empty task set);
    // the next maintenance run used to die in schema inference
    val base = java.nio.file.Files.createTempDirectory("graft_compact0").toString
    val in = s"$base/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    java.nio.file.Files.write(java.nio.file.Paths.get(in, "_SUCCESS"),
      Array.empty[Byte])
    assert(Compaction.compactParquet(spark, in, s"$base/out", 1024) === 0,
      "an empty slice compacts to zero files, loudly not fatally")
    assert(Compaction.compactParquet(spark, s"$base/missing", s"$base/out2",
      1024) === 0, "a nonexistent input is the same no-op")
  }

  test("compactParquet: many small files -> few target-sized files, content identical") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    // a fragmented table: 64 files for ~60k small rows
    val df = (0L until 60000L).map(i => (i, s"row_$i")).toDF("id", "s")
    df.repartition(64).write.parquet(in)
    val inFiles = new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet"))
    assert(inFiles == 64)

    val n = Compaction.compactParquet(spark, in, out, targetFileBytes = 512 * 1024)
    val outFiles = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles == n, s"promised $n files, wrote $outFiles")
    assert(outFiles < 8, s"compaction should collapse 64 small files, got $outFiles")

    val back = spark.read.parquet(out)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0,
      "compaction must be a pure rewrite — byte-for-byte same rows")
  }

  test("compactParquet: row count below byte-derived partition count — returned count matches reality") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    // 3 wide rows whose on-disk bytes demand more partitions than rows:
    // repartition(n) leaves the excess partitions empty and writes no
    // file for them — the return value must count actual files
    val df = (0 until 3).map(i => (i.toLong, "x" * 200000)).toDF("id", "s")
    df.coalesce(1).write.parquet(s"$base/in")
    val n = Compaction.compactParquet(spark, s"$base/in", s"$base/out",
      targetFileBytes = 1024)
    val outFiles = new java.io.File(s"$base/out").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(n == outFiles, s"returned $n but wrote $outFiles files")
    // far fewer files than the byte-derived partition count (the
    // empty partitions mostly don't materialize; Spark may still emit
    // an empty schema-preserving file, so == rows is NOT guaranteed)
    assert(outFiles < 10,
      s"expected only the non-empty partitions (+~1) on disk, got $outFiles")
  }
}
