package graft

import java.nio.file.{Files, Paths}

/** The persisted-ingest-artifact contract shared by q35 (IVF
  * centroids) and q56/q89 (near-dup pairs/components): content-keyed
  * path, _SUCCESS-gated. Two failure modes worth pinning:
  *   - crash-partial-write: a prior run died after creating the
  *     artifact dir but before committing — the bare-directory check
  *     would serve the partial data; the _SUCCESS gate must force a
  *     rebuild instead (ADVICE round 4's original finding, now pinned
  *     for the component artifact too);
  *   - stale-read: a committed artifact must be READ on re-invocation,
  *     not rebuilt — the whole point of keying by dataset content.
  */
class ArtifactGateSpec extends SparkSpec {

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
  }

  test("component artifact: _SUCCESS-gated rebuild after a crashed write, pure read after a committed one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_art_").toString
    try {
      // unique token per doc keeps cross-doc Jaccard ~0.56 (< 0.8), so
      // the only pairs are the planted " graftdup" copies (J = 7/8)
      val docs = (0L to 9L)
        .map(i => (i, s"alpha bravo charlie delta echo foxtrot golf token$i end"))
        .toDF("doc_id", "text")
      docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
      val fp = Fixtures.tableFingerprint(dir, "documents")
      assert(fp.matches("[0-9a-f]{8}"),
        "directory-shaped spec fixtures must fingerprint by content, " +
          s"not collapse to '$fp' (colliding artifact cache keys)")
      val cpath = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_comps_v2_$fp")
      // simulate the crash: artifact dir exists with junk, no _SUCCESS
      rm(cpath.toFile)
      Files.createDirectories(cpath)
      Files.write(cpath.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
      val out = SparkEntry.queries("q56_neardup_components")(spark, dir)
        .collect()
      assert(out.length === 20, // 10 planted pairs × both members
        s"rebuild must ignore the junk and recompute, got ${out.length} rows")
      assert(Files.exists(cpath.resolve("_SUCCESS")),
        "the rebuild must commit the marker")
      // re-invocation on the committed artifact: read, don't rebuild
      val mt = Files.getLastModifiedTime(cpath.resolve("_SUCCESS"))
      val again = SparkEntry.queries("q56_neardup_components")(spark, dir)
        .collect()
      assert(again.length === 20)
      assert(Files.getLastModifiedTime(cpath.resolve("_SUCCESS")) === mt,
        "a committed artifact must be served by read, not rebuilt")
      rm(cpath.toFile) // leave no content-keyed residue for other runs
      rm(Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_pairs_v2_$fp").toFile)
    } finally rm(new java.io.File(dir))
  }
}
