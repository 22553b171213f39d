package graft

import org.apache.spark.sql.functions._

/** Flagship-pipeline invariants (SparkEntry.entry — the nightly
  * incremental shape): key uniqueness after the merge, the dim
  * actually overwriting stale pre-existing values, and idempotent
  * re-run (the reference's core operational guarantee,
  * load_sales_data.py:129-134).
  */
class EntrySpec extends SparkSpec {
  import spark.implicits._

  private lazy val result = SparkEntry.entry(spark).cache()

  test("entry: produces rows and a key-unique mart") {
    assert(result.count() > 0)
    val dups = result.groupBy("chain_no", "sale_dy").count()
      .filter(col("count") > 1).count()
    assert(dups === 0L, "merge left duplicate (chain_no, sale_dy) keys")
  }

  test("entry: dim enrichment overwrote every stale placeholder it could") {
    // rows whose chain exists in the dim with a non-null segment must
    // carry the dim value, never the pre-existing 'stale' marker
    val stale = result.filter(col("responsible") === "stale")
    val dim = Tables.customer(spark, "/root/testdata/sf0.001")
      .filter(col("c_mktsegment") =!= "BUILDING")
      .select(col("c_custkey").as("chain_no"))
    assert(stale.join(dim, Seq("chain_no"), "left_semi").count() === 0L,
      "stale value survived where the dim had a replacement")
  }

  test("entry: re-run is idempotent (same mart, row for row)") {
    val again = SparkEntry.entry(spark)
    assert(result.exceptAll(again).count() === 0L)
    assert(again.exceptAll(result).count() === 0L)
  }

  test("registry contract: every oracle key names a registered query; rows-only set is exactly the documented one") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    val orphanOracles = os -- qs
    assert(orphanOracles.isEmpty,
      s"oracle entries with no query (typo → silently ungraded): $orphanOracles")
    // queries the driver grades rows-only, by declared design
    val rowsOnlyByDesign = Set("q30_simhash")
    assert((qs -- os) === rowsOnlyByDesign,
      s"every new query needs an oracleSql entry (or add it to the documented rows-only set): ${(qs -- os) -- rowsOnlyByDesign}")
  }
}
