package graft

import org.apache.spark.sql.functions._

/** A/B isolation of the q36 boxed-id cost (r15 VERDICT item, r16):
  * after the nullkeys contract made `MediaRecord.media_id` a boxed
  * `java.lang.Long` (NULL ids pass through the decode), q36/q49's
  * isolated floors rose ~0.08-0.1 s and the boxed encoder was the one
  * candidate mechanism. This times the graded boxed path against a
  * pre-contract PRIMITIVE-id variant (which must filter NULL ids at
  * the boundary — the contract it would trade away) on the same data,
  * same session, ARMS INTERLEAVED so ambient drift hits both equally.
  *
  * Run: tools/idle_run.sh -- tools/spark_java.sh graft.DevBoxedIdAB
  *        [sfDir] [reps]
  */
object DevBoxedIdAB {
  final case class PrimRecord(media_id: Long, payload: Array[Byte])
  final case class PrimFeatures(media_id: Long, n_bytes: Long,
                                width: Long, height: Long, checksum: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 7
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Tables.documents(spark, sfDir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

    def boxedArm(): Long =
      graft.ops.MultimodalOps.extractFeatures(base, "doc_id", "payload").count()

    // the primitive variant: NOT_NULL boundary filter + primitive
    // encoders end to end; decode arithmetic inlined (decodeOne's
    // signature is the boxed record — reusing it would re-box and
    // measure nothing)
    def primArm(): Long = {
      val typed = base.filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("media_id"), col("payload")).as[PrimRecord]
      typed.filter((r: PrimRecord) => r.payload != null)
        .mapPartitions(_.map { r =>
          val n = r.payload.length.toLong
          val prefix = java.util.Arrays.copyOfRange(
            r.payload, 0, math.min(r.payload.length, 67))
          val header = new String(prefix,
            java.nio.charset.StandardCharsets.UTF_8)
            .codePoints().limit(16).asLongStream().sum()
          PrimFeatures(r.media_id, n, 64L + n % 512L,
            64L + (n / 7L) % 512L, header % 997L)
        }).toDF().count()
    }

    // warm both codegen paths outside the timed loop
    boxedArm(); primArm()
    def t(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // interleave, alternating which arm goes first each rep
    val (as, bs) = (1 to reps).map { i =>
      if (i % 2 == 1) { val a = t(boxedArm _); val b = t(primArm _); (a, b) }
      else { val b = t(primArm _); val a = t(boxedArm _); (a, b) }
    }.unzip
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    def stats(xs: Seq[Double]) =
      s"""{"min":${r4(xs.min)},"med":${r4(BenchLine.median(xs))},"max":${r4(xs.max)}}"""
    val (now, boot) = BenchStamp.stamp()
    println(s"""{"arm_boxed":${stats(as)},"arm_prim":${stats(bs)},"reps":$reps,"sf":"$sfDir"${BenchStamp.fragment(now, boot)}}""")
    spark.stop()
  }
}
