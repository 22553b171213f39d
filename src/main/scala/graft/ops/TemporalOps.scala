package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators: as-of (nearest-prior-event) join and
  * interval/range join. The reference has no temporal joins — its
  * nightly jobs only bound scans by `[today−1, today)`
  * (`load_sales_data.py:146-147`) — but any event-stream or
  * training-data pipeline needs both, and neither is a built-in Spark
  * join type. Both are implemented Spark-first with explicit 100-TB
  * plans:
  *
  *  - **As-of join is NOT an inequality join.** The naive
  *    `p.ts >= c.ts` join Spark can only execute as a broadcast nested
  *    loop (O(|probe|·|build|) work) or a giant sort-merge-range scan.
  *    Instead: the classic union+window linearization — tag both
  *    sides, union, ONE shuffle on the join key, sort within each
  *    partition by (time, tag), and carry the latest build-side
  *    payload forward with `last(_, ignoreNulls)`. Cost = one exchange
  *    + one in-partition sort, the same plan shape as any window
  *    aggregate, so it survives a 1000-executor scale-up as long as
  *    the key space (users / instruments / stores) partitions evenly.
  *  - **Range join, small interval side**: broadcast the intervals and
  *    evaluate the residual `[start, end)` predicate as a broadcast
  *    nested loop. With |intervals| in the hundreds that is a
  *    constant-time probe per fact row — linear in the fact table,
  *    zero shuffles before the downstream aggregation.
  *  - **Range join, big–big**: band both sides into fixed-width time
  *    buckets. Interval rows explode to every bucket they overlap;
  *    each fact row lands in exactly ONE bucket, so the banded
  *    equi-join emits each qualifying (fact, interval) pair at most
  *    once — no post-join dedup — and the residual predicate restores
  *    exactness. Work is output-linear instead of quadratic.
  */
object TemporalOps {

  /** As-of join: for every probe row, attach the build-side payload of
    * the latest build row with the same `keys` and
    * `build.ts <= probe.ts` (inclusive); probe rows with no prior
    * build row keep a null payload (left-outer semantics).
    *
    * `tieBreak` orders build rows that share a timestamp (latest wins
    * after the sort) — pass the build side's unique id for determinism
    * when build timestamps can collide; it never affects which
    * TIMESTAMP is chosen, only which of several equal-time rows.
    *
    * Output = every probe column, plus one `payloadPrefix + c` column
    * per payload column `c`.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
               probeTs: String, buildTs: String,
               payloadCols: Seq[String], payloadPrefix: String = "",
               tieBreak: Seq[String] = Nil): DataFrame = {
    val probeStruct = struct(probe.columns.map(col).toIndexedSeq: _*)
    val buildStruct = struct((payloadCols ++ tieBreak).distinct.map(col): _*)
    val probeType = probe.select(probeStruct).schema.head.dataType
    val buildType = build.select(buildStruct).schema.head.dataType

    payloadCols.foreach { c =>
      // check the PREFIXED output name (r14 review): a non-empty prefix
      // used to short-circuit the guard even when prefix+c still
      // collided with a probe column
      require(!probe.columns.contains(payloadPrefix + c),
        s"output column '$payloadPrefix$c' collides with a probe column; " +
          "change payloadPrefix or rename — two same-named output " +
          "columns fail on first reference (AMBIGUOUS_REFERENCE)")
    }
    // join semantics for the degenerate build rows (r14 review):
    // a NULL build timestamp satisfies no `build.ts <= probe.ts`
    // (UNKNOWN in SQL) yet sorted nulls-FIRST and its payload was
    // carried to every no-prior-match probe row; a NULL build key
    // matches no probe key under join semantics yet window
    // partitioning groups nulls together. Both are dropped from the
    // build side — probe rows keep left-outer NULL payloads (a probe
    // row with a null key then shares its partition with no build row,
    // so its payload is null by construction).
    val buildKeyed = keys.foldLeft(build.filter(col(buildTs).isNotNull)) {
      (b, k) => b.filter(col(k).isNotNull)
    }
    val buildSide = buildKeyed.select(
      keys.map(col) ++ Seq(
        col(buildTs).as("_t"), lit(0).as("_tag"),
        buildStruct.as("_bv"), lit(null).cast(probeType).as("_pv")): _*)
    val probeSide = probe.select(
      keys.map(col) ++ Seq(
        col(probeTs).as("_t"), lit(1).as("_tag"),
        lit(null).cast(buildType).as("_bv"), probeStruct.as("_pv")): _*)

    // Build rows sort BEFORE probe rows at equal time (tag 0 < 1), so
    // a build event at exactly probe time is visible — inclusive
    // `build.ts <= probe.ts`, matching SQL ASOF semantics. Among
    // build rows at the same time the caller's tieBreak decides.
    val order = Seq(col("_t").asc, col("_tag").asc) ++
      tieBreak.map(c => col(s"_bv.$c").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    buildSide.unionByName(probeSide)
      .withColumn("_asof", last(col("_bv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("_pv.*") +:
        payloadCols.map(c => col(s"_asof.$c").as(payloadPrefix + c)): _*)
  }

  /** Interval join, broadcast flavor: every (fact, interval) pair with
    * `start <= factTime < end`. The interval side is broadcast — the
    * right plan whenever intervals fit in memory (calendars, promo
    * windows, maintenance schedules: thousands at most). The probe is
    * a per-row scan of the broadcast list; at 100 TB the cost is one
    * pass over the facts with zero shuffle.
    */
  def rangeJoinBroadcast(facts: DataFrame, intervals: DataFrame,
                         factTime: String, startCol: String,
                         endCol: String): DataFrame =
    facts.join(broadcast(intervals),
      col(factTime) >= col(startCol) && col(factTime) < col(endCol))

  /** Interval join, banded flavor for big–big inputs: both sides are
    * keyed to `bandDays`-wide day buckets — facts to the single bucket
    * containing their day, intervals exploded to every bucket they
    * overlap — then a plain shuffled equi-join on the bucket plus the
    * exact residual predicate. Each qualifying pair appears in exactly
    * one bucket (the fact's), so results need no dedup. Choose
    * `bandDays` ≈ the typical interval length: shorter bands replicate
    * intervals more; longer bands admit more false candidates for the
    * residual to reject.
    */
  def rangeJoinBanded(facts: DataFrame, intervals: DataFrame,
                      factTime: String, startCol: String, endCol: String,
                      bandDays: Int): DataFrame = {
    require(bandDays > 0, s"bandDays must be positive, got $bandDays")
    val epoch = to_date(lit("1970-01-01"))
    def band(c: org.apache.spark.sql.Column) =
      floor(datediff(c.cast("date"), epoch) / bandDays)
    // Interval bucket range is [band(start), band(end)] inclusive — a
    // superset when `end` is mid-band; the residual predicate makes
    // the join exact, the banding only bounds the candidate set.
    val bandedIntervals = intervals
      .withColumn("_band", explode(sequence(band(col(startCol)),
        band(col(endCol)))))
    facts.withColumn("_band", band(col(factTime)))
      .join(bandedIntervals, Seq("_band"))
      .filter(col(factTime) >= col(startCol) && col(factTime) < col(endCol))
      .drop("_band")
  }

  /** SCD-type-2 change history (gaps-and-islands): collapse a keyed,
    * timestamped value sequence into validity intervals — one row per
    * RUN of consecutive equal values, with `valid_from` / `valid_to`
    * (null = still current) and `is_current`. This is the
    * dimension-history operator the reference's latest-wins upsert (U1)
    * deliberately discards: U1 keeps only the newest value; this keeps
    * the full change timeline, which is what point-in-time joins (q57)
    * consume as their build side.
    *
    * Scale shape: ONE shuffle total. Everything — the change-flag lag,
    * the running-sum run id, the run collapse, and the valid_to lead —
    * partitions by `keyCol`, and Spark satisfies the run-collapse
    * groupBy (key, run) and both windows with the same single hash
    * exchange (subset-clustering). The tie order inside equal
    * timestamps is pinned by `tieCol` so the history is deterministic.
    */
  def changeHistory(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, tieCol: String): DataFrame = {
    // valueCol is the LAST tiebreak (r16 dupfacts probe): a
    // redelivered batch can carry two revisions of one record —
    // identical (ts, tie), different value — and with the order
    // underdetermined there, which revision opens the run flapped
    // between engines/executions. Ordering by the value itself closes
    // the last gap in the total order: rows equal on all three keys
    // are equal in value too, and merge into one run regardless.
    // asc_nulls_last on every ordering key: Spark's bare ASC places
    // NULLs FIRST where DuckDB (and the q69 oracle) default to NULLS
    // LAST — a NULL-ts revision would open the history on one side
    // and close it on the other, reshaping every run boundary (r18
    // nulltime probe).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc_nulls_last, col(tieCol).asc_nulls_last,
        col(valueCol).asc_nulls_last)
    val prev = lag(col(valueCol), 1).over(w)
    // null-safe change detection: `prev.isNull || v =!= prev` conflated
    // "first row" with "previous value was null" AND never flagged a
    // transition INTO null (v =!= prev is NULL there, read as 0) — a
    // null status silently merged into the preceding run while every
    // row after a null split spuriously. row_number pins the first
    // row; <=> compares null-safely.
    val runs = df
      .withColumn("_chg",
        when(row_number().over(w) === 1 || !(col(valueCol) <=> prev), 1)
          .otherwise(0))
      .withColumn("_run", sum(col("_chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_run"))
      .agg(min(col(valueCol)).as("status"), // constant within a run
        min(col(tsCol)).as("valid_from"))
    // _run breaks valid_from ties (r14 review): two runs can share a
    // valid_from when an equal-timestamp value change is split by
    // tieCol — ordering by valid_from alone left lead() free to assign
    // valid_to/is_current to either run, flapping between executions
    // despite the determinism claim above
    val wOut = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from").asc_nulls_last, col("_run").asc_nulls_last)
    runs.select(col(keyCol), col("status"), col("valid_from"),
        lead(col("valid_from"), 1).over(wOut).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Trailing-window attribution by typed cogroup: for every key,
    * merge a target stream (clicks) against a source stream (views)
    * in time order and count targets with a source in the trailing
    * `windowMicros` (inclusive at both ends: a view AT the click
    * instant attributes, and so does one exactly `windowMicros`
    * before).
    *
    * Why cogroup and not a join: the join formulation pairs every
    * target with every earlier source per key before collapsing —
    * |sources|×|targets| intermediate rows (the oracle does exactly
    * that as its independent derivation). Cogroup ships each side
    * through ONE co-partitioned exchange on the key and walks both
    * sorted arrays with a two-pointer — O(n log n) per key for the
    * sorts, O(n) for the merge, zero pair materialization. Timestamps
    * travel as micros longs so the hot loop compares primitives.
    *
    * Keys with no targets emit nothing; targets with no sources count
    * as unattributed. Per-key memory is the key's own event count —
    * the same bound as any window over the key, not a pair blow-up.
    */
  def trailingAttribution(sources: org.apache.spark.sql.Dataset[(Long, Long)],
                          targets: org.apache.spark.sql.Dataset[(Long, Long)],
                          windowMicros: Long): DataFrame = {
    // a negative window attributes NOTHING (t - prior >= 0 always) —
    // a silently-wrong metric, not an error; fail fast like bandDays
    require(windowMicros >= 0, s"windowMicros must be >= 0, got $windowMicros")
    val spark = sources.sparkSession
    import spark.implicits._
    sources.groupByKey(_._1).cogroup(targets.groupByKey(_._1)) {
      (key, srcIt, tgtIt) =>
        val ts = tgtIt.map(_._2).toArray
        if (ts.isEmpty) Iterator.empty
        else {
          val ss = srcIt.map(_._2).toArray
          java.util.Arrays.sort(ss); java.util.Arrays.sort(ts)
          var i = 0; var attributed = 0L
          ts.foreach { t =>
            while (i < ss.length && ss(i) <= t) i += 1
            if (i > 0 && t - ss(i - 1) <= windowMicros) attributed += 1
          }
          Iterator((key, ts.length.toLong, attributed))
        }
    }.toDF("user_id", "n_clicks", "n_attributed")
  }
}
