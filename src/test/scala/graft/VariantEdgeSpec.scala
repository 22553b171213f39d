package graft

import org.apache.spark.sql.functions._

/** JSON-extraction edge contracts (round 18 JSON probe). The probe
  * planted hostile `props` payloads — duplicate keys, 2^63 overflow,
  * scientific-notation and hex STRINGS, padded numbers, JSON floats,
  * nested objects, arrays, booleans — through q21 (get_json_object),
  * q38 (envelope decode) and q106 (VARIANT). Two classes surfaced:
  *
  *  - the TRY_CAST lexicon: DuckDB's TRY_CAST(string AS BIGINT)
  *    accepts scientific notation ('1e2' → 100) and hex ('0x1F' → 31)
  *    where Spark's try_cast is strictly [ws][sign]digits[ws] → NULL.
  *    The engine's strictness IS the contract (a telemetry field that
  *    isn't a plain integer is "not a long", not 31); the oracles now
  *    carry a regexp_matches integral guard mirroring it.
  *  - duplicate keys: Spark's variant spec REJECTS a duplicate-key
  *    object (try_parse_json → NULL — the whole document is invalid)
  *    while get_json_object AND DuckDB's ->> both extract the FIRST
  *    binding. So q21/q38 agree with the oracle on dup keys and only
  *    the VARIANT path (q106) carries the edge — pinned here as a
  *    documented PRECONDITION (fixture props are single-key flat
  *    objects) rather than papered over with a lossy oracle detector.
  *
  * If Spark ever flips `spark.sql.variant.allowDuplicateKeys` on by
  * default (last-wins), the dup-key assertions below fail loudly and
  * the q106 contract must be re-decided — last-wins would diverge
  * from the oracle's first-wins in the OTHER direction.
  */
class VariantEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def k(props: String): java.lang.Long = {
    val df = Seq(props).toDF("props")
      .select(try_variant_get(try_parse_json(col("props")), "$.k", "string")
        .try_cast("bigint").as("k"))
    val row = df.collect()(0)
    if (row.isNullAt(0)) null else Long.box(row.getLong(0))
  }

  private def gjo(props: String): String = {
    val r = Seq(props).toDF("props")
      .select(get_json_object(col("props"), "$.k").as("k")).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("try_cast BIGINT lexicon is strictly integral: sci-notation and hex are NULL") {
    val r = Seq(("1e2", 1), ("0x1F", 2), (" 42 ", 3), ("100.0", 4), ("7", 5))
      .toDF("s", "i")
      .select(col("i"), col("s").try_cast("bigint").as("k"))
      .collect().map(row => row.getInt(0) -> (if (row.isNullAt(1)) null else Long.box(row.getLong(1)))).toMap
    assert(r(1) == null, "'1e2' must not cast (DuckDB reads 100)")
    assert(r(2) == null, "'0x1F' must not cast (DuckDB reads 31)")
    assert(r(3) == Long.box(42L), "padded integral casts (both engines trim)")
    assert(r(4) == null, "non-integral decimal text is not a long")
    assert(r(5) == Long.box(7L))
  }

  test("variant path: a duplicate-key object is INVALID (whole doc → NULL), q106 precondition") {
    assert(k("""{"k":1,"k":99}""") == null,
      "try_parse_json must reject duplicate keys — if this starts " +
        "returning 99 (last-wins), allowDuplicateKeys changed and the " +
        "q106 oracle contract must be re-decided")
    assert(k("""{"k":7}""") == Long.box(7L))
    // overflow and non-integral forms null out, same as the guard
    assert(k("""{"k":9223372036854775808}""") == null)
    assert(k("""{"k":1e2}""") == null)
  }

  test("get_json_object takes the FIRST duplicate binding — agreeing with DuckDB's ->>") {
    assert(gjo("""{"k":1,"k":99}""") == "1")
    assert(gjo("""{"k":99,"k":1}""") == "99")
  }
}
