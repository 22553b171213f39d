package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for the r16 shingle rewrite (the zip_with chain that
  * replaced the O(n²) transform-with-reference): random token arrays
  * over the operator's CONTRACT SPACE — null-free, empty strings
  * included (exactly what `TextOps.tokens` = split produces: doubled
  * separators yield "" tokens, never nulls) — against an
  * obviously-correct Scala sliding-window reference. The unit spec
  * pins named examples and a linearity witness; this pins the VALUE
  * semantics across the input space, so any future "optimization" of
  * the chain that shifts a window boundary or mishandles the tail
  * padding breaks here first, not in a similarity-join recall drop at
  * sf0.1.
  *
  * The first draft of this spec generated interior NULL tokens too,
  * and FOUND a real divergence: a window with ≥2 adjacent nulls
  * leaves a separator artifact (" xyz") where concat_ws-over-array
  * skipped all nulls — and [[TextOps.ngramHashes64]] diverges
  * differently again (xxhash64(null) stays at its seed, so a null
  * token is a phantom sentinel with a valid hash). No
  * caller can produce a null token (all derive from split), so the
  * resolution is the documented precondition on the operator, the
  * contract-space property here, and an explicit out-of-contract
  * CANARY pinning today's behavior so a change to it is a decision,
  * not an accident.
  */
class ShinglePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(9090L + i)))

  // tokens never contain the separator (the operator's stated
  // precondition) and never null (the r17 precondition); empty
  // strings are legal and REAL (split on doubled separators)
  private val token: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("a", "b", "c", "dd", "ee", "xyz", "0", "9q"),
    1 -> Gen.const(""))

  private val tokLists: Gen[List[String]] = for {
    n <- Gen.choose(0, 24)
    l <- Gen.listOfN(n, token)
  } yield l

  /** The reference semantics on the contract space: every
    * n-consecutive-token window joined with " ", distinct, in
    * first-appearance order; empty when size < n. */
  private def expected(toks: List[String], n: Int): Seq[String] =
    if (toks.size < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct

  test("shingles ≡ sliding-window reference on random null-free token arrays (empties included), n = 2 and 3") {
    for (n <- Seq(2, 3)) {
      samples(tokLists, 25).foreach { toks =>
        val got = Seq(Tuple1(toks)).toDF("toks")
          .select(TextOps.shingles(col("toks"), n).as("sh"))
          .as[Seq[String]].head()
        assert(got === expected(toks, n),
          s"n=$n toks=$toks got=$got expected=${expected(toks, n)}")
      }
    }
  }

  test("ngramHashes64 is set-equivalent to the string shingles on the contract space (count law, fixed seeds)") {
    // the numeric rotate-XOR path must represent exactly the same
    // window SET as the string path — compared by distinct count,
    // deterministic under fixed seeds (a 64-bit collision in these
    // tiny samples would be astronomically unlucky and, with fixed
    // seeds, permanent and investigable rather than flaky)
    samples(tokLists, 25).foreach { toks =>
      val row = Seq(Tuple1(toks)).toDF("toks")
        .select(
          size(TextOps.shingles(col("toks"), 3)).as("ns"),
          size(TextOps.ngramHashes64(col("toks"), 3)).as("nh"))
        .as[(Int, Int)].head()
      assert(row._1 === row._2, s"toks=$toks stringCount=${row._1} hashCount=${row._2}")
    }
  }

  test("out-of-contract CANARY: interior nulls — single null skipped, adjacent nulls leave a separator artifact, numeric path treats null as a phantom sentinel") {
    // NOT a desired contract — the pinned record of today's
    // out-of-contract behavior (see the class doc). If this test ever
    // fails, someone changed null-token handling: update the operator
    // docs and this canary TOGETHER.
    val toks = List("a", null, null, "xyz")
    val (sh, nh) = Seq(Tuple1(toks)).toDF("toks")
      .select(TextOps.shingles(col("toks"), 3).as("sh"),
        TextOps.ngramHashes64(col("toks"), 3).as("nh"))
      .as[(Seq[String], Seq[java.lang.Long])].head()
    assert(sh === Seq("a", " xyz"),   // [a,∅,∅]→"a"; [∅,∅,xyz]→" xyz"
      s"string path drifted: $sh")
    // numeric path: xxhash64(null) leaves the accumulator at its seed,
    // so a null token is a phantom SENTINEL with a valid hash — both
    // windows get real, distinct hashes (not nulls, not skips)
    assert(nh.size === 2 && nh.forall(_ != null) && nh.toSet.size === 2,
      s"numeric path drifted: $nh")
  }
}
