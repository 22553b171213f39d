package graft.sources

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DoubleType, FloatType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the r17 pass-11 fix: [[UpsertSinkSource.keyOf]]'s
  * floating-key canonicalization must agree with Spark's OWN key
  * semantics (NormalizeFloatingNumbers: every NaN payload one key,
  * `-0.0` = `0.0`, everything else by value) for ARBITRARY bit
  * patterns — the unit spec pins the two famous cases, this pins the
  * whole space. Doubles are generated from raw long bits, so random
  * NaN payloads (quiet/signalling, any mantissa) are first-class
  * inputs, exactly the shapes a poisoned upstream measure delivers.
  * Pure row logic — no SparkSession.
  */
class KeyOfPropertiesSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(1717L + i)))

  private val dblSchema = StructType(Seq(StructField("k", DoubleType)))
  private val fltSchema = StructType(Seq(StructField("k", FloatType)))

  private def dKey(v: Double) =
    UpsertSinkSource.keyOf(
      new GenericInternalRow(Array[Any](v)), dblSchema, Seq("k"))
  private def fKey(v: Float) =
    UpsertSinkSource.keyOf(
      new GenericInternalRow(Array[Any](v)), fltSchema, Seq("k"))

  // raw bits → every special shape: ±0.0, ±Inf, denormals, and NaNs
  // with arbitrary payloads; mixed with the named specials so the
  // fixed sample always contains the interesting collisions
  private val anyDouble: Gen[Double] = Gen.frequency(
    6 -> Gen.choose(Long.MinValue, Long.MaxValue)
      .map(java.lang.Double.longBitsToDouble),
    1 -> Gen.oneOf(0.0, -0.0, Double.NaN,
      java.lang.Double.longBitsToDouble(0x7ff8000000000001L), // NaN, odd payload
      java.lang.Double.longBitsToDouble(0xfff8000000000000L), // negative NaN
      Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, 1.0))

  private val anyFloat: Gen[Float] = Gen.frequency(
    6 -> Gen.choose(Int.MinValue, Int.MaxValue)
      .map(java.lang.Float.intBitsToFloat),
    1 -> Gen.oneOf(0.0f, -0.0f, Float.NaN,
      java.lang.Float.intBitsToFloat(0x7fc00001), // NaN, odd payload
      java.lang.Float.intBitsToFloat(0xffc00000), // negative NaN
      Float.PositiveInfinity, Float.NegativeInfinity, 1.0f))

  test("double keys: keyOf equality ≡ Spark key equality (all-NaN one key, -0.0 = 0.0, else value) — 400 arbitrary bit pairs") {
    samples(Gen.zip(anyDouble, anyDouble), 400).foreach { case (a, b) =>
      val sparkEqual = (a.isNaN && b.isNaN) || a == b // primitive ==: -0.0 == 0.0
      assert((dKey(a) == dKey(b)) === sparkEqual,
        s"a=$a(0x${java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(a))}) " +
          s"b=$b(0x${java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(b))})")
      // hash consistency: equal keys MUST share a bucket (the merge
      // map and bucketOf both hash the canonical Seq)
      if (sparkEqual)
        assert(dKey(a).hashCode === dKey(b).hashCode)
    }
  }

  test("float keys: same law — 400 arbitrary bit pairs") {
    samples(Gen.zip(anyFloat, anyFloat), 400).foreach { case (a, b) =>
      val sparkEqual = (a.isNaN && b.isNaN) || a == b
      assert((fKey(a) == fKey(b)) === sparkEqual,
        s"a=$a(0x${java.lang.Integer.toHexString(java.lang.Float.floatToRawIntBits(a))}) " +
          s"b=$b(0x${java.lang.Integer.toHexString(java.lang.Float.floatToRawIntBits(b))})")
      if (sparkEqual)
        assert(fKey(a).hashCode === fKey(b).hashCode)
    }
  }

  test("canonical bits never leak back as row data: keyOf output is identity material only") {
    // the encoded key must be a Long (bits), never the original boxed
    // Double — a consumer that round-tripped it into row data would
    // resurrect the boxed-equality bug downstream
    assert(dKey(1.5).head.isInstanceOf[java.lang.Long])
    assert(fKey(1.5f).head.isInstanceOf[java.lang.Integer])
  }
}
