package graft

import graft.ops.RelationalOps._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property coverage (SURVEY.md §5.3) driven by scalacheck generators
  * with fixed seeds (the scalatest↔scalacheck bridge artifact is not
  * in the offline cache, so sampling is explicit): upsert idempotency
  * + key-uniqueness invariant, and the yyyyMMdd
  * lexicographic-equals-chronological BETWEEN equivalence the
  * reference silently relies on
  * (kicc_to_tb_sales_prod_period.py:71-78).
  */
class UpsertPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val kvRows: Gen[List[(Int, String)]] = for {
    n <- Gen.choose(0, 12)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 5)
      v <- Gen.alphaStr.map(_.take(4))
    } yield (k, v))
  } yield rows.distinctBy(_._1) // each side key-unique per U1 contract

  test("upsert: merge(merge(t,x),x) == merge(t,x) — idempotent re-run") {
    samples(Gen.zip(kvRows, kvRows), 15).foreach { case (t, x) =>
      val target = t.toDF("k", "v")
      val incoming = x.toDF("k", "v")
      val once = upsertLatestWins(target, incoming, Seq("k"))
      val twice = upsertLatestWins(once, incoming, Seq("k"))
      assert(once.orderBy("k", "v").collect().toSeq ===
        twice.orderBy("k", "v").collect().toSeq,
        s"not idempotent for target=$t incoming=$x")
    }
  }

  test("upsert: result is key-unique, covers both key sets, incoming wins") {
    samples(Gen.zip(kvRows, kvRows), 15).foreach { case (t, x) =>
      val merged = upsertLatestWins(t.toDF("k", "v"), x.toDF("k", "v"), Seq("k"))
        .as[(Int, String)].collect()
      val keys = merged.map(_._1)
      assert(keys.length === keys.distinct.length, s"dup keys for $t / $x")
      assert(keys.toSet === (t.map(_._1) ++ x.map(_._1)).toSet)
      val incomingMap = x.toMap
      merged.foreach { case (k, v) =>
        incomingMap.get(k).foreach(exp => assert(v === exp, s"target won on $k"))
      }
    }
  }

  private val dates: Gen[java.time.LocalDate] = for {
    y <- Gen.choose(1995, 2030)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
  } yield java.time.LocalDate.of(y, m, d)

  test("yyyyMMdd string BETWEEN ≡ DATE BETWEEN (lexicographic = chronological)") {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
    samples(Gen.zip(dates, dates, dates), 200).foreach { case (a, lo, hi) =>
      val (l, h) = if (lo.isBefore(hi)) (lo, hi) else (hi, lo)
      val lex = a.format(fmt) >= l.format(fmt) && a.format(fmt) <= h.format(fmt)
      val chrono = !a.isBefore(l) && !a.isAfter(h)
      assert(lex === chrono, s"divergence at a=$a lo=$l hi=$h")
    }
  }
}
