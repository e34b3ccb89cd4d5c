package graft

import org.apache.spark.sql.graft.{ExpFixedPoint, LnFixedPoint}
import org.apache.spark.sql.functions._

/** The pinned fixed-point exp (q167/q168's cross-engine exponential —
  * [[LnFixedPoint]]'s inverse): exact pinned values (the same integers
  * the DuckDB HUGEINT mirror produces — re-verified against the
  * prototype SQL), round-trip against ln_fp, accuracy envelope vs
  * Math.exp, domain edges, and the native `exp_fp` expression's null
  * contract. */
class ExpFixedPointSpec extends SparkSpec {
  import spark.implicits._
  graft.engine.GraftFunctions.register(spark)

  test("pinned values: identical integers to the DuckDB HUGEINT mirror") {
    val expected = Seq(
      0L -> 1000000000000000L, // e^0 = 1
      ExpFixedPoint.Ln2 -> 2000000000000000L, // e^ln2 = 2 EXACTLY (r = 0)
      -ExpFixedPoint.Ln2 -> 500000000000000L, // e^-ln2 = 1/2 exactly
      1000000000000000L -> 2718281828459036L, // e (9 ulps under floor(e·S))
      -5000000000000000L -> 6737946999085L, // e^-5
      2302585092994046L -> 9999999999999976L, // e^ln10 ≈ 10
      9129000000000000L -> 9218798559688589312L, // MaxArg itself
      -45000000000000000L -> 0L) // deep negative floors to 0
    expected.foreach { case (x, v) =>
      assert(ExpFixedPoint.expFp(x) === v, s"expFp($x)")
    }
  }

  test("round trip: expFp(lnFp(n)) within 2e-10 relative of n·S") {
    // the verdict-item contract: exp really is ln's inverse at this
    // scale. Error budget: ~21 floor-division ulps amplified by 2^q
    // (q <= 13 in-domain) — ~2e-10 relative worst case, documented.
    // n ≤ 9218: n·S must stay inside int64 (the expFp output domain —
    // larger n is exactly what MaxArg nulls out at the expression level)
    Seq(1L, 2L, 3L, 7L, 100L, 999L, 4096L, 9000L, 9218L)
      .foreach { n =>
        val got = ExpFixedPoint.expFp(LnFixedPoint.lnFp(n))
        val want = n * ExpFixedPoint.Scale
        assert(math.abs(got - want).toDouble <= math.max(2e-10 * want, 2.0),
          s"expFp(lnFp($n)) = $got vs $want")
      }
  }

  test("accuracy envelope vs Math.exp across the domain") {
    (-40 to 9).foreach { i =>
      val x = i.toLong * ExpFixedPoint.Scale / 2L // half-integer steps
      val got = ExpFixedPoint.expFp(x).toDouble / ExpFixedPoint.Scale
      val want = math.exp(x.toDouble / ExpFixedPoint.Scale)
      assert(math.abs(got - want) <= math.max(1e-9 * want, 1e-15),
        s"expFp($x) = $got vs $want")
    }
  }

  test("monotone over a dense range spanning the ln2 reduction boundaries") {
    val xs = (-3000L to 3000L).map(k => k * 1000000000000L) // step 0.001
    val vs = xs.map(ExpFixedPoint.expFp)
    vs.sliding(2).foreach { case Seq(a, b) => assert(a <= b) }
    assert(vs.head < vs.last)
  }

  test("exp_fp expression: codegen path matches the helper; past-MaxArg and NULL yield NULL") {
    val df = Seq[java.lang.Long](0L, ExpFixedPoint.Ln2, -5000000000000000L,
      ExpFixedPoint.MaxArg, ExpFixedPoint.MaxArg + 1L, null)
      .toDF("x")
      .select(col("x"), call_function("exp_fp", col("x")).as("e"))
    val rows = df.collect().map(r =>
      (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).toSeq
    assert(rows.contains((Some(0L), Some(1000000000000000L))))
    assert(rows.contains((Some(ExpFixedPoint.Ln2), Some(2000000000000000L))))
    assert(rows.contains((Some(-5000000000000000L), Some(6737946999085L))))
    assert(rows.contains(
      (Some(ExpFixedPoint.MaxArg), Some(9218798559688589312L))))
    assert(rows.contains((Some(ExpFixedPoint.MaxArg + 1L), None)))
    assert(rows.contains((None, None)))
  }

  test("exp identity: expFp(a+b) ≈ expFp(a)·expFp(b)/S within the floor budget") {
    val pairs = Seq((1000000000000000L, 2000000000000000L),
      (-3000000000000000L, 1500000000000000L),
      (-500000000000000L, -700000000000000L))
    pairs.foreach { case (a, b) =>
      val lhs = BigInt(ExpFixedPoint.expFp(a + b))
      val rhs = BigInt(ExpFixedPoint.expFp(a)) *
        BigInt(ExpFixedPoint.expFp(b)) / BigInt(ExpFixedPoint.Scale)
      val tol = (lhs.max(rhs) / BigInt(1000000000L)).max(BigInt(200))
      assert((lhs - rhs).abs <= tol, s"expFp($a+$b): $lhs vs $rhs")
    }
  }
}
