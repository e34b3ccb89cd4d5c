package graft

import org.apache.spark.sql.graft.LnFixedPoint
import org.apache.spark.sql.functions._

/** The pinned fixed-point ln (q163's cross-engine log): exact pinned
  * values (the same integers the DuckDB HUGEINT mirror produces),
  * accuracy envelope vs Math.log, domain edges, and the native
  * `ln_fp` expression's null contract. */
class LnFixedPointSpec extends SparkSpec {
  import spark.implicits._
  graft.engine.GraftFunctions.register(spark)

  test("pinned values: identical integers to the DuckDB HUGEINT mirror") {
    // values computed independently by the DuckDB prototype of the
    // oracle SQL — a change to constants/term count breaks BOTH sides
    // or neither, and this pin catches the "only one side edited" case
    val expected = Seq(
      1L -> 0L,
      2L -> 693147180559945L,
      3L -> 1098612288668101L,
      7L -> 1945910149055300L,
      100L -> 4605170185988080L,
      12345L -> 9421006401779265L,
      999999937L -> 20723265773946387L,
      1099511627776L -> 27725887222397800L)
    expected.foreach { case (n, ln) =>
      assert(LnFixedPoint.lnFp(n) === ln, s"lnFp($n)")
    }
  }

  test("accuracy envelope: within 1e-12 relative of Math.log across decades") {
    (0 to 17).foreach { d =>
      val n = math.pow(10, d).toLong.max(1L) + d // off the exact powers
      val got = LnFixedPoint.lnFp(n).toDouble / LnFixedPoint.Scale
      val want = math.log(n.toDouble)
      assert(n == 1L && got == 0.0 ||
        math.abs(got - want) <= math.max(1e-12, want * 1e-12),
        s"lnFp($n) = $got vs $want")
    }
  }

  test("monotone over a dense small range (floor divisions never invert order)") {
    val vals = (1L to 3000L).map(LnFixedPoint.lnFp)
    vals.sliding(2).foreach { case Seq(a, b) => assert(a < b) }
  }

  test("ln_fp expression: codegen path matches the helper; n < 1 and NULL yield NULL") {
    val df = Seq[java.lang.Long](1L, 2L, 999999937L, 0L, -5L, null)
      .toDF("n")
      .select(col("n"), call_function("ln_fp", col("n")).as("ln"))
    val rows = df.collect().map(r =>
      (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).toSeq
    assert(rows.contains((Some(1L), Some(0L))))
    assert(rows.contains((Some(2L), Some(LnFixedPoint.Ln2))))
    assert(rows.contains((Some(999999937L), Some(20723265773946387L))))
    assert(rows.contains((Some(0L), None)))
    assert(rows.contains((Some(-5L), None)))
    assert(rows.contains((None, None)))
  }

  test("log identity: lnFp(a*b) = lnFp(a) + lnFp(b) within a few ulps of the scale") {
    val pairs = Seq((3L, 7L), (12345L, 999L), (1000003L, 17L))
    pairs.foreach { case (a, b) =>
      val lhs = LnFixedPoint.lnFp(a * b)
      val rhs = LnFixedPoint.lnFp(a) + LnFixedPoint.lnFp(b)
      assert(math.abs(lhs - rhs) <= 60L, s"lnFp($a*$b): $lhs vs $rhs")
    }
  }
}
