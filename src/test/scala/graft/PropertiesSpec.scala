package graft

import graft.functions.TextFns._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5): dedup idempotence, cross-layer
  * reconciliation, tier-bucketing totality, Jaccard bounds. Raw ScalaCheck
  * generators sampled under fixed seeds (no scalatestplus bridge in the
  * dependency set).
  */
class PropertiesSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val texts: Gen[List[String]] = Gen.listOfN(30,
    Gen.listOf(Gen.oneOf("data", "row", "spark", "join", "scan", "key"))
      .map(_.mkString(" ")))

  test("dropDuplicates is idempotent and never increases row count") {
    import spark.implicits._
    samples(texts, 5).foreach { ts =>
      val df = ts.toDF("t")
      val once = df.dropDuplicates("t")
      assert(once.count() === once.dropDuplicates("t").count())
      assert(once.count() <= df.count())
    }
  }

  test("jaccard is bounded in [0,1] and symmetric") {
    import spark.implicits._
    samples(Gen.zip(texts, texts), 3).foreach { case (as, bs) =>
      val pairs = as.zip(bs).filter { case (a, b) =>
        a.split(" ").length >= 3 && b.split(" ").length >= 3
      }
      if (pairs.nonEmpty) {
        pairs.toDF("a", "b").select(
          jaccard(hashedShingles(col("a"), 3), hashedShingles(col("b"), 3)).as("ab"),
          jaccard(hashedShingles(col("b"), 3), hashedShingles(col("a"), 3)).as("ba"))
          .collect()
          .foreach { row =>
            val (ab, ba) = (row.getDouble(0), row.getDouble(1))
            assert(ab >= 0.0 && ab <= 1.0)
            assert(ab === ba)
          }
      }
    }
  }

  test("tier bucketing is total: every double lands in exactly one tier") {
    import spark.implicits._
    samples(Gen.listOfN(50, Gen.chooseNum(-1e7, 1e7)), 5).foreach { vs =>
      val n = vs.toDF("v")
        .withColumn("tier",
          when(col("v") > 1500000, "Premium")
            .when(col("v") > 700000, "Gold")
            .when(col("v") > 200000, "Silver")
            .otherwise("Bronze"))
        .filter(col("tier").isNull).count()
      assert(n === 0L)
    }
  }

  test("cross-layer reconciliation: bronze preserves rows; silver keeps distinct keys") {
    import spark.implicits._
    import graft.medallion.Medallion
    import graft.medallion.Medallion.CleaningRule
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType)))
    samples(Gen.listOfN(40, Gen.zip(Gen.chooseNum(1L, 30L), Gen.chooseNum(0.0, 1e4))), 3)
      .foreach { rows =>
        val src = rows.toDF("id", "amount")
        val root = new java.io.File(
          s"target/tmp/prop_${java.util.UUID.randomUUID()}").getAbsolutePath
        val p = Medallion.writeBronze(src, "t", "2026-03-01 00:00:00", root)
        val bronze = Medallion.readBronze(spark, p, schema)
        val silver = Medallion.toSilver(bronze,
          CleaningRule(Seq("id"), Seq("id", "amount")), "2026-03-01 00:00:00")
        assert(bronze.count() === src.count())
        assert(silver.count() === src.dropDuplicates("id").count())
      }
  }
}
