package graft

import graft.medallion.Medallion
import graft.medallion.Medallion.CleaningRule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Malformed-input behavior: bronze is raw capture, so garbage must land
  * without failing the job and be quarantined by silver cleaning
  * (from_json PERMISSIVE null-out → required-column null-drop).
  */
class RobustnessSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("amount", DoubleType)))

  test("silver cleaning quarantines corrupt envelope lines instead of failing") {
    import spark.implicits._
    val root = new java.io.File("target/tmp/spec_corrupt").getAbsolutePath
    val bronzeDir = s"$root/bronze/t/year=2026/month=2/day=1"
    new java.io.File(bronzeDir).mkdirs()
    val lines = Seq(
      """{"table":"t","operation":"INSERT","timestamp":"x","data":{"id":1,"amount":10.5}}""",
      """not json at all {{{""",
      """{"table":"t","operation":"INSERT","timestamp":"x","data":{"id":null,"amount":3.0}}""",
      """{"table":"t","operation":"INSERT","timestamp":"x","data":{"id":2,"amount":20.5}}""",
      """{"truncated":true""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bronzeDir/batch1.json"),
      lines.mkString("\n").getBytes)

    val flat = Medallion.readBronze(spark, s"$root/bronze/t", schema)
    assert(flat.count() === 5) // raw capture keeps every line
    val silver = Medallion.toSilver(flat,
      CleaningRule(Seq("id"), Seq("id", "amount")), "2026-02-01 00:00:00")
    val rows = silver.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows.map(_.getDouble(1)).toSeq === Seq(10.5, 20.5))
  }

  test("duplicate envelope replay (at-least-once delivery) is absorbed by silver dedup") {
    import spark.implicits._
    val root = new java.io.File("target/tmp/spec_replay").getAbsolutePath
    val src = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "amount")
    val p = Medallion.writeBronze(
      src.unionByName(src), // replayed batch: every record delivered twice
      "t", "2026-02-01 00:00:00", root)
    val silver = Medallion.toSilver(
      Medallion.readBronze(spark, p, schema),
      CleaningRule(Seq("id"), Seq("id", "amount")), "2026-02-01 00:00:00")
    assert(silver.count() === 2)
  }
}
