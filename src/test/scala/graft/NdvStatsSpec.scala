package graft

import graft.functions.HllAgg
import graft.medallion.{GraftTable, TxLog}
import org.apache.spark.sql.functions._

/** Per-file HLL NDV sketches (`ndv.columns` table property): zero-scan
  * distinct-count estimation from the log (register-max union across
  * live files) and DSv2 column statistics for the CBO. Accuracy bar:
  * ±5% at 2^11 registers (theory: ≈2.3% relative error). */
class NdvStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): GraftTable = {
    val dir = new java.io.File(
      s"target/tmp/ndv_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    new GraftTable(dir.getAbsolutePath)
  }

  test("zero-scan NDV within 5%; cross-file duplicates count once") {
    val t = freshTable("acc")
    t.append(Seq(-1L).toDF("id"))
    t.setProperty(TxLog.NdvColumnsProp, "id")
    // 6 files, each 10k ids from overlapping ranges: union = 30k ids
    (0 until 6).foreach { f =>
      t.append(((f % 3) * 10000L until ((f % 3) * 10000L + 10000L))
        .toDF("id").coalesce(1))
    }
    t.delete(spark, "id", Some(-1L), Some(-1L)) // retire the unsketched seed
    val est = t.approxCountDistinct("id").get
    val exact = 30000L // 0..29999
    assert(math.abs(est - exact) <= exact / 20,
      s"estimate $est vs exact $exact exceeds 5%")
    // unsketched columns and pre-property files answer None
    assert(t.approxCountDistinct("id", version = 1L) === None,
      "the seed file predates the property — a partial union must refuse")
  }

  test("strings sketch; unsupported types refuse; empty table answers 0") {
    val t = freshTable("types")
    t.append(Seq((1L, "a", 0.5)).toDF("id", "s", "d"))
    t.setProperty(TxLog.NdvColumnsProp, "s")
    intercept[IllegalArgumentException] {
      t.setProperty(TxLog.NdvColumnsProp, "d") }
    intercept[IllegalArgumentException] {
      t.setProperty(TxLog.NdvColumnsProp, "nope") }
    t.append((0 until 5000).map(i => (i.toLong, s"s${i % 997}", 0.0))
      .toDF("id", "s", "d"))
    t.overwrite(spark.read.format("graft-table").load(t.tablePath)
      .filter(col("id") >= 0).select("id", "s", "d")) // rewrite: all files sketched
    val est = t.approxCountDistinct("s").get
    assert(math.abs(est - 998L) <= 50L, s"string NDV $est vs ~998")
  }

  test("compaction rebuilds sketches; checkpoint + fresh handle keep them") {
    val t = freshTable("lifecycle")
    t.append(Seq(-1L).toDF("id"))
    t.setProperty(TxLog.NdvColumnsProp, "id")
    (0 until 4).foreach(f =>
      t.append((f * 1000L until (f + 1) * 1000L).toDF("id").coalesce(1)))
    t.delete(spark, "id", Some(-1L), Some(-1L)) // retire the unsketched seed
    val before = t.approxCountDistinct("id").get
    t.compact(spark)
    val after = t.approxCountDistinct("id").get
    assert(math.abs(after - 4000L) <= 200L && math.abs(before - 4000L) <= 200L,
      s"compaction must re-sketch from the bytes: $before -> $after")
    t.checkpoint()
    assert(new GraftTable(t.tablePath).approxCountDistinct("id").isDefined)
  }

  test("DSv2 column statistics: distinctCount from sketches, nullCount exact") {
    val t = freshTable("colstats")
    t.append(Seq((0L, Option.empty[String])).toDF("id", "s"))
    t.setProperty(TxLog.NdvColumnsProp, "id")
    t.append((1L until 2001L).map(i =>
      (i, if (i % 10 == 0) None else Some(s"v$i"))).toDF("id", "s"))
    val df = spark.read.format("graft-table").load(t.tablePath).select("id", "s")
    df.count()
    val gs = graft.plans.AdaptivePlans.collectDeep(df) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[graft.streaming.GraftScan]
    val cs = gs.estimateStatistics().columnStats()
    import scala.jdk.CollectionConverters.MapHasAsScala
    val byName = cs.asScala.map { case (k, v) => k.describe() -> v }
    // id: sketched on every file except the 1-row seed -> no NDV for the
    // whole pruned set is WRONG to emit... the seed lacks a sketch, so
    // distinctCount must be absent while nullCount (0) is present
    assert(!byName("id").distinctCount().isPresent,
      "a pre-property file in the scan must suppress distinctCount")
    assert(byName("id").nullCount().getAsLong === 0L)
    assert(byName("s").nullCount().getAsLong === 201L) // 200 + seed null
    // retire the seed; now the NDV surfaces and is ~2000
    t.delete(spark, "id", Some(0L), Some(0L))
    val df2 = spark.read.format("graft-table").load(t.tablePath).select("id")
    df2.count()
    val gs2 = graft.plans.AdaptivePlans.collectDeep(df2) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[graft.streaming.GraftScan]
    val cs2 = gs2.estimateStatistics().columnStats().asScala
      .map { case (k, v) => k.describe() -> v }
    val ndv = cs2("id").distinctCount().getAsLong
    assert(math.abs(ndv - 2000L) <= 100L, s"NDV $ndv vs ~2000")
  }

  test("CBO consumes the scan's column stats (attributeStats in the plan)") {
    val t = freshTable("cbo")
    t.append(Seq(0L).toDF("id"))
    t.setProperty(TxLog.NdvColumnsProp, "id")
    t.delete(spark, "id", Some(0L), Some(0L))
    t.append((1L until 1001L).toDF("id"))
    val key = "spark.sql.cbo.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.format("graft-table").load(t.tablePath).select("id")
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong === 1000L))
      val attr = stats.attributeStats.find(_._1.name == "id").map(_._2)
      assert(attr.exists(_.distinctCount.exists(n =>
        math.abs(n.toLong - 1000L) <= 60L)),
        s"CBO must see the HLL distinct count, got $attr")
      assert(attr.exists(_.nullCount.contains(BigInt(0))))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("HllAgg estimator: deterministic, merge == union") {
    // SplitMix64: a full-width 64-bit mix (hash60 is 60-bit — its zero
    // top nibble would starve 15/16 of the registers)
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val a = new HllAgg(11)
    val r1 = (0L until 5000L).foldLeft(a.zero)((b, i) => a.reduce(b, mix(i)))
    val r2 = (2500L until 7500L).foldLeft(a.zero)((b, i) => a.reduce(b, mix(i)))
    val e1 = HllAgg.estimate(r1)
    HllAgg.mergeInto(r1, r2)
    val eu = HllAgg.estimate(r1)
    assert(math.abs(e1 - 5000L) <= 250L, s"e1=$e1")
    assert(math.abs(eu - 7500L) <= 375L, s"union=$eu")
    assert(HllAgg.estimate(a.zero) === 0L)
    // null input (a NULL column value) contributes nothing
    assert(HllAgg.estimate(a.reduce(a.zero, null)) === 0L)
  }

  test("nulls contribute nothing to NDV (no phantom distinct per file)") {
    val t = freshTable("nulls")
    t.append(Seq(Option.empty[Long]).toDF("id"))
    t.setProperty(TxLog.NdvColumnsProp, "id")
    // 4 files, each: one real value (42) + many nulls. xxhash64(NULL)
    // returns the seed — un-skipped, each sketch would register a
    // phantom value and the union would answer 2, not 1.
    (0 until 4).foreach { _ =>
      t.append((Seq(Some(42L)) ++ Seq.fill(200)(Option.empty[Long]))
        .toDF("id").coalesce(1))
    }
    t.overwrite(t.read(spark)) // rewrite so every live file is sketched
    assert(t.approxCountDistinct("id").get === 1L,
      "nulls must not register as a distinct value")
  }

  test("columnStats: absence of a stats entry is all-null proof only for " +
      "always-stats-able types") {
    val t = freshTable("absence")
    // binary column: never stats-able — no entries ever; double column:
    // entries are DROPPED when min/max is NaN — absence proves nothing
    t.append(Seq((1L, Array[Byte](1, 2), Double.NaN),
      (2L, Array[Byte](3), 1.5)).toDF("id", "b", "d"))
    val df = spark.read.format("graft-table").load(t.tablePath)
      .select("id", "b", "d")
    df.count()
    val gs = graft.plans.AdaptivePlans.collectDeep(df) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[graft.streaming.GraftScan]
    import scala.jdk.CollectionConverters.MapHasAsScala
    val byName = gs.estimateStatistics().columnStats().asScala
      .map { case (k, v) => k.describe() -> v }
    assert(byName.get("b").forall(!_.nullCount().isPresent),
      "a never-stats-able column must not report nullCount == rowCount")
    assert(byName.get("d").forall(!_.nullCount().isPresent),
      "a NaN-dropped double file must leave the null count unknown")
    assert(byName("id").nullCount().getAsLong === 0L,
      "always-stats-able columns keep their exact null counts")
  }
}
