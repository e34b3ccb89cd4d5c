package graft

import graft.medallion.{GraftTable, PartitionSpec, TxLog}
import graft.streaming.GraftCatalog
import org.apache.spark.sql.functions._

/** Hidden partitioning (`partition.spec` table property): Iceberg's
  * transform partitioning realised as derived per-file stats — appends
  * cluster by the transform tuple, reads translate source-column
  * predicates into transform space per-file, and spec EVOLUTION is a
  * metadata-only commit with per-file-exact pruning (old files prune
  * under the transforms they were written with). Soundness bar: pruning
  * may only ever drop files that provably cannot match. */
class PartitionSpecSpec extends SparkSpec {

  private def freshTable(tag: String): GraftTable = {
    val dir = new java.io.File(
      s"target/tmp/pspec_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    new GraftTable(dir.getAbsolutePath)
  }

  /** AQE's shuffle coalescing folds this suite's tiny range exchanges
    * into one partition (the right behavior at scale — adjacent ranges
    * merge toward the advisory size, keeping runs contiguous); layout
    * assertions need the un-coalesced file shape. */
  private def withoutCoalesce[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private val MsPerDay = 86400000L
  private def tsOf(day: Long, offsetMs: Long): java.sql.Timestamp =
    new java.sql.Timestamp(day * MsPerDay + offsetMs)

  /** 30 days × 100 events: (id, ts, user_id). */
  private def month(t: GraftTable): Unit = {
    import spark.implicits._
    val rows = for (d <- 0L until 30L; i <- 0L until 100L)
      yield (d * 100L + i, tsOf(19700L + d, i * 1000L), i % 50L)
    t.append(rows.toDF("id", "ts", "user_id"))
  }

  test("parse/validate: transforms round-trip; bad specs refuse at setProperty") {
    // canonical forms round-trip through the stats-key encoding
    val ts = PartitionSpec.parse("days(ts), bucket(8,user_id), trunc(100, id)")
    assert(ts.map(_.render) === Seq("days(ts)", "bucket(8,user_id)", "trunc(100,id)"))
    ts.foreach(t => assert(PartitionSpec.fromStatKey(t.statKey) === Some(t)))
    assert(PartitionSpec.fromStatKey("id") === None)
    assert(PartitionSpec.fromStatKey("__p$nope(x)") === None)

    import spark.implicits._
    val t = freshTable("validate")
    t.append(Seq((1L, tsOf(19700L, 0L), "a"))
      .toDF("id", "ts", "source"))
    // good spec sticks
    t.setProperty(PartitionSpec.Prop, "days(ts), bucket(8,id)")
    assert(t.properties(PartitionSpec.Prop) === "days(ts), bucket(8,id)")
    // unknown column / wrong types / malformed syntax refuse loudly
    intercept[IllegalArgumentException] {
      t.setProperty(PartitionSpec.Prop, "days(nope)") }
    intercept[IllegalArgumentException] {
      t.setProperty(PartitionSpec.Prop, "days(id)") } // long is not a time
    intercept[IllegalArgumentException] {
      t.setProperty(PartitionSpec.Prop, "months(ts)") } // ts months are tz-bound
    intercept[IllegalArgumentException] {
      t.setProperty(PartitionSpec.Prop, "bucket(0,id)") }
    intercept[IllegalArgumentException] {
      t.setProperty(PartitionSpec.Prop, "shard(4,id)") }
    intercept[IllegalArgumentException] {
      t.setProperty(PartitionSpec.Prop, "days ts") }
  }

  test("days(ts): appends cluster; a one-day predicate prunes to ~1 file") { withoutCoalesce {
    import spark.implicits._
    val t = freshTable("days")
    t.append(Seq((0L, tsOf(19700L, 0L), 0L)).toDF("id", "ts", "user_id"))
    t.setProperty(PartitionSpec.Prop, "days(ts)")
    month(t)
    val total = t.snapshot().files.size
    // the range exchange spreads the month over the shuffle partitions
    // (4 in this suite) — contiguous day runs per file
    assert(total >= 3, s"expected the range exchange to spread 30 days, got $total files")
    // every staged file carries the derived key
    assert(t.snapshot().files.count(_.stats.contains("__p$days(ts)")) >= total - 1)
    val lo = tsOf(19710L, 0L); val hi = tsOf(19710L, MsPerDay - 1L)
    val n = t.filesForRange("ts", Some(lo), Some(hi))
    assert(n <= 2 && n < total,
      s"one day of 30 should prune to ~1 file, scanned $n of $total")
    // correctness: pruned read == full filter
    assert(t.readRange(spark, "ts", Some(lo), Some(hi)).count() === 100L)
    // multi-day range scans proportionally, still not everything
    val n3 = t.filesForRange("ts", Some(tsOf(19705L, 0L)), Some(tsOf(19707L, MsPerDay - 1L)))
    assert(n3 <= 3 && n3 >= 1)
    assert(t.readRange(spark, "ts",
      Some(tsOf(19705L, 0L)), Some(tsOf(19707L, MsPerDay - 1L))).count() === 300L)
  } }

  test("bucket(8,user_id): point probes prune; ranges admit (sound)") { withoutCoalesce {
    import spark.implicits._
    val t = freshTable("bucket")
    t.append(Seq((0L, 0L)).toDF("id", "user_id"))
    t.setProperty(PartitionSpec.Prop, "bucket(8,user_id)")
    t.append((1L until 801L).map(i => (i, i % 100L)).toDF("id", "user_id"))
    val total = t.snapshot().files.size
    assert(total >= 3, s"expected bucket clustering into several files, got $total")
    // a point probe hits only the probed value's bucket
    (Seq(7L, 42L, 99L)).foreach { u =>
      val n = t.filesForRange("user_id", Some(u), Some(u))
      assert(n <= math.max(2, total / 2), s"user $u: scanned $n of $total")
      assert(t.readRange(spark, "user_id", Some(u), Some(u)).count() === 8L)
    }
    // a genuine RANGE cannot use buckets — everything admits (soundness)
    assert(t.readRange(spark, "user_id", Some(10L), Some(20L)).count() === 88L)
  } }

  test("spec evolution is per-file: old files keep old transforms, no rewrite") { withoutCoalesce {
    import spark.implicits._
    val t = freshTable("evolve")
    t.append(Seq((0L, tsOf(19700L, 0L), 0L)).toDF("id", "ts", "user_id"))
    t.setProperty(PartitionSpec.Prop, "days(ts)")
    month(t)
    val filesA = t.snapshot().files.map(_.path).toSet
    // evolve: ONE metadata commit, zero data rewritten
    t.setProperty(PartitionSpec.Prop, "bucket(8,user_id)")
    assert(t.snapshot().files.map(_.path).toSet === filesA)
    val rows = for (d <- 30L until 40L; i <- 0L until 100L)
      yield (3000L + d * 100L + i, tsOf(19700L + d, 0L), i % 50L)
    t.append(rows.toDF("id", "ts", "user_id"))
    val snap = t.snapshot()
    val (oldF, newF) = snap.files.partition(a => filesA.contains(a.path))
    assert(oldF.forall(a => a.stats.contains("__p$days(ts)") ||
      a.rows <= 1), "old files keep their days() key")
    assert(newF.forall(_.stats.contains("__p$bucket(8,user_id)")),
      "new files carry the new spec's key")
    assert(newF.forall(a => !a.stats.contains("__p$days(ts)")))
    // a day-29 probe prunes WITHIN the old files; new files admit only
    // where their base ts stats exclude them (sound either way)
    val lo = tsOf(19729L, 0L); val hi = tsOf(19729L, MsPerDay - 1L)
    assert(t.readRange(spark, "ts", Some(lo), Some(hi)).count() === 100L)
    assert(t.filesForRange("ts", Some(lo), Some(hi)) < snap.files.size)
    // a user point probe prunes WITHIN the new files, admits old ones
    val nPoint = t.filesForRange("user_id", Some(7L), Some(7L))
    assert(nPoint >= oldF.size, "old files must all admit a bucket probe")
    assert(nPoint < snap.files.size, "some new files must be bucket-pruned")
    assert(t.readRange(spark, "user_id", Some(7L), Some(7L)).count() ===
      (30L * 2L + 10L * 2L))
  } }

  test("rewrites stay sound: unclustered overwrite straddles, compact re-clusters") { withoutCoalesce {
    import spark.implicits._
    val t = freshTable("rewrite")
    t.append(Seq((0L, tsOf(19700L, 0L), 0L)).toDF("id", "ts", "user_id"))
    t.setProperty(PartitionSpec.Prop, "days(ts)")
    val rows = for (d <- 0L until 10L; i <- 0L until 200L)
      yield (d * 200L + i, tsOf(19700L + d, i), i % 50L)
    // overwrite does NOT cluster — files straddle days; pruning must
    // stay conservative-correct (derived ranges widen, rows never lost)
    t.overwrite(rows.toDF("id", "ts", "user_id").repartition(6))
    val lo = tsOf(19703L, 0L); val hi = tsOf(19703L, MsPerDay - 1L)
    assert(t.readRange(spark, "ts", Some(lo), Some(hi)).count() === 200L)
    // compact() under a spec re-clusters by the transform tuple
    t.compact(spark)
    assert(t.readRange(spark, "ts", Some(lo), Some(hi)).count() === 200L)
    val total = t.snapshot().files.size
    val n = t.filesForRange("ts", Some(lo), Some(hi))
    assert(total >= 3 && n <= 2,
      s"compact should restore day clustering: $n of $total files for one day")
  } }

  test("compactSmall merges only within a partition tuple") {
    import spark.implicits._
    val t = freshTable("csmall")
    t.append(Seq((0L, tsOf(19700L, 0L), 0L)).toDF("id", "ts", "user_id"))
    t.setProperty(PartitionSpec.Prop, "days(ts)")
    // 4 small single-day appends per day × 2 days = 8 small files
    for (d <- 0L until 2L; k <- 0 until 4)
      t.append((0L until 50L).map(i => (d * 1000L + k * 100L + i,
        tsOf(19700L + d, i), i)).toDF("id", "ts", "user_id"))
    val before = t.snapshot().files.size
    assert(before >= 8)
    val (merged, after, _) = t.compactSmall(spark, targetFileMB = 128, minFiles = 2)
    assert(merged >= 8)
    // each output file is single-day (the signature is single-valued) —
    // a cross-day merge would be correct but pruning-hostile
    val outs = t.snapshot().files
    assert(outs.forall(a => PartitionSpec.tupleSignature(a)
      .get("__p$days(ts)").forall(_.isDefined)),
      s"compactSmall must not merge across days: ${outs.map(_.stats)}")
    assert(after <= 3)
    val n = t.filesForRange("ts", Some(tsOf(19701L, 0L)), Some(tsOf(19701L, MsPerDay - 1L)))
    assert(n <= 2, s"post-compact day probe scanned $n files")
    assert(t.readRange(spark, "ts",
      Some(tsOf(19701L, 0L)), Some(tsOf(19701L, MsPerDay - 1L))).count() === 200L)
  }

  test("SQL end-to-end: TBLPROPERTIES spec + DSv2 WHERE prunes planned files") { withoutCoalesce {
    import spark.implicits._
    val wh = new java.io.File(
      s"target/tmp/pspec_sql_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath
    val cat = s"ps${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"CREATE TABLE $cat.db.ev (id BIGINT, ts TIMESTAMP)")
      spark.sql(s"ALTER TABLE $cat.db.ev SET TBLPROPERTIES " +
        "('partition.spec' = 'days(ts)')")
      val t = new GraftTable(s"$wh/db/ev")
      val rows = for (d <- 0L until 20L; i <- 0L until 50L)
        yield (d * 50L + i, tsOf(19700L + d, i * 100L))
      t.append(rows.toDF("id", "ts"))
      val total = t.snapshot().files.size
      assert(total >= 3)
      val df = spark.sql(s"SELECT id FROM $cat.db.ev " +
        "WHERE ts >= TIMESTAMP '2023-12-12 00:00:00' " + // day 19703 (UTC tests)
        "AND ts < TIMESTAMP '2023-12-13 00:00:00'")
      val planned = graft.plans.AdaptivePlans.collectDeep(df) {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.head.scan.asInstanceOf[graft.streaming.GraftScan].currentFiles().length
      assert(planned <= 2 && planned < total,
        s"DSv2 day predicate should partition-prune: planned $planned of $total")
      assert(df.count() === 50L)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  } }

  test("zorder is partition-major: the tuple leads, the z-curve orders within") { withoutCoalesce {
    import spark.implicits._
    val t = freshTable("zorder")
    t.append(Seq((0L, tsOf(19700L, 0L), 0L)).toDF("id", "ts", "user_id"))
    t.setProperty(PartitionSpec.Prop, "days(ts)")
    val rows = for (d <- 0L until 6L; i <- 0L until 300L)
      yield (d * 300L + i, tsOf(19700L + d, i), i % 97L)
    t.overwrite(rows.toDF("id", "ts", "user_id").repartition(6)) // straddled
    t.optimizeZorder(spark, Seq("user_id"), targetFiles = 12)
    val total = t.snapshot().files.size
    assert(total >= 6)
    // the day tuple survived the z-order rewrite...
    val lo = tsOf(19702L, 0L); val hi = tsOf(19702L, MsPerDay - 1L)
    val nDay = t.filesForRange("ts", Some(lo), Some(hi))
    assert(nDay * 2 <= total,
      s"zorder must keep day clustering: $nDay of $total files for one day")
    assert(t.readRange(spark, "ts", Some(lo), Some(hi)).count() === 300L)
    // ...and the z-curve still clusters user_id within partitions: a
    // narrow user range must not scan every file
    val nUser = t.filesForRange("user_id", Some(10L), Some(15L))
    assert(nUser < total, s"z-within should prune a user range: $nUser of $total")
    // i % 97 over 0..299 hits each residue in 10..15 exactly 3 times
    // (i, i+97, i+194): 6 users × 3 × 6 days = 108; the overwrite
    // replaced the seed row
    assert(t.readRange(spark, "user_id", Some(10L), Some(15L)).count() === 108L)
  } }

  test("streaming toTable clusters epochs by the spec (native write distribution)") { withoutCoalesce {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val wh = new java.io.File(
      s"target/tmp/pspec_stream_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath
    val ckpt = s"$wh/_ckpt"
    val cat = s"pw${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.streaming.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"CREATE TABLE $cat.db.ev (id BIGINT, ts TIMESTAMP)")
      spark.sql(s"ALTER TABLE $cat.db.ev SET TBLPROPERTIES " +
        "('partition.spec' = 'days(ts)')")
      val mem = MemoryStream[(Long, Long)]
      // 8 days × 100 events, deliberately interleaved (worst case for
      // an undistributed write: every task would straddle every day)
      mem.addData((0L until 800L).map(i => (i, (i % 8) * MsPerDay + i)): _*)
      val q = mem.toDF().toDF("id", "ms")
        .select(col("id"), timestamp_millis(col("ms") + 19700L * MsPerDay).as("ts"))
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.db.ev")
      q.awaitTermination()
      val t = new GraftTable(s"$wh/db/ev")
      assert(t.read(spark).count() === 800L)
      val total = t.snapshot().files.size
      assert(total >= 2, s"expected the required distribution to spread epochs, got $total")
      // RequiresDistributionAndOrdering range-distributed the epoch by
      // ts, so a one-day probe prunes (files cover contiguous day runs)
      val lo = tsOf(19703L, 0L); val hi = tsOf(19703L, MsPerDay - 1L)
      val n = t.filesForRange("ts", Some(lo), Some(hi))
      assert(n * 2 <= total,
        s"a 1-of-8-day probe should prune a clustered epoch: $n of $total")
      assert(t.readRange(spark, "ts", Some(lo), Some(hi)).count() === 100L)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  } }

  test("soundness fuzz: pruned reads equal unpruned filters under a composite spec") { withoutCoalesce {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // seeded: green forever or never
    val t = freshTable("fuzz")
    t.append(Seq((0L, tsOf(19700L, 0L), "seed")).toDF("id", "ts", "s"))
    t.setProperty(PartitionSpec.Prop, "days(ts), bucket(7,id), trunc(3,s)")
    def batch(n: Int) = (0 until n).map { _ =>
      (rnd.nextLong() % 100000L,
        tsOf(19700L + rnd.nextInt(60), rnd.nextInt(86400000)),
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
    }.toDF("id", "ts", "s")
    (0 until 3).foreach(_ => t.append(batch(400)))
    t.overwrite(t.read(spark).unionAll(batch(400)).repartition(5)) // straddle
    t.append(batch(300))
    t.compactSmall(spark, targetFileMB = 128, minFiles = 2)
    val full = t.read(spark).cache()
    def oracle(c: String, lo: Option[Any], hi: Option[Any]): Long = {
      val cc = col(c)
      full.filter((lo, hi) match {
        case (Some(l), Some(u)) => cc >= lit(l) && cc <= lit(u)
        case (Some(l), None) => cc >= lit(l)
        case (None, Some(u)) => cc <= lit(u)
        case (None, None) => lit(true)
      }).count()
    }
    val probes: Seq[(String, Option[Any], Option[Any])] =
      (0 until 25).map { _ =>
        val v = rnd.nextLong() % 100000L
        ("id", Some(v): Option[Any], Some(v): Option[Any]) // bucket points
      } ++ (0 until 15).map { _ =>
        val a = tsOf(19700L + rnd.nextInt(60), rnd.nextInt(86400000))
        val b = tsOf(19700L + rnd.nextInt(60), rnd.nextInt(86400000))
        val (lo, hi) = if (a.before(b)) (a, b) else (b, a)
        ("ts", Some(lo): Option[Any], Some(hi): Option[Any])
      } ++ (0 until 10).map { _ =>
        val p = rnd.alphanumeric.take(2).mkString
        ("s", Some(p): Option[Any], Some(p + "zzzz"): Option[Any])
      } ++ Seq(
        ("ts", None, Some(tsOf(19710L, 0L)): Option[Any]),
        ("id", Some(-50000L): Option[Any], None),
        ("s", None, None))
    probes.foreach { case (c, lo, hi) =>
      val pruned = t.readRange(spark, c, lo, hi).count()
      val want = oracle(c, lo, hi)
      assert(pruned === want, s"probe $c [$lo, $hi]: pruned=$pruned full=$want")
    }
    full.unpersist()
    ()
  } }

  test("dropColumn refuses a partition source; rename keeps pruning") { withoutCoalesce {
    import spark.implicits._
    val t = freshTable("alter")
    t.append(Seq((0L, tsOf(19700L, 0L), "x")).toDF("id", "ts", "note"))
    t.setProperty(PartitionSpec.Prop, "days(ts)")
    val err = intercept[IllegalArgumentException] { t.dropColumn("ts") }
    assert(err.getMessage.contains("partition.spec"))
    t.dropColumn("note") // non-source columns still droppable
    // rename the SOURCE: the spec's lenient (bloom-style) resolution
    // binds the stale logical name to the unchanged physical column
    t.renameColumn("ts", "etime")
    val rows = for (d <- 0L until 10L; i <- 0L until 100L)
      yield (d * 100L + i, tsOf(19700L + d, i))
    t.append(rows.toDF("id", "etime"))
    val total = t.snapshot().files.size
    val lo = tsOf(19704L, 0L); val hi = tsOf(19704L, MsPerDay - 1L)
    val n = t.filesForRange("etime", Some(lo), Some(hi))
    assert(n <= 2 && total >= 4,
      s"post-rename day probe should still prune: $n of $total")
    assert(t.readRange(spark, "etime", Some(lo), Some(hi)).count() === 100L)
  } }

  test("supplementary characters: trunc probes and string bounds stay sound") { withoutCoalesce {
    import spark.implicits._
    // U+1F600 (😀) is a surrogate pair: UTF-16 code-unit order puts it
    // BELOW U+FFFD, UTF-8/code-point order (what Spark's min/max used)
    // puts it ABOVE. A probe truncated by UTF-16 units, or bounds
    // compared with String.compareTo, silently drops matching files.
    val smile = new String(Character.toChars(0x1F600))
    val t = freshTable("supp")
    t.append(Seq((1L, smile + "alpha")).toDF("id", "s"))
    t.setProperty(PartitionSpec.Prop, "trunc(1,s)")
    t.append(Seq((2L, smile + "beta"), (3L, smile + "gamma")).toDF("id", "s")
      .coalesce(1))
    t.append(Seq((4L, "�delta"), (5L, "ascii")).toDF("id", "s").coalesce(1))
    val full = t.read(spark)
    def check(lo: Option[Any], hi: Option[Any]): Unit = {
      val want = full.filter((lo, hi) match {
        case (Some(l), Some(u)) => col("s") >= lit(l) && col("s") <= lit(u)
        case (Some(l), None) => col("s") >= lit(l)
        case (None, Some(u)) => col("s") <= lit(u)
        case _ => lit(true)
      }).count()
      val got = t.readRange(spark, "s", lo, hi).count()
      assert(got === want, s"probe [$lo, $hi]: pruned=$got full=$want")
    }
    check(Some(smile + "beta"), Some(smile + "beta")) // point on a pair
    check(Some("�"), None) // everything at/above U+FFFD includes 😀*
    check(Some(smile), Some(smile + "zzz"))
    check(None, Some("�")) // ascii + the U+FFFD row only
  } }
}
