package graft

import graft.medallion.{GraftTable, TxLog}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-only TYPE WIDENING (`type.widening = true` +
  * [[GraftTable.widenColumn]] — Delta 3.2's typeWidening shape):
  * int-family/float/decimal columns widen with zero data IO, old files
  * up-cast at scan time, stats re-typed (never re-derived), pruning
  * stays sound, narrowing still refuses. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): GraftTable = {
    val dir = new java.io.File(
      s"target/tmp/widen_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    new GraftTable(dir.getAbsolutePath)
  }

  test("int -> long: metadata-only commit, mixed files read, pruning intact") {
    val t = freshTable("i2l")
    t.append((0 until 100).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1))
    t.append((100 until 200).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1))
    // opt-in gate
    intercept[IllegalArgumentException] { t.widenColumn("id", LongType) }
    t.setProperty(TxLog.TypeWideningProp, "true")
    val dataBefore = t.snapshot().files.map(_.path).toSet
    val v = t.widenColumn("id", LongType)
    assert(t.history().head._2 === "widen")
    // zero data IO: the same physical files serve the widened schema
    assert(t.snapshot().files.map(_.path).toSet === dataBefore)
    assert(t.snapshot().schema("id").dataType === LongType)
    // pre-widen files read through the widened schema (parquet INT32
    // bytes promote at scan time), on BOTH read paths
    assert(t.read(spark).schema("id").dataType === LongType)
    assert(t.read(spark).agg(sum("id")).head().getLong(0) === (0L until 200L).sum)
    val dsv2 = spark.read.format("graft-table").load(t.tablePath)
    assert(dsv2.schema("id").dataType === LongType)
    assert(dsv2.selectExpr("sum(id)").head().getLong(0) === (0L until 200L).sum)
    // a post-widen append writes genuine longs; the mixed scan is exact
    t.append(Seq((5000000000L, "big")).toDF("id", "s"))
    assert(t.read(spark).filter(col("id") > Int.MaxValue.toLong).count() === 1L)
    // stats stayed exact (integral strings are domain-invariant):
    // a range probe over old files prunes exactly as before
    assert(t.readRange(spark, "id", Some(150L), Some(160L)).count() === 11L)
    assert(t.filesForRange("id", Some(150L), Some(160L)) === 1)
    // time travel before the widen still reads the THEN-current schema
    assert(t.read(spark, version = v - 1).schema("id").dataType === IntegerType)
  }

  test("float -> double: bounds re-typed to the exact widened value") {
    val t = freshTable("f2d")
    val vals = Seq(0.1f, 0.25f, 17.3f)
    t.append(vals.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      .toDF("id", "x").coalesce(1))
    t.append(Seq((100L, 900.5f)).toDF("id", "x").coalesce(1))
    t.setProperty(TxLog.TypeWideningProp, "true")
    t.widenColumn("x", DoubleType)
    assert(t.read(spark).schema("x").dataType === DoubleType)
    // values read back as exactly f.toDouble
    val read = t.read(spark).filter(col("id") < 100L)
      .select("x").collect().map(_.getDouble(0)).toSet
    assert(read === vals.map(_.toDouble).toSet)
    // stats re-typed: probing with the exact widened double finds the
    // row AND still prunes the out-of-range file
    val probe = 0.1f.toDouble
    assert(t.readRange(spark, "x", Some(probe), Some(probe)).count() === 1L)
    assert(t.filesForRange("x", Some(probe), Some(probe)) === 1,
      "the 900.5 file must prune on the re-typed bounds")
    // soundness sweep: pruned reads equal unpruned filters
    val full = t.read(spark)
    (vals.map(_.toDouble) ++ Seq(900.5f.toDouble, 0.2, 1000.0)).foreach { p =>
      assert(t.readRange(spark, "x", Some(p), Some(p)).count() ===
        full.filter(col("x") === lit(p)).count(), s"probe $p")
    }
  }

  test("decimal precision widening; narrowing and unsupported retypes refuse") {
    val t = freshTable("dec")
    t.append(Seq((1L, BigDecimal("12.34")), (2L, BigDecimal("99.99")))
      .toDF("id", "d")
      .select(col("id"), col("d").cast(DecimalType(8, 2)).as("d")))
    t.setProperty(TxLog.TypeWideningProp, "true")
    t.widenColumn("d", DecimalType(12, 2))
    assert(t.read(spark).schema("d").dataType === DecimalType(12, 2))
    assert(t.read(spark).agg(sum("d")).head().getDecimal(0).toPlainString
      === "112.33")
    // refusals: narrowing, scale change, cross-family, unknown, long->int
    intercept[IllegalArgumentException] { t.widenColumn("d", DecimalType(8, 2)) }
    intercept[IllegalArgumentException] { t.widenColumn("d", DecimalType(14, 4)) }
    intercept[IllegalArgumentException] { t.widenColumn("id", IntegerType) }
    intercept[IllegalArgumentException] { t.widenColumn("id", StringType) }
    intercept[IllegalArgumentException] { t.widenColumn("nope", LongType) }
  }

  test("bloom bitsets and HLL sketches drop on widen (stale hashes must not prune)") {
    val t = freshTable("hash")
    t.append((0 until 500).map(i => (i, i.toLong * 2)).toDF("k", "v").coalesce(1))
    t.setProperty(TxLog.BloomColumnsProp, "k")
    t.setProperty(TxLog.NdvColumnsProp, "k")
    t.overwrite(t.read(spark)) // rewrite so files carry bloom + hll on k
    assert(t.snapshot().files.forall(a =>
      a.stats.get("k").exists(cs => cs.bloom.isDefined && cs.hll.isDefined)))
    t.setProperty(TxLog.TypeWideningProp, "true")
    t.widenColumn("k", LongType)
    // the write-side hashes bound INT bytes; post-widen probes hash
    // longs — the stale artifacts must be gone, min/max kept
    t.snapshot().files.foreach { a =>
      val cs = a.stats("k")
      assert(cs.bloom.isEmpty && cs.hll.isEmpty)
      assert(cs.min === "0" && cs.max === "499")
    }
    // point lookups still exact (min/max pruning only)
    assert(t.readRange(spark, "k", Some(250L), Some(250L)).count() === 1L)
    assert(t.approxCountDistinct("k") === None,
      "partial sketch coverage must refuse, not under-count")
  }

  test("SQL surface: ALTER COLUMN TYPE widens through the catalog") {
    val wh = new java.io.File(
      s"target/tmp/widensql_${java.util.UUID.randomUUID().toString.take(8)}")
      .getAbsolutePath
    spark.conf.set("spark.sql.catalog.gwide",
      classOf[graft.streaming.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwide.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gwide.db.t (id INT, s STRING)")
      val t = new GraftTable(s"$wh/db/t")
      t.append(Seq((7, "x")).toDF("id", "s"))
      spark.sql(s"ALTER TABLE gwide.db.t SET TBLPROPERTIES " +
        s"('${TxLog.TypeWideningProp}' = 'true')")
      spark.sql("ALTER TABLE gwide.db.t ALTER COLUMN id TYPE BIGINT")
      assert(spark.sql("SELECT id FROM gwide.db.t").schema("id").dataType
        === LongType)
      assert(spark.sql("SELECT sum(id) FROM gwide.db.t").head().getLong(0) === 7L)
      spark.sql("INSERT INTO gwide.db.t VALUES (8000000000, 'y')")
      assert(spark.sql("SELECT count(*) FROM gwide.db.t WHERE id > 7")
        .head().getLong(0) === 1L)
    } finally {
      spark.conf.unset("spark.sql.catalog.gwide")
      spark.conf.unset("spark.sql.catalog.gwide.warehouse")
    }
  }

  test("upcast-on-write: an integral-narrow batch commits against the widened schema") {
    val t = freshTable("upcast")
    t.append((0 until 50).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1))
    t.setProperty(TxLog.BloomColumnsProp, "id")
    t.setProperty(TxLog.TypeWideningProp, "true")
    t.widenColumn("id", LongType)
    // the upstream producer still writes INT batches — both the strict
    // and the mergeSchema path accept them under the table's schema
    t.append((50 until 80).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1))
    t.append((80 until 90).map(i => (i, s"v$i")).toDF("id", "s"),
      mergeSchema = true, 20)
    assert(t.read(spark).schema("id").dataType === LongType)
    assert(t.read(spark).agg(sum("id")).head().getLong(0) === (0L until 90L).sum)
    // genuine longs interleave with the narrow files in one scan
    t.append(Seq((7000000000L, "big")).toDF("id", "s"))
    assert(t.read(spark).filter(col("id") === 7000000000L).count() === 1L)
    // the narrow batches' bloom bitsets were hashed over INT bytes —
    // they must have been dropped (a stale bitset would mis-prune
    // probes that hash the table's LONG representation); min/max stay
    val narrow = t.snapshot().files.filter(a =>
      a.stats.get("id").exists(cs => cs.min == "50" || cs.min == "80"))
    assert(narrow.nonEmpty && narrow.forall(_.stats("id").bloom.isEmpty),
      s"narrow-staged bloom must drop: ${narrow.map(_.stats("id"))}")
    assert(t.readRange(spark, "id", Some(55L), Some(60L)).count() === 6L)
    // a float batch on a double column still refuses (float stats
    // strings understate the double domain)
    val t2 = freshTable("upcast_f")
    t2.append(Seq((1L, 2.5)).toDF("id", "x"))
    intercept[IllegalArgumentException] {
      t2.append(Seq((2L, 1.5f)).toDF("id", "x")) }
  }

  test("identity/generated pins and partition-bucket stats interplay") {
    val t = freshTable("pins")
    t.append(Seq((1L, 5, "a")).toDF("id", "n", "s"))
    t.setProperty(TxLog.TypeWideningProp, "true")
    t.setProperty("generated.s", "concat('n', n)")
    intercept[IllegalArgumentException] { t.widenColumn("n", LongType) }
    t.unsetProperty("generated.s")
    // a bucket transform sourced from the widened column: its per-file
    // transform stats are int-hash keyed — they must drop (pruning
    // admits, never lies)
    t.setProperty(graft.medallion.PartitionSpec.Prop, "bucket(4,n)")
    t.append(Seq((2L, 6, "b"), (3L, 7, "c")).toDF("id", "n", "s").coalesce(1))
    assert(t.snapshot().files.exists(_.stats.keys.exists(
      _.startsWith(graft.medallion.PartitionSpec.Prefix))))
    t.widenColumn("n", LongType)
    assert(t.snapshot().files.forall(a => !a.stats.keys.exists(
      _.startsWith(graft.medallion.PartitionSpec.Prefix))),
      "stale bucket-transform stats must drop on widen")
    assert(t.readRange(spark, "n", Some(6L), Some(6L)).count() === 1L)
    assert(t.read(spark).count() === 3L)
  }
}
