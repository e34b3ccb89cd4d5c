package graft

import java.nio.file.{Files, Paths}

import graft.medallion.{GraftTable, TxLog}

/** Zero-copy snapshot CLONE: content fidelity, metadata carry-over
  * (schema, stats, constraints), and full independence of the two
  * tables afterwards.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String = {
    val dir = new java.io.File(s"target/tmp/clone_$tag")
    graft.core.Fs.rmTree(dir)
    dir.getAbsolutePath
  }

  private def df(rows: (Long, String)*) = rows.toDF("id", "name")

  test("clone carries rows, schema, stats-based skipping, and constraints") {
    val src = new GraftTable(fresh("src"))
    src.append(df(1L -> "a", 2L -> "b"))
    src.append(df(10L -> "x"))
    src.addConstraint(spark, "id_pos", "id > 0")
    val clone = src.cloneTo(fresh("dst"))
    assert(clone.latestVersion() == 1L, "clone history starts at its creation")
    assert(clone.read(spark).as[(Long, String)].collect().toSet ==
      src.read(spark).as[(Long, String)].collect().toSet)
    // per-file stats carried: a point read prunes in the clone too
    assert(clone.filesForRange("id", Some(10L), Some(10L)) == 1)
    // constraints carried: the clone enforces
    intercept[IllegalStateException](clone.append(df(-1L -> "bad")))
  }

  test("clone at an old version is a time-travel fork") {
    val src = new GraftTable(fresh("ttsrc"))
    src.append(df(1L -> "a"))                       // v1
    src.append(df(2L -> "b"))                       // v2
    val clone = src.cloneTo(fresh("ttdst"), version = 1L)
    assert(clone.read(spark).as[(Long, String)].collect().toSet == Set(1L -> "a"))
  }

  test("clone and source are fully independent afterwards") {
    val src = new GraftTable(fresh("indsrc"))
    src.append(df(1L -> "a"))
    val clone = src.cloneTo(fresh("inddst"))
    // diverge both sides
    src.append(df(2L -> "src-only"))
    clone.append(df(3L -> "clone-only"))
    assert(src.read(spark).count() == 2L && clone.read(spark).count() == 2L)
    // rewrite + vacuum the SOURCE: its original file names disappear,
    // but the clone's hard links keep the bytes alive under its own root
    src.overwrite(df(9L -> "rewritten"))
    src.checkpoint()
    src.vacuum(retainVersions = 0)
    assert(clone.read(spark).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 3L -> "clone-only"),
      "vacuuming the source must never corrupt the clone")
    // and the reverse: dropping the clone entirely leaves the source intact
    graft.core.Fs.rmTree(new java.io.File(clone.tablePath))
    assert(src.read(spark).as[(Long, String)].collect().toSet ==
      Set(9L -> "rewritten"))
  }

  test("clone refuses an existing table and a vacuumed source version") {
    val src = new GraftTable(fresh("refsrc"))
    src.append(df(1L -> "a"))                       // v1
    val dst = fresh("refdst")
    src.cloneTo(dst)
    intercept[IllegalArgumentException](src.cloneTo(dst)) // already a table
    src.overwrite(df(2L -> "b"))                    // v2: v1's file now historical
    src.checkpoint()
    src.vacuum(retainVersions = 0)
    val e = intercept[IllegalArgumentException](
      src.cloneTo(fresh("refdst2"), version = 1L))
    assert(e.getMessage.contains("vacuum"))
  }

  test("tailing a fresh clone from 0 sees its v1 as an append") {
    val src = new GraftTable(fresh("tailsrc"))
    src.append(df(1L -> "a"))
    val clone = src.cloneTo(fresh("taildst"))
    val tail = clone.appendsSince(spark, 0L)
    assert(tail.count() == 1L)
    assert(tail.select("_commit_version").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("clone does not inherit the txn ledger (a fork must not no-op replays)") {
    val src = new GraftTable(fresh("txnsrc"))
    src.appendIdempotent(df(1L -> "a"), appId = "app", batchId = 7L)
    val clone = src.cloneTo(fresh("txndst"))
    // the same (app, batch) against the CLONE is new work, not a replay
    clone.appendIdempotent(df(2L -> "b"), appId = "app", batchId = 7L)
    assert(clone.read(spark).count() == 2L)
    assert(src.read(spark).count() == 1L)
  }
}
