package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Canonical value dump next to each parquet result: columns sorted by
    * name with explicit dtypes on a header line, rows sorted by every
    * column, values rendered with no float formatting ambiguity. Exists
    * so a hash-mismatch in any external compare (which canonicalizes
    * values its own way — q103 went red for two rounds on a DuckDB
    * HUGEINT→float64 widening no row-count check could see) is
    * value-diffable post-hoc from the committed artifact alone. Reads
    * back the just-written parquet, so the dump reflects exactly the
    * bytes the compare sees, not a recompute. */
  private def dumpCanonical(spark: SparkSession, name: String,
                            outDir: String): Unit =
    try {
      val df = spark.read.parquet(s"$outDir/$name")
      val cols = df.columns.sorted
      val sortable = df.schema.fields.forall { f =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType) }
      val sel = df.selectExpr(cols.map(c => s"`$c`"): _*)
      val ordered =
        if (sortable) sel.orderBy(cols.map(org.apache.spark.sql.functions.col): _*)
        else sel
      def fmt(v: Any): String = v match {
        case null => "NULL"
        case d: Double => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
          d.toLong.toString + ".0" else d.toString
        case f: Float => fmt(f.toDouble)
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case s: collection.Seq[_] => s.map(fmt).mkString("[", ",", "]")
        case r: org.apache.spark.sql.Row =>
          r.toSeq.map(fmt).mkString("{", ",", "}")
        case m: collection.Map[_, _] =>
          m.toSeq.map { case (k, v) => s"${fmt(k)}:${fmt(v)}" }
            .sorted.mkString("{", ",", "}")
        case x => x.toString
      }
      val header = df.schema.fields.sortBy(_.name)
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      val sb = new StringBuilder(s"# $header\n")
      val it = ordered.toLocalIterator()
      var n = 0
      while (it.hasNext && n < 2000000) {
        sb.append(it.next().toSeq.map(fmt).mkString(",")).append('\n')
        n += 1
      }
      Files.writeString(Paths.get(s"$outDir/$name.canonical.csv"),
        sb.toString)
    } catch { case e: Throwable =>
      System.err.println(s"[verify] canonical dump $name skipped: " +
        e.getMessage)
    }

  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), only) = args.splitAt(2)
    val spark = graft.core.SparkSessionFactory.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    // optional 3rd+ args: run only queries whose name starts with one of
    // them (targeted re-verification; the driver passes exactly two args)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.isEmpty || only.exists(n.startsWith) }
    // queries are independent — run 4 at a time as concurrent Spark jobs
    // (FIFO scheduler interleaves stages; per-query failure isolated)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      scala.concurrent.Future {
        // per-query cache scope: this query's registered caches release
        // right after ITS dump, without evicting concurrent queries'
        graft.core.CacheScope.scoped {
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            dumpCanonical(spark, name, outDir)
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // all dumps are on disk — release the caches queries registered
    graft.core.CacheScope.releaseAll()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
