package graft

import java.text.Normalizer

import graft.engine.GraftFunctions
import org.apache.spark.sql.functions._

/** The native codegen'd nfc_normalize must agree with JDK
  * `java.text.Normalizer` (the reference implementation of UAX #15 this
  * expression wraps) and honor its documented fast paths — ASCII and
  * already-composed inputs pass through unchanged.
  *
  * All non-ASCII test strings are built from explicit \ u escapes:
  * writing a combining mark as a raw source character invites an editor
  * or transfer step to silently normalize it, which would turn a real
  * assertion into a tautology.
  */
class NfcNormalizeSpec extends SparkSpec {

  private val Acute = "\u0301" // combining acute accent
  private val Diaer = "\u0308" // combining diaeresis
  private val EAcute = "\u00e9" // precomposed é
  private val ODiaer = "\u00f6" // precomposed ö

  private def norm(values: Seq[String]) = {
    import spark.implicits._
    GraftFunctions.register(spark)
    values.toDF("s")
      .select(call_function("nfc_normalize", col("s")).as("n"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
  }

  test("decomposed sequences compose: e+U+0301 -> U+00E9, o+U+0308 -> U+00F6") {
    val out = norm(Seq(s"cafe$Acute", s"schlo${Diaer}n", s"e${Acute}o$Diaer"))
    assert(out(0) === s"caf$EAcute")
    assert(out(1) === s"schl${ODiaer}n")
    assert(out(2) === s"$EAcute$ODiaer")
    assert(out(0) === Normalizer.normalize(s"cafe$Acute", Normalizer.Form.NFC))
  }

  test("ASCII and already-composed inputs are identity; NULL propagates") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = Seq(Some("plain ascii text"), Some(s"d${EAcute}j\u00e0 vu"),
      Some(""), None)
      .toDF("s")
      .select(call_function("nfc_normalize", col("s")).as("n"))
      .collect()
    assert(out(0).getString(0) === "plain ascii text")
    assert(out(1).getString(0) === s"d${EAcute}j\u00e0 vu")
    assert(out(2).getString(0) === "")
    assert(out(3).isNullAt(0))
  }

  test("normalization unifies dedup keys that raw bytes split") {
    // the motivating use: the same visible string in two encodings must
    // land in ONE dedup group after normalization
    import spark.implicits._
    GraftFunctions.register(spark)
    val decomposed = s"re${Acute}sume$Acute"
    val precomposed = s"r${EAcute}sum$EAcute"
    val groups = Seq(decomposed, precomposed)
      .toDF("s")
      .groupBy(call_function("nfc_normalize", col("s")).as("k"))
      .count()
      .collect()
    assert(groups.length === 1)
    assert(groups(0).getLong(1) === 2L)
  }

  test("interpreted eval agrees with the codegen path") {
    val s = s"a${Acute}b$Diaer mixed ascii y$Acute"
    val viaEval = org.apache.spark.sql.graft.NfcNormalize
      .normalize(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      .toString
    assert(norm(Seq(s)).head === viaEval)
    assert(viaEval === Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
