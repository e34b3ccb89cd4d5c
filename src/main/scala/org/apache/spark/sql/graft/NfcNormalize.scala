// Lives in the org.apache.spark.sql package tree because the
// ExpectsInputTypes contract references private[sql] AbstractDataType —
// the standard placement for third-party native expressions.
package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * codegen'd expression — `nfc_normalize(text)` in SQL.
  *
  * Why it exists: dedup keys computed over raw crawl text split when the
  * same visible string arrives in different byte encodings ("café" as
  * U+00E9 vs "cafe" + combining U+0301 hash apart), so a curation
  * pipeline must canonicalize BEFORE any hash/groupBy dedup stage
  * (reference: sakila-data-lake normalizes via MySQL's utf8mb4 collation
  * on ingest; here it is an explicit, composable operator).
  *
  * 100 TB shape: per-row scalar inside whole-stage codegen — no UDF
  * serialization, no shuffle. The dominant cost on real corpora is
  * avoided entirely by a two-tier fast path:
  *   1. `isFullAscii()` — one vectorized byte scan over the raw
  *      UTF8String; ASCII is closed under NFC, so the input pointer is
  *      returned with ZERO allocation. Web-scale English corpora are
  *      overwhelmingly ASCII, making this the common case.
  *   2. `Normalizer.isNormalized` — for non-ASCII input that is already
  *      composed (most real UTF-8), verifies without building a new
  *      string; only genuinely decomposed text pays the full
  *      normalize-and-copy.
  *
  * Semantics match DuckDB's `nfc_normalize` (both implement UAX #15 NFC;
  * the composition tables for BMP text have been stable since Unicode
  * 3.1, so JDK-vs-DuckDB Unicode-version skew is not observable on real
  * text). NULL in → NULL out.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared by interpreted eval and generated code (the JIT inlines the
    * static call; keeping one body guarantees the two paths agree). */
  def normalize(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s // ASCII is closed under NFC: zero-copy
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
