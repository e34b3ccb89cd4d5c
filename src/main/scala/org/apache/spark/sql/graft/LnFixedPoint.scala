// Lives in the org.apache.spark.sql package tree because the
// ExpectsInputTypes contract references private[sql] AbstractDataType —
// the standard placement for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Fixed-point natural log of a positive integer, scaled by 10^15 — a
  * PINNED integer algorithm computable identically in any engine with
  * 128-bit integer arithmetic, which is what makes log-domain scores
  * (bigram-LM perplexity, DSIR importance weights) HASH-comparable
  * across Spark and DuckDB: `java.lang.Math.log` is last-ulp
  * engine-dependent, so a double log can never be an oracle column,
  * but this function's output is the same int64 everywhere by
  * construction.
  *
  * Algorithm (every step integer, every division floor-on-nonnegative,
  * mirrored verbatim by the DuckDB oracle SQL in HUGEINT):
  * {{{
  *   S  = 10^15                       (the fixed-point scale)
  *   e  = floor(log2 n)               (bit length - 1)
  *   m  = (n * S) >> e                (mantissa in [S, 2S))
  *   z  = ((m - S) * S) / (m + S)     (atanh argument in [0, S/3])
  *   ln m = 2 * sum_{k=0..15} p_{2k+1} / (2k+1),  p_{j+2} = p_j * z^2 / S
  *   ln n = e * LN2 + ln m            (LN2 = 693147180559945)
  * }}}
  * 16 series terms: z <= 1/3, so the first dropped term p_33/33 is
  * below (1/3)^33 * S < 1 — i.e. the series is exact at this scale.
  * Accuracy ~1e-14 relative (a few last-digit ulps from the floor
  * divisions); determinism, not accuracy, is the contract.
  *
  * Domain: n >= 1 (counts + smoothing are always positive); n <= ~2^63
  * is safe because intermediates are 128-bit (n*S < 2^63 * 10^15 <
  * 2^113). n < 1 or a NULL input yields NULL — never an exception (the
  * left-join-miss convention callers coalesce around).
  */
object LnFixedPoint {
  val Scale: Long = 1000000000000000L // 10^15
  val Ln2: Long = 693147180559945L // floor(ln 2 * 10^15)

  /** The pinned computation — static so generated code can call it. */
  def lnFp(n: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val s = BigInt(Scale)
    val m = (BigInt(n) * s) >> e
    val z = ((m - s) * s) / (m + s)
    val z2 = (z * z) / s
    var p = z
    var acc = z // p1 / 1
    var k = 3
    while (k <= 31) {
      p = (p * z2) / s
      acc += p / k
      k += 2
    }
    (BigInt(e) * Ln2 + 2 * acc).toLong
  }
}

/** `ln_fp(n)` — [[LnFixedPoint.lnFp]] as a native codegen'd expression:
  * long → long, NULL on n < 1. Evaluated O(model-vocabulary) times per
  * query (callers apply it to the count TABLES, not the token stream),
  * so the small-BigInt body is never a hot path. */
case class LnFp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "ln_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val n = input.asInstanceOf[Long]
    if (n < 1L) null else LnFixedPoint.lnFp(n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, n =>
      s"""
         |if ($n < 1L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.graft.LnFixedPoint.lnFp($n);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): LnFp =
    copy(child = newChild)
}
