// Lives in the org.apache.spark.sql package tree because the
// ExpectsInputTypes contract references private[sql] AbstractDataType —
// the standard placement for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Fixed-point exponential — the inverse of [[LnFixedPoint]], closing
  * the pinned-integer math family: `exp_fp(x)` of a 10^15-scaled
  * fixed-point argument returns `floor(e^(x/S) · S)` computed by a
  * PINNED integer algorithm any engine with 128-bit arithmetic replays
  * bit-for-bit. What [[LnFixedPoint]] did for log-domain scores
  * (bigram-LM NLL, DSIR log-LLR) this does for their exp-domain
  * consumers: PERPLEXITY (exp of mean NLL) and the paper-faithful DSIR
  * resampling acceptance `min(1, exp(logScore))` become int64 oracle
  * columns instead of engine-dependent `Math.exp` doubles.
  *
  * Algorithm (every step integer; mirrored verbatim by the DuckDB
  * oracle SQL in HUGEINT — note DuckDB `//`/`%` truncate toward zero,
  * so the range reduction uses the mod-normalized floor form):
  * {{{
  *   S  = 10^15, LN2 = 693147180559945
  *   r  = ((x mod LN2) + LN2) mod LN2          (in [0, LN2))
  *   q  = (x - r) / LN2                         (exact division)
  *   e^r: t_0 = S; t_k = t_{k-1} * r / (S * k); sum t_0..t_21
  *   exp x = sum << q   (q >= 0)  |  sum >> -q  (q < 0; 0 when q < -63)
  * }}}
  * 22 Taylor terms: r/S < ln 2, so t_21 < S·0.694^21/21! < 10^-8 — the
  * truncation is far below the floor-division noise. Each of the ~21
  * floor divisions loses < 1 ulp and a positive q amplifies by 2^q
  * (≤ 2^13 in-domain), so accuracy is ~2·10^-10 relative worst case;
  * determinism, not accuracy, is the contract (same as ln_fp).
  *
  * Domain: x ≤ MaxArg (= 9.129·S, where e^(x/S)·S reaches 2^63) —
  * larger x or NULL yields NULL, never an exception; callers wanting
  * `min(1, exp x)` gate on `x >= 0` first and never hit the bound.
  * Arbitrarily negative x floors to 0 (q < -63 short-circuits: the sum
  * is < 2^52, so the shift provably underflows to 0 — the same guard
  * the SQL mirror uses, keeping the two engines' shift domains equal).
  */
object ExpFixedPoint {
  val Scale: Long = 1000000000000000L // 10^15
  val Ln2: Long = 693147180559945L // floor(ln 2 * 10^15)
  /** Largest x with e^(x/S)·S < 2^63: floor(ln((2^63-1)/S)·S) rounded
    * down to a safe round constant. */
  val MaxArg: Long = 9129000000000000L

  /** The pinned computation — static so generated code can call it. */
  def expFp(x: Long): Long = {
    val r = ((x % Ln2) + Ln2) % Ln2
    val q = (x - r) / Ln2
    if (q < -63L) return 0L
    val s = BigInt(Scale)
    val rB = BigInt(r)
    var term = s
    var acc = s
    var k = 1
    while (k <= 21) {
      term = (term * rB) / (s * k)
      acc += term
      k += 1
    }
    val shifted = if (q >= 0) acc << q.toInt else acc >> (-q).toInt
    shifted.toLong
  }
}

/** `exp_fp(x)` — [[ExpFixedPoint.expFp]] as a native codegen'd
  * expression: long → long, NULL past [[ExpFixedPoint.MaxArg]].
  * Evaluated O(docs) times at most (scores, not tokens) — the
  * small-BigInt body is never a per-token path. */
case class ExpFp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "exp_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    if (x > ExpFixedPoint.MaxArg) null else ExpFixedPoint.expFp(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |if ($x > ${ExpFixedPoint.MaxArg}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.graft.ExpFixedPoint.expFp($x);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ExpFp =
    copy(child = newChild)
}
