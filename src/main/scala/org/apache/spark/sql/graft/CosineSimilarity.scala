// Lives in the org.apache.spark.sql package tree because the
// ExpectsInputTypes contract references private[sql] AbstractDataType —
// the standard placement for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * The composable form (`zip_with` + `aggregate` HOFs) allocates an
  * intermediate product array and walks the vectors three times (dot +
  * two norms when not precomputed); this expression is a single fused
  * loop over the raw `ArrayData`, inlined into whole-stage codegen — the
  * preferred shape for the 100 TB ANN pair stage where it runs
  * O(|queries|·N) times.
  *
  * Semantics match the HOF/oracle form bit-for-bit: every accumulation is
  * a strict left-to-right double fold starting at 0.0, each float pair
  * cast to double before multiplying, final value `dot / sqrt(na·nb)` —
  * the exact expression the DuckDB oracles compute.
  *
  * Edge cases: mismatched lengths fold over the SHORTER vector (a DuckDB
  * oracle must iterate `range(least(len(a), len(b)))` to agree — the
  * repo's oracles use equal-length embeddings so the point is moot
  * there); an empty or zero-norm input yields NULL, not NaN — 0/0 NaN
  * semantics differ across engines and NaN breaks top-k ordering; a NULL
  * ELEMENT in either array yields NULL (`ArrayType(FloatType)` admits
  * containsNull arrays, and reading the null slot as 0.0f — what raw
  * `getFloat` does — would silently diverge from the HOF/DuckDB form,
  * which propagates NULL through the fold).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  // null inputs AND zero-norm/empty vectors produce null
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na * nb == 0.0) null else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val sawNull = ctx.freshName("sawNull")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |boolean $sawNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $sawNull = true; break; }
         |  final double $x = (double) $a.getFloat($i);
         |  final double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($sawNull || $na * $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
