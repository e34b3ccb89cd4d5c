package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Edit-distance similarity self-join via deletion neighborhoods — the
  * fuzzy-match/record-linkage stage (dedup of near-identical short
  * fields: names, titles, product codes) done WITHOUT a quadratic
  * compare. Method: FastSS (Bocek et al., 2007) / SymSpell family —
  * two strings are within edit distance 1 only if their
  * single-deletion neighborhoods intersect (delete-delete catches
  * substitutions at the same position, identity-delete catches
  * insertions/deletions), so candidates come from an EQUI-join on
  * neighborhood keys and only candidates pay the Levenshtein verify.
  *
  * Scale shape: the neighborhood explode is O(len) rows per string
  * (short fields by design — this is not a document operator), the
  * shuffle keys are near-unique (a hot key means many strings one
  * deletion apart — exactly the candidates we want), and there is no
  * all-pairs stage at any cardinality. The verify is
  * O(candidates × len²), with candidates bounded by true-ish matches
  * rather than n².
  */
object FuzzyJoin {

  /** All pairs (id_a < id_b) whose `strCol` values are within edit
    * distance 1, with the exact distance (0 = exact duplicates).
    * Output: `id_a`, `id_b`, `dist`. */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
    // the string itself + every single-deletion variant, tagged with the
    // deletion position (-1 = identity): a candidate pair must agree on
    // a variant STRING; keeping the position out of the key loses no
    // recall (same-position deletions collide on the string alone)
    val nbh = base.select(col("id"), col("s"),
      explode(concat(
        array(col("s")),
        expr("transform(sequence(1, length(s)), i -> " +
          "concat(substring(s, 1, i - 1), substring(s, i + 1, length(s))))")))
        .as("key"))
    val cand = nbh.as("a").join(nbh.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.s").as("s_a"),
        col("b.id").as("id_b"), col("b.s").as("s_b"))
      .distinct() // one neighborhood collision is enough; drop duplicates
    cand
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast(IntegerType))
      .filter(col("dist") <= 1) // verify: neighborhoods over-generate
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
