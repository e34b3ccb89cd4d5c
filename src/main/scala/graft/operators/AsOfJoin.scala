package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent right
  * row with the same key and `rightTime <= leftTime`.
  *
  * Spark has no native as-of join; the naive encoding (range theta-join +
  * per-left max) is a quadratic nested-loop at scale. This is the
  * merge-style composition instead: union both sides tagged, one window
  * over (key, time) carrying a running last-non-null STRUCT of the right
  * payload (atomic — all columns always come from the same matched row),
  * keep the left rows. ONE shuffle on the key, O(n log n) per partition —
  * the same shape DuckDB's native ASOF JOIN executes, and deterministic
  * under timestamp ties (right rows sort before left rows at equal time →
  * inclusive semantics; ties among right rows resolve by the payload
  * struct ordering).
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      history to match against
    * @param key        equi-join key column name (same name both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right columns to carry (prefixed `asof_` in output,
    *                   null when no right row precedes the left row).
    *                   Payload columns participate in the deterministic
    *                   tie-break among equal-time right rows, so they
    *                   must be ORDERABLE types (no maps). Right rows with
    *                   a null `rightTime` never match (no temporal
    *                   position).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    val tag = "_asof_tag"
    val t = "_asof_t"
    val p = "_asof_p"

    val l = left
      .withColumn(tag, lit(1))
      .withColumn(t, col(leftTime))
      .withColumn(p, lit(null).cast(
        org.apache.spark.sql.types.StructType(
          payload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType, nullable = true)))))
    val r = right
      // a null-time history row has no temporal position: ascending sort
      // would place it FIRST (nulls first) and make it "precede" every
      // left row — exclude it from matching entirely
      .filter(col(rightTime).isNotNull)
      .withColumn(tag, lit(0))
      .withColumn(t, col(rightTime))
      .withColumn(p, struct(payload.map(col): _*))
      .select((lCols.map(c =>
        if (c == key) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(tag) :+ col(t) :+ col(p)): _*)

    val unioned = l.select((lCols.map(col) :+ col(tag) :+ col(t) :+ col(p)): _*)
      .unionByName(r)

    val w = Window.partitionBy(col(key))
      .orderBy(col(t), col(tag), col(p))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("_asof_match", last(col(p), ignoreNulls = true).over(w))
      .filter(col(tag) === 1)
      .select(lCols.map(col) ++
        payload.map(c => col(s"_asof_match.$c").as(s"asof_$c")): _*)
  }
}
