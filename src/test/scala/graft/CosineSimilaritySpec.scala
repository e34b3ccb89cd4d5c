package graft

import graft.engine.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The native codegen'd cosine_sim must agree BIT-FOR-BIT with the
  * composable HOF form (strict left fold) — that equivalence is what keeps
  * the vector ops oracle-stable.
  */
class CosineSimilaritySpec extends SparkSpec {

  test("cosine_sim equals the zip_with/aggregate HOF computation bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Lakehouse.embeddings(spark)
    val a = df.limit(50).select(col("vec_id").as("i"), col("embedding").as("ea"))
    val b = df.select(col("vec_id").as("j"), col("embedding").as("eb"))
    val pairs = a.join(b, col("i") < col("j"))
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    val cmp = pairs.select(
      call_function("cosine_sim", col("ea"), col("eb")).as("native"),
      (hofDot(col("ea"), col("eb"))
        / sqrt(hofDot(col("ea"), col("ea")) * hofDot(col("eb"), col("eb")))).as("hof"))
    val mismatches = cmp.filter(
      col("native") =!= col("hof")
        && !(isnan(col("native")) && isnan(col("hof")))).count()
    assert(mismatches === 0L)
  }

  test("cosine_sim is null-safe and self-similarity is 1.0 within ulps") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(1.0f, 2.0f, 3.0f))),
      (None, Some(Array(1.0f, 0.0f, 0.0f))))
      .toDF("a", "b")
      .select(call_function("cosine_sim", col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0))
  }

  test("cosine_sim yields NULL (not NaN) for zero-norm and empty vectors") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)), // zero-norm left
      (Array(1.0f, 2.0f), Array(0.0f, 0.0f)), // zero-norm right
      (Array.empty[Float], Array.empty[Float]), // empty
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f))) // control: defined
      .toDF("a", "b")
      .select(call_function("cosine_sim", col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0) && rows(2).isNullAt(0))
    assert(math.abs(rows(3).getDouble(0) - 1.0) < 1e-12)
  }

  test("cosine_sim propagates a NULL ELEMENT as NULL, matching the HOF form") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // ArrayType(FloatType) admits null slots; reading them as 0.0f (raw
    // getFloat) would silently diverge from zip_with/aggregate + DuckDB
    val df = Seq(
      (Array[java.lang.Float](1.0f, null, 3.0f), Array[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](null, 2.0f)),
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](1.0f, 2.0f)))
      .toDF("a", "b")
      .select(call_function("cosine_sim", col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0), "null element on the left must yield NULL")
    assert(rows(1).isNullAt(0), "null element on the right must yield NULL")
    assert(math.abs(rows(2).getDouble(0) - 1.0) < 1e-12)
  }
}

/** Small helper for specs needing raw embeddings. */
object Lakehouse {
  def embeddings(spark: org.apache.spark.sql.SparkSession) =
    graft.core.Lake(spark, SparkSpec.sfDir).embeddings
}
