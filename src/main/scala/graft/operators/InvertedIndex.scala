package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Distributed inverted-index construction: term → document frequency,
  * corpus term frequency, and a bounded posting list — the retrieval-side
  * sibling of the TF-IDF stage (reference surfaces document search over
  * the lake via full scans, query_datalake.py:88-94; an index build is the
  * scale path past that).
  *
  * Scale shape (the part that must survive 100 TB):
  *   - tokenize → (term, doc) partial counts: one shuffle keyed on the
  *     UNIFORM (term, doc) pair, with map-side combine — the raw token
  *     stream never crosses the wire un-aggregated.
  *   - posting CAP per term via `row_number() <= k` on the term-keyed
  *     shuffle: Zipf-heavy terms ("the") keep df/total_tf exact but never
  *     materialize million-entry arrays — the filter-on-rank shape Spark
  *     plans as a WindowGroupLimit, so each partition retains only k rows
  *     per term before the final aggregate.
  *   - the collected array is ≤ k longs per term, so the output row is
  *     bounded regardless of corpus size.
  */
object InvertedIndex {

  /** Build the index. Output: `term`, `df` (distinct docs), `total_tf`
    * (corpus occurrences), `postings` (comma-joined first `postingsCap`
    * doc ids in ascending id order — deterministic, so oracle-hashable).
    * Tokenization is the repo-wide whitespace convention
    * (split(trim(text), ' '), empty tokens dropped).
    *
    * Two branches over the SAME (term,doc) aggregate — its exchange is
    * computed once and reused: the stats branch keeps df/total_tf exact
    * over all occurrences, while the postings branch filters on
    * `row_number() <= cap` — the shape Catalyst plans as a
    * WindowGroupLimit, pruning to k rows per term per partition BEFORE
    * the shuffle, which is what keeps "the" from funneling its full
    * posting list anywhere. The closing join aligns on the term
    * partitioning both branches already have — no extra exchange.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
            postingsCap: Int): DataFrame = {
    require(postingsCap > 0, s"postingsCap must be positive (got $postingsCap)")
    val tf = docs
      .select(col(idCol).as("doc"),
        explode(graft.functions.TextFns.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc"))
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy(col("term")).agg(
      count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
    val postings = tf
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("term")).orderBy(col("doc"))))
      .filter(col("rn") <= postingsCap) // -> WindowGroupLimit
      .groupBy(col("term"))
      .agg(array_join(
        transform(sort_array(collect_list(col("doc"))), _.cast(StringType)),
        ",").as("postings"))
    // inner join is total: every term with df >= 1 has >= 1 posting
    stats.join(postings, Seq("term"))
  }
}
