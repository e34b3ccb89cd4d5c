package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out join utilities: skew salting and co-located bucketed joins.
  *
  * At 100 TB the two join failure modes are (1) a hot key overwhelming
  * one reducer and (2) re-shuffling a huge fact table for every join.
  * AQE's skew-join split handles (1) adaptively; explicit salting is the
  * deterministic fallback when a key is pathologically hot. Bucketed
  * tables handle (2): both sides pre-hashed into the same bucket count on
  * the join key join with zero exchanges (see BucketedJoinSpec).
  */
object Scale {

  /** Width for explicit repartitions: `spark.graft.parallelism` when set,
    * else the cluster's default parallelism. Query bodies must never
    * hardcode a width — a literal tuned for local[32] CAPS parallelism on
    * a real cluster; this derives it from wherever the session runs. */
  def par(s: SparkSession): Int =
    s.conf.getOption("spark.graft.parallelism").map(_.toInt)
      .getOrElse(s.sparkContext.defaultParallelism)

  /** Skew-salted inner equi-join, result-identical to
    * `left.join(right, leftKey === rightKey)`.
    *
    * The left (skewed, large) side gets a random salt in [0, salts); the
    * right side is replicated `salts` times with every salt value. The
    * join key becomes (key, salt) — a hot key's rows spread over `salts`
    * reducers instead of one. Replication costs |right|·salts, so use a
    * broadcast join instead when the right side is small enough to ship
    * whole; salting is for medium build sides with a skewed probe side.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, salts: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      (rand(seed = 7) * salts).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated,
        leftKey === rightKey && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
