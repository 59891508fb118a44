package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Join-shaping utilities for the 100 TB path: bucketed co-located
  * joins (no shuffle at read time) and salted joins (skewed-key
  * mitigation when AQE's skew split isn't enough or isn't available —
  * e.g. in stream-static joins).
  */
object JoinOps {

  /** Persist `df` as a bucketed+sorted table: a later equi-join between
    * two tables bucketed the same way on the join key runs WITHOUT a
    * shuffle on either side (SortMergeJoin reads co-located buckets).
    * The write cost is paid once; every subsequent join amortizes it —
    * the standard layout for big fact tables joined repeatedly on the
    * same key.
    */
  def bucketize(df: DataFrame, table: String, key: String,
                buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Salted equi-join for skewed keys: the big side's hot keys are
    * split across `salt` sub-keys (deterministic spread via a stable
    * hash of a high-cardinality discriminator column — no rand(), so
    * the plan stays reproducible and retry-safe); the small side is
    * replicated `salt` times. Results equal the plain join, but the
    * hot key's rows land on `salt` reducers instead of one.
    *
    * `discriminator` must be a column of the big side whose values vary
    * within a join key (a row id, a detail id…).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 discriminator: String, salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(discriminator)), lit(salt)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
