package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY prompt: salting for hot keys).
  *
  * AQE's skew-join splitting covers joins automatically; these helpers cover
  * the cases AQE doesn't: a single hot GROUP BY key concentrating one reducer
  * when the aggregation buffer itself is large (collect_list-style), and
  * explicit salted joins when AQE is unavailable.
  */
object Skew {

  /** Two-phase salted aggregation: rows are spread over `salts` sub-keys,
    * partial aggregates computed per (key, salt), then combined per key. Use
    * when a hot key would overwhelm one reducer and the aggregate is
    * reassociatable.
    *
    * The salt is VALUE-INDEPENDENT — `monotonically_increasing_id mod salts`
    * — so even a hot key whose rows all carry one constant value (the
    * canonical hot-key counting case) spreads across all `salts` reducers; a
    * value-derived salt would put such rows in a single bucket.
    * [[saltedCountDistinct]] keeps the value-hash salt, where it is required
    * for exactness. */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
      partial: Column => Column, combine: Column => Column,
      valueCol: Column, as: String): DataFrame =
    saltedPartials(df, key, salts, partial, valueCol)
      .groupBy(col("__k"))
      .agg(combine(col("__p")).as(as))
      .withColumnRenamed("__k", "key")

  /** First phase of [[saltedAgg]]: the (key, salt) partial aggregates. */
  private[graft] def saltedPartials(df: DataFrame, key: Column, salts: Int,
      partial: Column => Column, valueCol: Column): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(key.as("__k"), col("__salt"))
      .agg(partial(valueCol).as("__p"))

  /** Salted sum: spread a hot key's rows over `salts` partial sums. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int = 16,
      as: String = "sum"): DataFrame =
    saltedAgg(df, key, salts, sum, sum, value, as)

  /** Salted distinct-count (exact): dedupe within (key, salt, value) then
    * count per key — the heavy shuffle carries (key, salt) sub-groups. */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column,
      salts: Int = 16, as: String = "n_distinct"): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(xxhash64(value), lit(salts)))
      .select(key.as("__k"), col("__salt"), value.as("__v"))
      .distinct() // (key, salt, v): each v lands in exactly one salt
    salted.groupBy(col("__k"))
      .agg(count(lit(1)).as(as))
      .withColumnRenamed("__k", "key")
  }
}
