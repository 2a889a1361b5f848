package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale tactics as reusable plan shapes (builder prompt: salting for
  * skew, bucketing for co-located joins).
  */
object Scale {

  /** Two-phase salted aggregation for skewed group keys: partial
    * aggregate on (key, salt) spreads a hot key over `nSalts`
    * reducers, final aggregate merges the partials. sum/count only —
    * the decomposable aggregates (avg = sum/count on top).
    *
    * AQE's skew handling covers skewed JOINS; skewed AGGREGATION keys
    * still concentrate on one reducer without this (Spark's partial
    * aggregation usually suffices, but degrades when the map-side hash
    * table overflows on high-cardinality + hot-key mixtures).
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      nSalts: Int): DataFrame = {
    df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts)))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("psum"), count(lit(1)).as("pcnt"))
      .groupBy(col("k"))
      .agg(sum(col("psum")).as("sum_v"), sum(col("pcnt")).as("count_v"))
  }
}
