package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Two-pass GLOBAL ranking without the single-task sort that
    * `Window.orderBy` (no partition key) plans:
    *
    *   pass 1 — range-partition on the sort key; per-range row count,
    *     distinct-key count and boundary keys come back to the driver
    *     (P tiny rows, P = shuffle partitions);
    *   pass 2 — per-range LOCAL row_number/dense_rank (this window HAS
    *     a partition key — the range id — so every range sorts in
    *     parallel), shifted by the cumulative offsets of the ranges
    *     before it. A key value straddling a range boundary would be
    *     double-counted by dense_rank, so the driver subtracts one per
    *     straddle (chains across empty ranges too).
    *
    * `global_ntile(k)` derives from the global row number and total
    * count with Spark's own bucket convention (the first N mod k
    * buckets take the extra row), so results bit-match `ntile()`.
    *
    * `asc` must be ASCENDING-normalized (negate numerics for DESC):
    * one normalized form drives the range partitioning, the local
    * window AND the distinct/boundary accounting, keeping all three
    * consistent. Range boundaries never split result determinism —
    * ranks depend only on the total order, not on where Spark's
    * sampled boundaries land.
    *
    * Adds `global_rn`, `global_dense_rank` (LongType — these exceed
    * Int range at fact scale) and `global_ntile` (IntegerType, like
    * the built-in).
    */
  def globalRankNtile(df: DataFrame, asc: Seq[Column], nTiles: Int): DataFrame = {
    require(nTiles > 0, s"nTiles must be positive, got $nTiles")
    val spark = df.sparkSession
    val nRanges =
      math.max(spark.conf.get("spark.sql.shuffle.partitions", "32").toInt, 1)
    val skey = struct(asc: _*)
    // localCheckpoint pins the sampled range boundaries: the stats job
    // and the final job below must observe the SAME __rid assignment
    val ranged = df
      .repartitionByRange(nRanges, asc: _*)
      .withColumn("__rid", spark_partition_id())
      .localCheckpoint()
    val stats = ranged.groupBy(col("__rid"))
      .agg(count(lit(1)).as("cnt"), countDistinct(skey).as("nd"),
           min(skey).as("lo"), max(skey).as("hi"))
      .collect()
      .sortBy(_.getInt(0))
    val total = stats.map(_.getLong(1)).sum
    // cumulative offsets per range, with the boundary-straddle fixup
    var rnOff = 0L
    var drOff = 0L
    var prevHi: Any = null
    val offRows = stats.map { r =>
      val rid = r.getInt(0)
      val dup = if (prevHi != null && prevHi == r.get(3)) 1L else 0L
      val row = (rid, rnOff, drOff - dup)
      rnOff += r.getLong(1)
      drOff += r.getLong(2) - dup
      prevHi = r.get(4)
      row
    }.toSeq
    val sp = spark
    import sp.implicits._
    val offsets = offRows.toDF("__rid", "__rnOff", "__drOff")
    val w = Window.partitionBy(col("__rid")).orderBy(asc: _*)
    val q = total / nTiles
    val rem = total % nTiles
    val ranked = ranged
      .withColumn("__lrn", row_number().over(w))
      .withColumn("__ldr", dense_rank().over(w))
      .join(broadcast(offsets), "__rid")
      .withColumn("global_rn", col("__lrn") + col("__rnOff"))
      .withColumn("global_dense_rank", col("__ldr") + col("__drOff"))
      // first `rem` buckets hold q+1 rows, the rest q — integer DIV so
      // the math stays exact past 2^53 rows
      .withColumn("global_ntile",
        when(col("global_rn") <= lit(rem * (q + 1)),
             expr(s"(global_rn - 1) DIV ${q + 1} + 1"))
          .otherwise(expr(
            s"$rem + (global_rn - ${rem * (q + 1)} - 1) DIV ${math.max(q, 1L)} + 1"))
          .cast("int"))
    ranked.drop("__rid", "__lrn", "__ldr", "__rnOff", "__drOff")
  }
}
