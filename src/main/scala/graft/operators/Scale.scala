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

  /** Salted equi-join for a skewed FACT key — the manual alternative to
    * AQE's OptimizeSkewedJoin when the engine must not rely on runtime
    * re-planning (e.g. the join feeds a stage AQE cannot re-shuffle, or
    * a fixed execution plan is required for reproducibility):
    *
    *   fact rows get a deterministic salt in [0, nSalts) (partition id
    *   + intra-partition id — spreads a hot key over nSalts reducers
    *   without an RNG), the dim side is replicated nSalts times with
    *   `explode(sequence(...))`, and the join key becomes (key, salt).
    *
    * Cost model vs AQE skew-split: salting replicates the ENTIRE dim
    * side nSalts× through the shuffle (a deliberate, bounded overhead
    * chosen at plan time), where AQE splits only the partitions it
    * OBSERVES to be oversized (cheaper, but only after the map stage
    * has materialized the skewed output). Inner joins only: outer
    * semantics would need null-extension fixups across salt groups.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: Column, dimKey: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts))
        .cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(saltedDim,
      factKey === dimKey && saltedFact("__salt") === saltedDim("__salt"),
      "inner").drop("__salt")
  }

  /** Two-pass GLOBAL ranking without the single-task sort that
    * `Window.orderBy` (no partition key) plans:
    *
    *   pass 0 — sample ~64·P sort keys by a deterministic CONTENT hash
    *     (`xxhash64(key) % mod == 0` — same rows sampled on any
    *     re-scan, unlike `repartitionByRange`'s partition-seeded
    *     sampler), sort the sample (constant-size, data-independent)
    *     and keep P−1 evenly spaced boundary keys on the driver;
    *   pass 1 — assign each row a range id with an explicit
    *     lexicographic predicate against those boundary LITERALS
    *     (rid = #boundaries < key); per-range row and distinct-key
    *     counts come back to the driver (≤P tiny rows);
    *   pass 2 — per-range LOCAL row_number/dense_rank (this window HAS
    *     a partition key — the range id — so every range sorts in
    *     parallel), shifted by the cumulative offsets of the ranges
    *     before it.
    *
    * Because the range id is a pure function of the KEY VALUE, equal
    * keys can never straddle a range boundary (no dense_rank fixup
    * needed), and both passes recompute the SAME assignment from
    * source — nothing is materialized: driver state is the fixed-size
    * sample, not the data, and no checkpoint pins partitioning. The
    * input must be deterministic under re-scan (file sources are; an
    * upstream rand() is not — same contract as Spark's own reuse).
    *
    * `global_ntile(k)` derives from the global row number and total
    * count with Spark's own bucket convention (the first N mod k
    * buckets take the extra row), so results bit-match `ntile()`.
    *
    * `asc` must be ASCENDING-normalized (negate numerics for DESC):
    * one normalized form drives the range assignment, the local
    * window AND the distinct accounting, keeping all three consistent.
    * NULL caveat (why `.desc` can't just be passed in): rows with a
    * null in a sort column compare null against every boundary and all
    * land in range 0, where the local window's default ascending order
    * puts them first — the composite behaves as `asc_nulls_first`.
    * That matches the built-in for ascending sorts; for a DESC sort
    * expressed by negation it differs from `.desc`'s NULLS LAST, so
    * keep negated DESC sort columns non-null (negate(null) would
    * corrupt the built-in comparison too).
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
    // -------- pass 0: boundary keys from a content-hash sample --------
    val n = df.count()
    val targetSample = nRanges.toLong * 64L
    val mod = math.max(1L, n / math.max(targetSample, 1L))
    val keyed = df.select(asc.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }: _*)
    val fieldTypes = keyed.schema.map(_.dataType)
    val sampled = keyed
      .filter(pmod(xxhash64(keyed.columns.map(col): _*), lit(mod)) === 0)
      .orderBy(keyed.columns.map(col): _*) // constant-size sort (~64·P rows)
      .collect()
    val step = math.max(1, sampled.length / nRanges)
    val boundaries = (step until sampled.length by step)
      .map(sampled(_))
      .filter(r => (0 until r.length).forall(!r.isNullAt(_))) // null keys can't bound
      .distinct
      .take(nRanges - 1)
    // rid = count of boundaries strictly below the key, via an explicit
    // lexicographic predicate with literals cast to the column types
    // (a struct literal would re-infer decimal precision and break the
    // comparison). Null key fields make every comparison null → rid 0.
    def gtBoundary(b: org.apache.spark.sql.Row): Column = {
      def rec(i: Int): Column = {
        val c = asc(i)
        val l = lit(b.get(i)).cast(fieldTypes(i))
        if (i == asc.length - 1) c > l else (c > l) || (c === l && rec(i + 1))
      }
      rec(0)
    }
    val ridExpr = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(gtBoundary(b), 1).otherwise(0)
    }
    val ranged = df.withColumn("__rid", ridExpr)
    // -------- pass 1: per-range counts (recomputed, not pinned) --------
    val stats = ranged.groupBy(col("__rid"))
      .agg(count(lit(1)).as("cnt"), countDistinct(skey).as("nd"))
      .collect()
      .sortBy(_.getInt(0))
    val total = stats.map(_.getLong(1)).sum
    var rnOff = 0L
    var drOff = 0L
    val offRows = stats.map { r =>
      val row = (r.getInt(0), rnOff, drOff)
      rnOff += r.getLong(1)
      drOff += r.getLong(2)
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
