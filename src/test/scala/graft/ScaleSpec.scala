package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-tactic specs: salted aggregation equivalence and bucketed
  * co-located joins (no shuffle exchange in the bucketed plan).
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted sum/count == plain groupBy on a skewed key") {
    // 90% of rows share one key — the salted plan spreads them
    val df = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"k${i % 50}" else "hot", i.toLong)
    }.toDF("k", "v")
    val salted = Scale.saltedSumCount(df, col("k"), col("v"), nSalts = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val plain = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("count_v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join == plain join on a skewed fact key") {
    val fact = SkewBench.skewedFact(spark, 50000L)
    val dim = SkewBench.dim(spark)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("name")).agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
        .orderBy("name").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val salted = agg(Scale.saltedJoin(fact, dim, col("k"), col("k2"), nSalts = 8))
    val plain = agg(fact.join(dim, col("k") === col("k2"))
      .hint("shuffle_hash"))
    assert(salted.toSeq == plain.toSeq)
    // the salted plan's join key is (k, salt): the hot key hashes to
    // nSalts distinct reducers instead of one
    val p = Scale.saltedJoin(fact, dim, col("k"), col("k2"), nSalts = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), "salt column missing from the join plan")
  }

  test("bucketed tables join without a shuffle exchange") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-wh")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$warehouse/orders_b").saveAsTable("graft_orders_b")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$warehouse/lineitem_b").saveAsTable("graft_lineitem_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // tiny tables would otherwise broadcast; force the shuffle-join
      // path so bucketing's no-Exchange property is what's on display
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"),
              col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle; plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ; plan:\n$plan")
      // and it still computes the right thing
      assert(joined.count() ==
        o.join(l, col("o_orderkey") === col("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }

  test("year-partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/orders_part"
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    o.withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("o_year") === 1996)
    val scan = q.queryExecution.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty, "o_year filter not a partition filter")
    // only the 1996 directory survives pruning (7 year partitions exist)
    val pruned = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    assert(pruned.length == 1, s"expected 1 pruned partition, got ${pruned.length}")
    // and data predicates must NOT appear: the filter is partition-only
    assert(scan.dataFilters.isEmpty)
    // correctness vs the unpartitioned scan
    assert(q.count() == o.filter(year(col("o_orderdate")) === 1996).count())
  }

  test("AQE splits a skewed join partition at runtime") {
    // one hot key holds ~90% of the fact side; with skew-join
    // thresholds tuned to this data size, AQE must mark the SMJ as
    // skew-handled (isSkewJoin) instead of letting one task drag
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      import spark.implicits._
      val fact = (0 until 200000).map { i =>
        (if (i % 10 == 0) i.toLong % 1000 else 42L, s"payload_$i")
      }.toDF("k", "payload")
      val dim = (0L until 1000L).map(k => (k, s"dim_$k")).toDF("k2", "name")
      val j = fact.join(dim, col("k") === col("k2"))
      // execute THIS dataset's own QueryExecution (count() plans a new
      // one) so the adaptive plan below is the FINAL one
      assert(j.queryExecution.toRdd.count() == 200000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isSkewJoin=true") || plan.contains("skew=true"),
        s"AQE did not mark the skewed join; plan:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the big side of a selective join") {
    // 100 TB tactic: a selective dimension filter becomes a bloom
    // filter evaluated INSIDE the fact scan, shrinking the shuffle
    // before the join — Spark injects it at optimization time
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        .filter(col("o_totalprice") > 400000) // selective creation side
      val l = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
             s"no runtime bloom filter injected:\n$plan")
      // still correct vs the unfiltered-plan count
      val expected = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .join(spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
                .filter(col("o_totalprice") > 400000).hint("broadcast"),
              col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("two-pass global rank matches the naive global window, sans single-task sort") {
    import org.apache.spark.sql.expressions.Window
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val ranked = Scale.globalRankNtile(
      c, Seq(negate(col("c_acctbal")), col("c_custkey")), 4)
      .select(col("c_custkey"), col("global_rn"), col("global_dense_rank"),
              col("global_ntile"))
    // no stage of the two-pass plan may collapse to one partition
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"two-pass rank still plans a single-partition exchange:\n$plan")
    val naiveW = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    val naive = c.select(col("c_custkey"),
        row_number().over(naiveW).cast("long").as("global_rn"),
        dense_rank().over(naiveW).cast("long").as("global_dense_rank"),
        ntile(4).over(naiveW).as("global_ntile"))
    assert(ranked.collect().map(_.toString).sorted.toSeq ==
           naive.collect().map(_.toString).sorted.toSeq)
  }

  test("two-pass dense_rank handles duplicate keys straddling range boundaries") {
    // few distinct values + many ranges forces values to straddle
    // boundaries; dense_rank must not double-count them
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 1000).map(i => (i % 7, i)).toDF("v", "id")
    val ranked = Scale.globalRankNtile(df, Seq(col("v")), 3)
      .select(col("id"), col("global_rn"), col("global_dense_rank"),
              col("global_ntile"))
    val naiveW = Window.orderBy(col("v"))
    val naive = df.select(col("id"),
        row_number().over(naiveW).cast("long").as("global_rn"),
        dense_rank().over(naiveW).cast("long").as("global_dense_rank"),
        ntile(3).over(naiveW).as("global_ntile"))
    // dense_rank and ntile are deterministic here; row_number within a
    // duplicate value is tie-broken arbitrarily by both plans, so
    // compare (dense_rank, ntile) per id and row_number as a SET
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getInt(0), r.getLong(2))).sorted.toSeq
    assert(key(ranked.collect()) == key(naive.collect()))
    assert(ranked.collect().map(_.getLong(1)).sorted.toSeq ==
           (1L to 1000L).toSeq)
  }

  test("two-pass rank edge cases: empty, single row, all-equal keys, k > N") {
    import org.apache.spark.sql.expressions.Window
    // empty input → empty output, no crash in the offset math
    val empty = Seq.empty[(Int, Int)].toDF("v", "id")
    assert(Scale.globalRankNtile(empty, Seq(col("v")), 4).count() == 0)
    // one row → rank 1, dense rank 1, bucket 1
    val one = Seq((5, 1)).toDF("v", "id")
    val r1 = Scale.globalRankNtile(one, Seq(col("v")), 4).collect().head
    assert(r1.getAs[Long]("global_rn") == 1L &&
           r1.getAs[Long]("global_dense_rank") == 1L &&
           r1.getAs[Int]("global_ntile") == 1)
    // all keys equal → dense rank 1 everywhere, ntile matches built-in
    val eq = (1 to 50).map(i => (7, i)).toDF("v", "id")
    val got = Scale.globalRankNtile(eq, Seq(col("v")), 4)
    assert(got.select(col("global_dense_rank")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.groupBy(col("global_ntile")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      Map(1 -> 13L, 2 -> 13L, 3 -> 12L, 4 -> 12L))
    // more tiles than rows → each row its own bucket (Spark semantics)
    val few = Seq((3, 1), (1, 2), (2, 3)).toDF("v", "id")
    val naiveW = Window.orderBy(col("v"))
    val naive = few.select(col("id"), ntile(10).over(naiveW).as("nt"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val twoPass = Scale.globalRankNtile(few, Seq(col("v")), 10)
      .select(col("id"), col("global_ntile"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(twoPass == naive)
  }

  test("two-pass rank materializes nothing: no checkpoint/RDD scan in the plan") {
    // the range id is recomputed from source by an explicit boundary
    // predicate — the plan must read the original source, not a checkpointed
    // RDD (localCheckpoint would surface as Scan ExistingRDD)
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val ranked = Scale.globalRankNtile(
      c, Seq(negate(col("c_acctbal")), col("c_custkey")), 4)
    val plans = Seq(ranked.queryExecution.analyzed.toString,
                    ranked.queryExecution.executedPlan.toString)
    plans.foreach { p =>
      assert(!p.contains("ExistingRDD") && !p.contains("LogicalRDD"),
        s"two-pass rank materialized its input:\n${p.take(2000)}")
    }
    // and the data still comes from the parquet scan
    assert(plans(1).contains("FileScan parquet") || plans(1).contains("Scan parquet"),
      s"expected a parquet scan in:\n${plans(1).take(2000)}")
  }

  test("projection prunes the parquet read schema to the used columns") {
    val q = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_shipdate") > "1996-01-01")
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = q.queryExecution.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec"))
    // only the projected columns + the filter column reach the reader
    assert(scan.requiredSchema.fieldNames.toSet ==
           Set("l_orderkey", "l_quantity", "l_shipdate"),
           s"read schema not pruned: ${scan.requiredSchema.fieldNames.toSeq}")
    // and the predicate is pushed to the scan
    assert(scan.metadata("PushedFilters").contains("l_shipdate"),
           s"filter not pushed: ${scan.metadata("PushedFilters")}")
  }
}
