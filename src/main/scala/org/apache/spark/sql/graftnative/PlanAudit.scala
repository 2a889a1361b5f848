package org.apache.spark.sql.graftnative

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** Per-query physical-plan audit over the whole SparkEntry surface.
  *
  * The scale claims the repo makes in prose — filters reach the scan,
  * exchanges carry slim rows, nothing spills at bench scale, small
  * sides broadcast — are each OBSERVABLE per query: scan bytes and
  * shuffle bytes from the stage-level task metrics, spill from the
  * same, exchange/broadcast/codegen node counts and pushed-filter
  * strings from the AQE-final physical plan. This main measures all of
  * them for every registered query in one pass and writes
  * `PLAN_AUDIT.json`, so "no unpushed filters, slim exchanges" is a
  * committed table instead of a claim (PlanAuditSpec pins the
  * artifact's coverage and the global invariants: zero spill at sf0.1,
  * zero cartesian products, every lineitem-filtering scan carrying
  * pushed filters).
  *
  * Lives under org.apache.spark.sql so it can (a) drain the listener
  * bus deterministically between queries (`listenerBus.waitUntilEmpty`
  * is private[spark] — the alternative is sleep-and-hope attribution)
  * and (b) unwrap `AdaptiveSparkPlanExec`/`QueryStageExec` to count
  * nodes in the plan AQE actually ran, not the initial one.
  *
  * Methodology notes:
  *  - Tables are NOT pre-cached (unlike Bench): scan bytes must come
  *    from parquet so column pruning / predicate pushdown / row-group
  *    skipping show up as bytes, not be hidden by an InMemoryRelation.
  *  - One execution per query: metrics are volumes, not latencies —
  *    they do not jitter with host load the way timings do.
  *  - Stage→query attribution is by draining the listener bus after
  *    each query's action completes; queries run strictly serially on
  *    one SparkContext, so the delta between snapshots is the query's.
  */
object PlanAudit {
  private class Acc extends SparkListener {
    val scanBytes = new AtomicLong
    val scanRecords = new AtomicLong
    val shuffleWrite = new AtomicLong
    val shuffleRead = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    // max over stages since the last resetPeak(), not a monotone
    // counter — reset per query so each row reports its own peak
    val peakExecMem = new AtomicLong
    def resetPeak(): Unit = peakExecMem.set(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        scanBytes.addAndGet(m.inputMetrics.bytesRead)
        scanRecords.addAndGet(m.inputMetrics.recordsRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        peakExecMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
      }
    }
    def snapshot: Map[String, Long] = Map(
      "scan_bytes" -> scanBytes.get, "scan_records" -> scanRecords.get,
      "shuffle_write_bytes" -> shuffleWrite.get,
      "shuffle_read_bytes" -> shuffleRead.get,
      "mem_spill_bytes" -> memSpill.get, "disk_spill_bytes" -> diskSpill.get)
  }

  /** Flatten the executed plan across the AQE node, materialized query
    * stages, and codegen wrappers. ReusedExchangeExec is kept as a
    * marker but NOT descended into — its child is the original
    * exchange, already counted once where it first appears. Only valid
    * AFTER the plan has executed: AQE materializes query stages (with
    * CollapseCodegenStages applied per stage) lazily, so an unexecuted
    * AdaptiveSparkPlanExec shows neither stages nor codegen nodes. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case r: ReusedExchangeExec => Seq(r)
    case _ => p +: p.children.flatMap(flatten)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    // session warmup outside any query's attribution window (Bench's
    // discipline: the first query must not be charged codegen/session
    // boot, and here it must not be charged the warmup's scan bytes)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => }

    val unknown = args.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val selected =
      if (args.isEmpty) graft.SparkEntry.queries
      else graft.SparkEntry.queries.filter { case (n, _) => args.contains(n) }

    // mirror Bench's per-query unpersist: iterative queries localCheckpoint,
    // and leftover blocks would shift later queries' spill behavior
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    val rows = selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // NOTE: snapshots bracket the EXECUTION below, deliberately
        // excluding eager driver-side work inside fn() itself (d23/d24's
        // corpus count + centroid collect, fixture pack renders): those
        // are construction-time setup shared across reruns, and charging
        // them here would make the volumes non-comparable with Bench's
        // cached-construction timings. The artifact comment records this.
        // drain in-flight stage events from fn()'s eager construction
        // work (d23/d24 collects, fixture renders) BEFORE snapshotting:
        // a late-landing completion event would otherwise pollute the
        // reset peak / inflate the before-after deltas (r12 advice)
        spark.sparkContext.listenerBus.waitUntilEmpty()
        val before = acc.snapshot
        acc.resetPeak()
        val t0 = System.nanoTime()
        // toRdd.count(), NOT df.count(): count() plans a NEW query (agg
        // over the df) whose scan can prune every column — the audited
        // bytes would be the count's, not the query's. toRdd executes
        // the query's own physical plan, materializing its real output,
        // and finalizes AQE so the stage/codegen counts below are the
        // plan that actually ran.
        val n = df.queryExecution.toRdd.count()
        val wallS = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.listenerBus.waitUntilEmpty()
        val after = acc.snapshot
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!keep.contains(id)) rdd.unpersist(blocking = false)
        }
        val plan = flatten(df.queryExecution.executedPlan)
        val scans = plan.collect { case f: FileSourceScanExec => f }
        val pushed = scans.flatMap(_.metadata.get("PushedFilters"))
          .filter(s => s.nonEmpty && s != "[]")
        val counts = Map(
          "shuffle_exchanges" -> plan.count(_.isInstanceOf[ShuffleExchangeLike]),
          "broadcast_exchanges" ->
            plan.count(_.isInstanceOf[BroadcastExchangeLike]),
          "reused_exchanges" -> plan.count(_.isInstanceOf[ReusedExchangeExec]),
          "wholestage_codegen" ->
            plan.count(_.isInstanceOf[WholeStageCodegenExec]),
          "file_scans" -> scans.size,
          "cartesian_products" ->
            plan.count(_.getClass.getSimpleName == "CartesianProductExec"))
        val deltas = after.map { case (k, v) => k -> (v - before(k)) }
        val fields =
          (deltas.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }) ++
          (counts.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }) ++
          Seq(
            s""""rows":$n""",
            s""""wall_s":${f"$wallS%.3f"}""",
            s""""peak_execution_memory":${acc.peakExecMem.get}""",
            s""""pushed_filter_scans":${pushed.size}""")
        Some(name -> fields.mkString("{", ",", "}"))
      } catch {
        case e: Throwable =>
          System.err.println(s"[audit] $name failed: ${e.getMessage}")
          None
      }
    }
    val body = rows.map { case (k, v) => s""""$k":$v""" }.mkString(",\n  ")
    val doc =
      s"""{"comment":"per-query physical audit: stage-metric volumes (bytes) + AQE-final plan node counts; one uncached execution per query; construction-time eager actions (codebook collects, corpus counts, fixture renders) happen before the attribution window and are excluded by design (see PlanAudit.scala)",
         |"sf":"$sfDir","cpus":$cpus,"n_queries":${rows.size},
         |"queries":{
         |  $body
         |}}
         |""".stripMargin
    if (args.isEmpty) {
      // a swallowed write failure would leave a STALE committed artifact
      // that PlanAuditSpec might still pass on — warn loudly and exit
      // nonzero so the run cannot read as a successful refresh
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("PLAN_AUDIT.json"), doc.getBytes("UTF-8"))
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[audit] FAILED to write PLAN_AUDIT.json: $e" +
            " — the committed artifact is now stale")
          spark.stop()
          sys.exit(1)
      }
    }
    println(doc)
    spark.stop()
  }
}
