package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Stage-level profile of one registered query at one corpus scale —
  * the diagnostic behind SCALECURVE watch items (first used on d8's
  * r6 "sf10→sf30 wall exponent 1.22" — which this tool localized to
  * HARNESS state pollution, not the plan: a fresh JVM ran sf30 in
  * 75.9 s with zero spill and ~2.6× executor time for 3× data):
  * per-stage executor time, shuffle volume and SPILL bytes localize
  * whether a drift is a build stage, a join, or memory-pressure spill
  * (the classic fixed-reducer-count failure at growing scale).
  *
  * Usage: runMain graft.QueryProfile <query> <sfDir> [initialPartitionNum]
  * The optional third arg raises AQE's initial shuffle partition
  * count (reducers then track data volume instead of being pinned at
  * core count) — the A/B that tests a spill hypothesis directly.
  */
object QueryProfile {
  case class StageRow(id: Int, name: String, tasks: Int, runMs: Long,
                      cpuMs: Long, shufReadMB: Long, shufWriteMB: Long,
                      spillMemMB: Long, spillDiskMB: Long, peakMemMB: Long)

  def main(args: Array[String]): Unit = {
    val query = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Deep-scale default (overridable by the third arg): implicit
      // exchanges (EnsureRequirements-created, e.g. both sides of a
      // join neither of which satisfies the distribution) are CREATED
      // at the session initial width and AQE can only coalesce DOWN —
      // at sf100 a 32-wide verify-join exchange carried 17 GB and
      // spilled 22 GB through its SMJ sort. Starting high and letting
      // AQE coalesce to byte-proportional widths is the standard
      // cluster deployment shape for this config; at small scales AQE
      // coalesces back to ~core-count, so small-SF numbers are
      // unaffected.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
              if (args.length > 2) args(2) else "1024")
      // 16 MB advisory (default 64): AQE sizes a stage's width by its
      // shuffle-READ bytes, so a stage whose work is dominated by a
      // larger OUTPUT (the d8 candidate-expansion join emits ~8× its
      // input) gets 4× more headroom before its map-side write sorter
      // spills. Small scales are unaffected (parallelismFirst's core-
      // count floor binds there).
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")
    // ad-hoc config A/Bs without a rebuild:
    // SPARK_GRAFT_CONF="k=v,k2=v2" applies last, overriding the above
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stages = mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = e.stageInfo; val m = s.taskMetrics
        stages += StageRow(s.stageId, s.name.takeWhile(_ != '\n').take(60),
          s.numTasks, m.executorRunTime, m.executorCpuTime / 1000000,
          m.shuffleReadMetrics.totalBytesRead >> 20,
          m.shuffleWriteMetrics.bytesWritten >> 20,
          m.memoryBytesSpilled >> 20, m.diskBytesSpilled >> 20,
          m.peakExecutionMemory >> 20)
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect() // warmup
    stages.clear()
    val t0 = System.nanoTime()
    // toRdd.count(), NOT count() (r13): the count-rewrite eliminated
    // d14/d23/d25's entire pair pipeline (left-outer join against an
    // aggregate grouped by the join key is provably non-expanding),
    // so the r12 deep profiles for that family measured only the
    // label rollup. toRdd executes the query's own physical plan.
    val n = SparkEntry.queries(query)(spark, sfDir)
      .queryExecution.toRdd.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"\n$query @ $sfDir: $n rows, $wall%.1f s wall")
    println(f"${"stage"}%5s ${"tasks"}%5s ${"run_s"}%8s ${"cpu_s"}%8s " +
      f"${"shR_MB"}%7s ${"shW_MB"}%7s ${"spillM"}%7s ${"spillD"}%7s " +
      f"${"peakM"}%7s  name")
    stages.sortBy(-_.runMs).take(15).foreach { r =>
      println(f"${r.id}%5d ${r.tasks}%5d ${r.runMs / 1e3}%8.1f " +
        f"${r.cpuMs / 1e3}%8.1f ${r.shufReadMB}%7d ${r.shufWriteMB}%7d " +
        f"${r.spillMemMB}%7d ${r.spillDiskMB}%7d ${r.peakMemMB}%7d  ${r.name}")
    }
    println(f"TOTAL run ${stages.map(_.runMs).sum / 1e3}%.1f s across " +
      f"${stages.size} stages; spill mem ${stages.map(_.spillMemMB).sum} MB " +
      f"disk ${stages.map(_.spillDiskMB).sum} MB")
    // Machine-readable summary (one line, greppable as PROFILE_JSON):
    // exec_s (total executor run time) is the NOISE-ROBUST work
    // measure — wall on a saturated 32-core box swings with scheduling
    // and AQE join-strategy flips at borderline build sizes, but total
    // work does not. Deep-scale exponents are fitted on exec_s.
    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    println(s"""PROFILE_JSON {"query":"$query","sf":"$sfDir","rows":$n,""" +
      s""""wall_s":${fmt(wall)},"exec_s":${fmt(stages.map(_.runMs).sum / 1e3)},""" +
      s""""cpu_s":${fmt(stages.map(_.cpuMs).sum / 1e3)},""" +
      s""""spill_mem_mb":${stages.map(_.spillMemMB).sum},""" +
      s""""spill_disk_mb":${stages.map(_.spillDiskMB).sum}}""")
    spark.stop()
  }
}
