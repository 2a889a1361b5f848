package graft.pipeline

import org.apache.spark.scheduler.{
  SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** Progress reporting (progress_percentage.py:10-29): the reference
  * prints a thread-safe percentage of bytes transferred per S3 upload;
  * the Spark analog is the percentage of TASKS completed across the
  * jobs a command runs, fed by the scheduler's event bus. Atomics
  * mirror the reference's lock (callbacks arrive on the listener-bus
  * thread while jobs keep submitting), and the percent is only
  * re-printed when it changes — same dedup the reference gets from
  * rounding to whole percents.
  *
  * Attached by the CLI around every command (the reference reports
  * only during upload; task progress covers the compute too, which is
  * where a 100 TB dump actually spends its time).
  */
class ProgressListener(report: String => Unit = s => System.err.println(s))
    extends SparkListener {
  private val total = new java.util.concurrent.atomic.AtomicLong(0)
  private val done = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var lastPct = -1

  // count totals per SUBMITTED stage, not per job: stages whose
  // shuffle/cache output is reused are skipped and never submit, so a
  // job-level total would overcount and the percentage would stall
  // short of 100% on a successful command
  override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
    total.addAndGet(s.stageInfo.numTasks.toLong)
    ()
  }

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    // count only SUCCESSFUL, non-speculative attempts: failed attempts
    // are resubmitted (their stage's total already covers the retry) and
    // a speculative duplicate would double-count its task — either way
    // `done` would overshoot `total` and the percentage would hit 100%
    // before the work actually finishes
    val counts = taskEnd.reason == org.apache.spark.Success &&
      (taskEnd.taskInfo == null || !taskEnd.taskInfo.speculative)
    if (!counts) return
    val d = done.incrementAndGet()
    val t = total.get()
    if (t > 0) {
      val pct = math.min(((d * 100) / t).toInt, 100)
      // serialize the check-and-report: callbacks are normally bus-thread
      // serial, but a concurrent reader pattern shouldn't double-print
      synchronized {
        if (pct != lastPct) {
          lastPct = pct
          report(s"[graft] progress: $pct% ($d/$t tasks)")
        }
      }
    }
  }
}
