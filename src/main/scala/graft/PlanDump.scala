package graft

import org.apache.spark.sql.SparkSession

/** Print one registered query's formatted physical plan against a
  * corpus dir WITHOUT executing it — the cheap way to audit exchange
  * widths, join strategies and scan pushdown at any scale (the
  * `.explain("formatted")` discipline the build plan prescribes).
  *
  * Usage: runMain graft.PlanDump <query> <sfDir>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(query, sfDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    SparkEntry.queries(query)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
