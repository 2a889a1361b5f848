package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All relational queries read through
  * here so the scan path (vectorized parquet, pushdown, pruning) is
  * uniform. At 100 TB these would be partitioned/bucketed external
  * tables; the API (dir + name) stays identical.
  */
object Tables {
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** Memoized per (session, dir, table): repeated reads of the same
    * parquet table otherwise re-run file listing + footer schema
    * discovery on every query CONSTRUCTION — a fixed per-query driver
    * cost that dominated the bench total at small scale (the same
    * metadata caching a catalog table gets from the metastore). The
    * DataFrame and its resolved FileIndex are immutable and the test
    * tables read-only, so sharing is safe; execution-time scans are
    * unaffected (vectorized parquet with pushdown, or the
    * CacheManager's InMemoryRelation when Bench caches tables).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // evict entries of stopped sessions so the memo never pins a dead
    // session (and its FileIndex) in a long-lived multi-session process
    memo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    memo.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Write-path invalidation — what a metastore does on INSERT
    * OVERWRITE: any job that rewrites a table directory in place must
    * drop the memoized DataFrame (its InMemoryFileIndex lists part
    * files once, at construction) before the next read, or stale file
    * paths surface as FAILED_READ_FILE. Used by the CLI `pipeline`
    * command, which overwrites its corpus-out table on every run.
    */
  def invalidate(dir: String): Unit =
    memo.keySet.removeIf(_._2 == dir)

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped in two physical shapes across driver data
    * generations: parquet TIMESTAMP(NANOS) — which Spark has no native
    * type for, so the legacy conf surfaces it as an epoch-nanos long —
    * and plain TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Normalize both
    * to a microsecond TimestampType column: integer `div` keeps full
    * int64 precision on the nanos path (a double round-trip would
    * corrupt epoch-nanos), and the NTZ→LTZ cast is exact because every
    * session here pins spark.sql.session.timeZone=UTC.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Numeric helpers shared by every oracle-checked query.
  *
  * The driver hash-compares Spark output against DuckDB output, so any
  * double aggregation must be bit-identical across engines. Doubles are
  * summed through exact DECIMAL arithmetic (no float association order)
  * and only then cast back to double — both engines produce the same
  * exact decimal, hence the same double. See SURVEY.md §5.
  */
object Num {
  /** Exact cents: cast a money-like double to DECIMAL(18,2). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact 4-decimal cast for products like price*(1-discount). */
  def dec4(c: Column): Column = c.cast(DecimalType(22, 4))

  /** Order-independent exact sum of a money column, surfaced as double. */
  def moneySum(c: Column): Column = round(sum(dec2(c)).cast(DoubleType), 2)

  /** Exact sum of a 4-decimal product, surfaced as double. */
  def prodSum(c: Column): Column = round(sum(dec4(c)).cast(DoubleType), 4)

  /** Deterministic average: exact decimal sum, double division, round. */
  def moneyAvg(c: Column): Column =
    round(sum(dec2(c)).cast(DoubleType) / count(c), 4)

  // DuckDB-side SQL fragments mirroring the helpers above.
  def sqlMoneySum(e: String): String =
    s"round(CAST(sum(CAST($e AS DECIMAL(18,2))) AS DOUBLE), 2)"
  def sqlProdSum(e: String): String =
    s"round(CAST(sum(CAST($e AS DECIMAL(22,4))) AS DOUBLE), 4)"
  def sqlMoneyAvg(e: String): String =
    s"round(CAST(sum(CAST($e AS DECIMAL(18,2))) AS DOUBLE) / count($e), 4)"
}
