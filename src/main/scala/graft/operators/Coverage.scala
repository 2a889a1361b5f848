package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._
import graft.sources.Num._

/** Remaining SURVEY.md §2.12 inventory: arg-max aggregates, join
  * strategy hints, unionByName, date arithmetic.
  */
object Coverage {
  type Q = (SparkSession, String) => DataFrame

  /** One scratch root per JVM (unique path, so concurrent Verify/Bench
    * processes never share a dir), one REUSED subdir per query — each
    * invocation overwrites the same path instead of minting a new temp
    * dir, so a long bench loop doesn't fill /tmp. The root is removed
    * recursively on JVM exit (File.deleteOnExit can't delete non-empty
    * dirs, and Spark's part files aren't individually registered).
    */
  private lazy val scratchRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch_")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(p.toFile)
    }
    p
  }

  private[graft] def scratchDir(name: String): String =
    scratchRoot.resolve(name).toString

  /** Snapshot-isolated TIME TRAVEL over a manifest-versioned parquet
    * table — the transaction-log discipline every lakehouse format
    * (Delta/Iceberg/Hudi) builds on, demonstrated with the log itself
    * as plain JSON: each commit writes immutable parquet filesets and
    * a manifest listing exactly the files live at that version. Commit
    * history here: v1 = fileset A; v2 = A + appended B; v3 = compaction
    * C (A∪B rewritten minus deleted sub-50k rows) + appended D. Reading
    * "as of" version k is a DRIVER-SIDE manifest parse (O(files),
    * metadata-only — no data is scanned to resolve the snapshot)
    * followed by a plain pruned scan of the member filesets; old
    * versions stay readable because commits never mutate files in
    * place — the append/compact/delete history is reconstructed
    * per-version and aggregated through the exact decimal path.
    *
    * Scale shape: at 100 TB the manifest is thousands of entries while
    * the data is millions of files — time travel costs a log read, not
    * a table scan; compaction rewrites only the files it replaces, and
    * the version query unions three independent pruned scans (no
    * shuffle until the K-row per-version aggregate).
    */
  val c23TimeTravel: Q = (s, d) => {
    val root = java.nio.file.Paths.get(scratchDir("c23_tt"))
    val o = orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
    def fs(name: String) = root.resolve(name).toString
    o.filter(col("o_orderkey") % 3 === 0)
      .write.mode("overwrite").parquet(fs("A"))
    o.filter(col("o_orderkey") % 3 === 1)
      .write.mode("overwrite").parquet(fs("B"))
    // v3 commit: compact A+B into C, dropping cancelled (< 50k) rows —
    // the rewrite touches ONLY the files being replaced
    s.read.parquet(fs("A"), fs("B")).filter(col("o_totalprice") >= 50000)
      .write.mode("overwrite").parquet(fs("C"))
    o.filter(col("o_orderkey") % 3 === 2)
      .write.mode("overwrite").parquet(fs("D"))
    val manifests = Map(1 -> Seq("A"), 2 -> Seq("A", "B"), 3 -> Seq("C", "D"))
    java.nio.file.Files.createDirectories(root.resolve("_log"))
    manifests.foreach { case (v, files) =>
      java.nio.file.Files.write(root.resolve(s"_log/v$v.json"),
        files.mkString("[\"", "\",\"", "\"]")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    // time travel: resolve each snapshot FROM THE LOG (not the in-scope
    // manifest map), then scan only its member filesets
    def readManifest(v: Int): Seq[String] = new String(
      java.nio.file.Files.readAllBytes(root.resolve(s"_log/v$v.json")),
      java.nio.charset.StandardCharsets.UTF_8)
      .stripPrefix("[").stripSuffix("]")
      .split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
    (1 to 3).map { v =>
      val files = readManifest(v)
      s.read.parquet(files.map(fs): _*)
        .agg(count(lit(1)).as("n_rows"),
             moneySum(col("o_totalprice")).as("sum_price"))
        .select(lit(v).cast("int").as("version"), col("n_rows"),
                col("sum_price"), lit(files.size).cast("long").as("n_files"))
    }.reduce(_ unionAll _)
  }

  /** max_by / min_by (A2 parity shape, per group). */
  val c1ArgMax: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
             .as("dearest_key"),
           min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
             .as("cheapest_key"))

  /** Explicit shuffle-hash join hint (vs the planner's sort-merge
    * default for fact-fact): skips both sort passes when one side
    * builds a hash map per partition.
    */
  val c2ShuffleHashHint: Q = (s, d) =>
    orders(s, d).hint("shuffle_hash")
      .join(lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
            col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(moneySum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  /** unionByName: schema aligned by column NAME, not position. */
  val c3UnionByName: Q = (s, d) => {
    val a = customer(s, d)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
    val b = supplier(s, d)
      .select(col("s_acctbal").as("bal"), col("s_suppkey").as("k")) // reversed on purpose
    a.unionByName(b)
      .agg(count(lit(1)).as("n"), moneySum(col("bal")).as("sum_bal"))
  }

  /** Date arithmetic: datediff / date_add / last_day / extract. */
  val c4DateArithmetic: Q = (s, d) =>
    orders(s, d)
      .select(
        col("o_orderkey"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("age_days"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("due_date"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .filter(col("o_orderkey") % 37 === 0)

  /** Right-outer join (left outer is q9): all orders kept, nation
    * enrich may be null-side when the customer filter drops the row.
    */
  val c5RightOuter: Q = (s, d) =>
    customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
            col("c_custkey") === col("o_custkey"), "right_outer")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           count(col("c_custkey")).as("n_rich_customer_orders"))

  /** encode → decode round-trip (§2.10 str↔bytes coercion, both ways). */
  val c6Decode: Q = (s, d) =>
    documents(s, d)
      .withColumn("bytes", encode(col("text"), "UTF-8"))
      .withColumn("back", decode(col("bytes"), "UTF-8"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
           sum((col("back") === col("text")).cast("long")).as("n_roundtrip_ok"),
           sum(octet_length(col("bytes"))).as("total_bytes"))

  /** HAVING: post-aggregation filter (Catalyst folds it into the agg). */
  val c7Having: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           moneySum(col("o_totalprice")).as("sum_price"))
      .filter(col("n_orders") >= 15)

  /** PIVOT: returnflag columns per linestatus (explicit value list so
    * the output schema is static — at scale an implicit pivot would
    * trigger a distinct-scan planning job first).
    */
  val c8Pivot: Q = (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(moneySum(col("l_quantity")))
      .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))

  /** Map-type functions: build a map from parsed JSON, interrogate it. */
  val c9MapFunctions: Q = (s, d) =>
    events(s, d)
      .withColumn("m", map(
        lit("k"), get_json_object(col("props"), "$.k").cast("bigint"),
        lit("uid"), col("user_id")))
      .select(
        col("event_id"),
        map_keys(col("m")).getItem(0).as("first_key"),
        element_at(col("m"), "k").as("k_value"),
        size(col("m")).as("m_size"))
      .filter(col("k_value") % 25 === 3)

  /** CSV source/sink round-trip: a deterministic orders slice goes out
    * as CSV and comes back through the text parser (explicit schema,
    * header), then re-aggregates with decimal-exact sums; the oracle
    * computes the same aggregate straight from parquet, so a lossless
    * round-trip (Java's shortest-round-trip double printing both ways)
    * is hash-identical. Exercises the CSV read/write format path the
    * parquet-only parity surface doesn't.
    */
  val c10CsvRoundtrip: Q = (s, d) => {
    val out = scratchDir("c10_csv")
    val src = orders(s, d).filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderpriority"))
    src.write.mode("overwrite").option("header", "true").csv(out)
    s.read.schema(src.schema).option("header", "true").csv(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("o_totalprice")).as("total"),
           min(col("o_orderkey")).as("min_key"))
  }

  /** JSON-lines source/sink round-trip, same contract as c10 for the
    * JSON format path (schema-on-read over text).
    */
  val c11JsonRoundtrip: Q = (s, d) => {
    val out = scratchDir("c11_json")
    val src = events(s, d).filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    src.write.mode("overwrite").json(out)
    s.read.schema(src.schema).json(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("value")).as("total_value"),
           min(col("event_id")).as("min_event"))
  }

  /** ORC source/sink round-trip: Spark bundles the ORC reader/writer
    * natively (orc-core ships with spark-sql — no extra jar), so the
    * third columnar/self-describing format joins the c10/c11
    * aggregate-after-reread contract. ORC embeds its schema, so the
    * re-read needs none (unlike c10's schema-on-read CSV). Avro joins
    * via c32 on the raw avro container API (the spark-avro DataSource
    * module is not on this classpath — see AvroIO).
    */
  val c12OrcRoundtrip: Q = (s, d) => {
    val out = scratchDir("c12_orc")
    val src = lineitem(s, d).filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_partkey"), col("l_returnflag"),
              col("l_quantity"), col("l_extendedprice"))
    src.write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("l_extendedprice")).as("total"),
           min(col("l_orderkey")).as("min_key"))
  }

  /** XML source/sink round-trip: Spark 4 bundles the XML data source
    * natively (the spark-xml lineage merged into spark-sql), so the
    * row-tag text format joins the c10–c12 aggregate-after-reread
    * contract. Schema-on-read like CSV (XML text carries no types);
    * doubles survive via Java shortest-round-trip printing both ways.
    */
  val c13XmlRoundtrip: Q = (s, d) => {
    val out = scratchDir("c13_xml")
    val src = customer(s, d).filter(col("c_custkey") % 40 === 0)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
              col("c_mktsegment"))
    src.write.mode("overwrite").option("rowTag", "customer")
      .format("xml").save(out)
    s.read.schema(src.schema).option("rowTag", "customer")
      .format("xml").load(out)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("c_acctbal")).as("total_bal"),
           min(col("c_custkey")).as("min_key"))
  }

  /** Avro source/sink round-trip, same aggregate-after-reread contract
    * as c10–c13, for the fourth self-describing row format. The
    * `spark-avro` DataSource module is not on this classpath, so the
    * round trip runs through `sources.AvroIO` — a partition-parallel
    * writer / file-parallel reader built directly on the public
    * `org.apache.avro` container API that DOES ship with Spark's jars
    * (see AvroIO's scaladoc for the scale shape). Like ORC, Avro files
    * embed their schema: the re-read takes none.
    */
  val c32AvroRoundtrip: Q = (s, d) => {
    val out = scratchDir("c32_avro")
    val src = part(s, d).filter(col("p_partkey") % 25 === 0)
      .select(col("p_partkey"), col("p_brand"), col("p_size"),
              col("p_retailprice"))
    graft.sources.AvroIO.write(src, out)
    graft.sources.AvroIO.read(s, out)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("p_retailprice")).as("total"),
           min(col("p_partkey")).as("min_key"))
  }

  /** UNPIVOT (melt) — the inverse of c8's pivot: wide measure columns
    * become (measure-name, value) rows via Spark's native `unpivot`
    * (Expand under the hood — a map-side row multiplier, no shuffle),
    * then a per-measure rollup. p_size (int32) is cast to DOUBLE so
    * both measures share the common value type unpivot requires
    * (p_retailprice is already double); the int→double cast is
    * IEEE-exact.
    */
  val c14Unpivot: Q = (s, d) =>
    part(s, d)
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
              col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
               Array(col("p_size"), col("p_retailprice")),
               "measure", "val")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), prodSum(col("val")).as("total"))

  /** Hive-style partitioned layout + PARTITION PRUNING — the
    * first-order I/O decision at 100 TB: the documents slice goes out
    * `partitionBy(source)` (one directory per source, the layout a
    * sharded corpus actually lands in), re-reads, and filters to two
    * sources. Catalyst resolves the filter against the partition
    * COLUMNS — `PartitionFilters` in the scan, pruned directories are
    * never listed, opened, or read — so the scan cost is proportional
    * to the SELECTED partitions, not the corpus (SqlPlanSpec pins the
    * pruned scan; the oracle replays the filter unpartitioned).
    */
  val c15PartitionedPrune: Q = (s, d) => {
    val out = scratchDir("c15_part")
    documents(s, d)
      .select(col("doc_id"), col("n_chars"), col("lang"), col("source"))
      .write.mode("overwrite").partitionBy("source").parquet(out)
    s.read.parquet(out)
      .filter(col("source").isin("src3", "src7"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"),
           min(col("doc_id")).as("min_doc"))
  }

  /** Bucketed tables + EXCHANGE-FREE co-located join — the standing
    * answer to "this fact-fact join shuffles every run": both sides
    * are written `bucketBy(8, key).sortBy(key)` (hash-partitioned and
    * sorted ON DISK), so the forced sort-merge join consumes the
    * bucket layout directly — zero ShuffleExchange, zero Sort in the
    * join subtree (SqlPlanSpec pins both). At 100 TB this turns every
    * recurring join/agg on the bucket key from a full-corpus shuffle
    * into a local merge — the amortize-the-shuffle-once pattern.
    */
  val c16BucketedJoin: Q = (s, d) => {
    // external tables under the per-JVM scratch root: a stale managed
    // location in spark-warehouse from a previous JVM can't collide
    s.sql("DROP TABLE IF EXISTS c16_orders_b")
    s.sql("DROP TABLE IF EXISTS c16_lineitem_b")
    // Spark ≥3.0 stopped reporting sorted output from bucketed scans
    // by default (a bucket split across files has no global order —
    // SPARK-28583); the repartition below guarantees ONE file per
    // bucket, which is exactly the condition under which the legacy
    // trust is sound, so the conf is turned on here to complete the
    // demonstration (only bucketed scans read it; c16 owns the only
    // bucketed tables in the engine)
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    // repartition on the bucket key before writing: one file per
    // bucket is the condition under which the scan TRUSTS the on-disk
    // sort (multi-file buckets force a defensive re-sort); the write-
    // side shuffle is the one-time cost the layout amortizes
    orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
      .repartition(8, col("o_orderkey"))
      .write.mode("overwrite").format("parquet")
      .option("path", scratchDir("c16_orders_b"))
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("c16_orders_b")
    lineitem(s, d).select(col("l_orderkey"), col("l_quantity"),
                          col("l_returnflag"))
      .repartition(8, col("l_orderkey"))
      .write.mode("overwrite").format("parquet")
      .option("path", scratchDir("c16_lineitem_b"))
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("c16_lineitem_b")
    s.table("c16_orders_b").hint("merge")
      .join(s.table("c16_lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("sum_qty"))
  }

  /** SCHEMA EVOLUTION on read (`mergeSchema`) — the data-lake reality
    * that a corpus accumulated over years is never one schema: an old
    * batch carries `o_totalprice`, a newer one dropped it and added
    * `o_orderpriority`. The merged read presents the UNION schema with
    * nulls where a batch lacks the column, and the aggregation pattern
    * downstream code must use (`count(col)` / null-skipping sums, not
    * `count(*)`) is what the query reports per status. Merging footers
    * is a planning-time cost over file METADATA (per-file footer reads
    * are distributed); the scan itself stays columnar with constant
    * null vectors for absent columns — no row-level rewrite of old
    * batches, which at 100 TB is the entire point.
    */
  val c17MergeSchema: Q = (s, d) => {
    val out = scratchDir("c17_evolve")
    val o = orders(s, d)
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$out/b1")
    o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$out/b2")
    s.read.option("mergeSchema", "true").parquet(s"$out/b1", s"$out/b2")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("o_totalprice")).as("n_with_price"),
           count(col("o_orderpriority")).as("n_with_priority"),
           moneySum(col("o_totalprice")).as("sum_price"),
           min(col("o_orderpriority")).as("first_priority"))
  }

  /** SCD2 dimension build + point-in-time snapshot — the versioned-
    * data-management pattern (slowly-changing dimension, CDC compact)
    * over the event log: per user, consecutive same-state events
    * collapse to version rows (change detection via lag), each version
    * carries [valid_from, valid_to) from its successor via lead, and a
    * probe timestamp reconstructs the as-of state — time travel over a
    * plain parquet log, no table format required.
    *
    * Scale shape: both window passes partition by user_id — ONE hash
    * exchange on the natural key, then two in-partition sorted scans;
    * the probe instant derives from the global (min, max) epoch-micros
    * midpoint, a one-row aggregate broadcast back (integer micros, so
    * both engines compute the identical instant — no interval
    * arithmetic). The final report is a K-valued hash agg on state.
    * At 100 TB the event log shuffles once by entity and every
    * partition builds its dimension slice independently — the same
    * one-exchange discipline as w2/w10.
    */
  val c18Scd2Snapshot: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, d)
      .select(col("user_id"), col("event_type").as("state"),
              expr("unix_micros(ts)").as("us"), col("event_id"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val versions = ev
      .withColumn("prev_state", lag(col("state"), 1).over(byUser))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
      .withColumn("valid_from", col("us"))
      .withColumn("valid_to", lead(col("us"), 1).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("valid_from"), col("event_id"))))
    val probe = events(s, d).agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2").as("p_us"))
    versions.crossJoin(broadcast(probe))
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n_versions"),
           sum(col("valid_to").isNull.cast("long")).as("n_current"),
           sum((col("valid_from") <= col("p_us") &&
                (col("valid_to").isNull || col("valid_to") > col("p_us")))
             .cast("long")).as("n_at_probe"),
           sum(when(col("valid_to").isNotNull,
                    col("valid_to") - col("valid_from")))
             .as("closed_dur_us"),
           min(col("user_id")).as("min_user"))
  }

  /** CDC upsert/delete MERGE — the incremental-ingest compaction a
    * lakehouse runs per batch, expressed as a plain keyed full-outer
    * join (no table format required): the change batch carries
    * insert/update/delete ops, the merged snapshot keeps untouched
    * base rows, applies updates over matches, appends inserts, and
    * drops deletes. The change batch is derived deterministically from
    * the base table (updates: keys ≡ 3 mod 10 with a price bump and
    * forced status; deletes: keys ≡ 7 mod 10; inserts: fresh keys in
    * the negative id space — d13's collision-free convention).
    *
    * Scale shape: ONE co-partitioned join on the merge key — with the
    * snapshot bucketed by key (the c16 layout) the base side never
    * re-shuffles and a small change batch broadcasts; the report is a
    * K-valued hash agg. Every engine-level MERGE INTO (Delta/Iceberg)
    * lowers to exactly this plan.
    */
  val c19UpsertMerge: Q = (s, d) => {
    val base = orders(s, d).select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
      col("o_totalprice").as("price"))
    // money rides as exact DECIMAL(18,2) through the merge (the Num
    // discipline): the +100 update lands in decimal, never double
    val changes = base
      .filter(col("k") % 10 === 3 || col("k") % 10 === 7)
      .select(col("k"),
              when(col("k") % 10 === 3, lit("U")).otherwise(lit("D"))
                .as("op"),
              lit("X").as("new_status"),
              (dec2(col("price")) + lit(100)).as("new_price"))
      .unionByName(
        base.filter(col("k") % 100 === 11).select(
          (-col("k")).as("k"), lit("I").as("op"),
          lit("N").as("new_status"),
          (dec2(col("price")) + lit(0)).as("new_price")))
    val merged = base.join(changes, Seq("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("k"),
              when(col("op").isNotNull, col("new_status"))
                .otherwise(col("status")).as("status"),
              when(col("op").isNotNull, col("new_price"))
                .otherwise(dec2(col("price")) + lit(0)).as("price"))
    merged.groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
           round(sum(col("price")).cast("double"), 2).as("sum_price"),
           min(col("k")).as("min_key"),
           max(col("k")).as("max_key"))
  }

  /** Z-ORDER clustering — the multi-dimensional layout complement to
    * c15 (one-dim directory pruning) and c16 (one-key bucketing): when
    * queries filter on TWO columns (user and time), sorting on either
    * one leaves the other scattered across every file. Interleaving
    * the bits of both dimensions (Morton code) and range-partitioning
    * on the code gives every file a bounded BOX in (user, time) space,
    * so parquet min/max row-group stats prune on BOTH predicates.
    *
    * The query itself proves the locality property exactly: user_id
    * and event time each bucket to 32 levels (pure integer math both
    * engines replay), the 10-bit z-code is written out range-
    * partitioned, and the read-back rolls up per top-4-bit z-cell —
    * each cell is by construction an 8×8 box, so min/max of both
    * dimensions inside every cell land within a span of 8 (visible in
    * the result, asserted by LayoutSpec per FILE, where the tb-sorted
    * counter-layout spans the full user range in every file).
    *
    * Scale shape: coding is map-only over the scan (one one-row
    * min/max broadcast for the time bounds); the write is ONE range
    * exchange on the code — the same one-time layout cost as c16,
    * amortized by every later two-predicate scan skipping all but
    * O(selected boxes) of the corpus.
    */
  /** The (event, user-bucket, time-bucket, z-code) stream c20 writes —
    * exposed so LayoutSpec can write the z layout and a single-dim
    * counter-layout from the identical input and compare per-file
    * pruning power.
    */
  private[graft] def c20Coded(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val bounds = ev.agg(expr("min(unix_micros(ts))").as("lo"),
                        expr("max(unix_micros(ts)) + 1").as("hi"))
    ev.select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("us"))
      .crossJoin(broadcast(bounds))
      .withColumn("ub", col("user_id") % 32)
      .withColumn("tb", expr("((us - lo) * 32) DIV (hi - lo)"))
      // every bit term fully parenthesized: &/<</| precedence is NOT
      // the same across SQL dialects, and an unparenthesized mix
      // silently builds a different code in each engine
      .withColumn("z", expr(
        """(tb & 1) | ((tb & 2) << 1) | ((tb & 4) << 2) | ((tb & 8) << 3) |
          |((tb & 16) << 4) |
          |((ub & 1) << 1) | ((ub & 2) << 2) | ((ub & 4) << 3) |
          |((ub & 8) << 4) | ((ub & 16) << 5)""".stripMargin))
      .select(col("event_id"), col("ub"), col("tb"), col("z"))
  }

  val c20ZorderLayout: Q = (s, d) => {
    val out = scratchDir("c20_zorder")
    c20Coded(s, d)
      .repartitionByRange(16, col("z"), col("event_id"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .groupBy(expr("z DIV 64").as("z_cell"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ub")).as("min_ub"), max(col("ub")).as("max_ub"),
           min(col("tb")).as("min_tb"), max(col("tb")).as("max_tb"),
           min(col("event_id")).as("min_event"))
  }

  /** Data-quality EXPECTATIONS — the constraint-validation pass a
    * training-data pipeline runs before ingest (uniqueness, non-null,
    * referential integrity, accepted ranges), reported as one row per
    * check with checked/violation counts. A corpus at 100 TB cannot be
    * eyeballed; this table is the contract.
    *
    * Scale shape: all range/null checks on a table fuse into ONE
    * conditional-sum scan (a single agg, no per-check passes), fanned
    * to rows by `stack` — two scans total for two tables; the FK check
    * is the one keyed anti join (broadcast when the PK side's key
    * column is small, co-partitioned otherwise). Nothing here is a
    * second pass over the corpus per expectation, which is how these
    * checks are naively written and why they then get skipped in
    * production.
    */
  val c21Expectations: Q = (s, d) => {
    val li = lineitem(s, d)
    val o = orders(s, d)
    val liChecks = li.agg(
        count(lit(1)).as("n"),
        sum((col("l_quantity") < 1 || col("l_quantity") > 50).cast("long"))
          .as("v_qty"),
        sum((col("l_discount") < 0 || col("l_discount") > 0.1).cast("long"))
          .as("v_disc"),
        sum((col("l_extendedprice") <= 0).cast("long")).as("v_price"),
        sum((col("l_linenumber") < 1 || col("l_linenumber") > 7).cast("long"))
          .as("v_line"))
      .select(expr(
        """stack(4,
          |  'li_quantity_in_1_50', n, v_qty,
          |  'li_discount_in_0_10pct', n, v_disc,
          |  'li_price_positive', n, v_price,
          |  'li_linenumber_in_1_7', n, v_line)
          |AS (check_name, n_checked, n_violations)""".stripMargin))
    val oChecks = o.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup"),
        sum(col("o_custkey").isNull.cast("long")).as("v_cust"),
        sum((col("o_totalprice") <= 0).cast("long")).as("v_total"),
        sum((col("o_orderdate") < lit("1990-01-01").cast("date") ||
             col("o_orderdate") > lit("2000-01-01").cast("date")).cast("long"))
          .as("v_date"))
      .select(expr(
        """stack(4,
          |  'o_orderkey_unique', n, v_dup,
          |  'o_custkey_not_null', n, v_cust,
          |  'o_totalprice_positive', n, v_total,
          |  'o_orderdate_in_decade', n, v_date)
          |AS (check_name, n_checked, n_violations)""".stripMargin))
    val liN = li.agg(count(lit(1)).as("n_checked"))
    val fk = li.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(liN))
      .select(lit("li_orderkey_fk_orders").as("check_name"),
              col("n_checked"), col("n_violations"))
    liChecks.unionByName(oChecks).unionByName(fk)
      .withColumn("passed", col("n_violations") === 0)
  }

  /** INCREMENTAL aggregate maintenance — the materialized-view refresh
    * pattern: yesterday's aggregate state is a persisted TABLE of
    * mergeable partials (count + decimal sum per group), today's delta
    * batch aggregates alone, and the refreshed view is the union of
    * partials re-aggregated — cost O(delta + groups), never a
    * recompute over the full corpus. The oracle IS the full recompute,
    * so the gate proves merge ≡ recompute exactly (the decimal sums
    * make the merge order-independent; avg derives from the merged
    * partials, never averaged-of-averages).
    */
  val c22IncrementalAgg: Q = (s, d) => {
    val out = scratchDir("c22_state")
    val o = orders(s, d).select(col("o_orderstatus").as("st"),
                                col("o_orderkey").as("k"),
                                dec2(col("o_totalprice")).as("p"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("st")).agg(count(lit(1)).as("n"), sum(col("p")).as("sp"))
    // yesterday's state persisted and read back: the refresh consumes
    // the TABLE, not the plan that built it
    partial(o.filter(col("k") % 10 =!= 9)).write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .unionByName(partial(o.filter(col("k") % 10 === 9)))
      .groupBy(col("st"))
      .agg(sum(col("n")).as("n_rows"), sum(col("sp")).as("sp"))
      .select(col("st").as("o_orderstatus"), col("n_rows"),
              round(col("sp").cast("double"), 2).as("sum_price"),
              round((col("sp").cast("double") / col("n_rows")), 2)
                .as("avg_price"))
  }

  /** Semi-structured analytics over the VARIANT type (Spark 4's
    * binary-encoded JSON, the Snowflake/Databricks semi-structured
    * column shape): each event's heterogeneous payload — nested object,
    * array, and the raw `props` JSON — is assembled into one JSON
    * document, parsed ONCE into a variant, and then path-extracted with
    * typed `variant_get` calls (plus `try_variant_get` pinning the
    * missing-path → NULL contract). Both engines build the identical
    * JSON string from the same columns, so the oracle replays the
    * extraction with DuckDB's json_extract over the same documents.
    *
    * Scale shape: parse_json is one map-side pass producing the
    * shredded binary encoding; every downstream variant_get reads the
    * encoded value without re-parsing text — at 100 TB the JSON text is
    * parsed exactly once per row, and the K-group aggregate is the only
    * exchange.
    */
  val c24VariantJson: Q = (s, d) =>
    events(s, d)
      .withColumn("j", concat(
        lit("{\"u\":{\"id\":"), col("user_id"),
        lit("},\"t\":\""), col("event_type"),
        lit("\",\"arr\":["), col("event_id") % 7, lit(","), col("user_id") % 5,
        lit("],\"p\":"), col("props"), lit("}")))
      .withColumn("v", expr("parse_json(j)"))
      .select(
        expr("variant_get(v, '$.t', 'string')").as("etype"),
        expr("variant_get(v, '$.u.id', 'bigint')").as("uid"),
        expr("variant_get(v, '$.arr[1]', 'bigint')").as("a1"),
        expr("variant_get(v, '$.p.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("miss"))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           max(col("uid")).as("max_uid"),
           sum(col("a1")).as("sum_a1"),
           count(col("miss")).as("n_missing_nonnull"))

  /** SQL pipe syntax (Spark 4's `|>` operator chain — the linear
    * dataflow form of SQL): scan |> filter |> derived column |>
    * aggregate |> final projection, planned by Catalyst into exactly
    * the plan the equivalent nested SELECT gets (pushdown, partial
    * aggregation and codegen all apply unchanged — the syntax is
    * front-end only). The oracle is that equivalent nested SELECT.
    */
  val c25PipeSql: Q = (s, d) => {
    lineitem(s, d).createOrReplaceTempView("c25_lineitem")
    s.sql(
      """FROM c25_lineitem
        ||> WHERE l_quantity < 25
        ||> EXTEND cast(l_extendedprice * (1 - l_discount) as decimal(22,4))
        |          AS disc_price
        ||> AGGREGATE count(1) AS n,
        |             sum(cast(l_quantity as decimal(18,2))) AS sq,
        |             sum(disc_price) AS sdp
        |   GROUP BY l_returnflag, l_linestatus
        ||> SELECT l_returnflag, l_linestatus, n,
        |          round(cast(sq as double), 2) AS sum_qty,
        |          round(cast(sdp as double), 4) AS revenue""".stripMargin)
  }

  /** SQL SCRIPTING (Spark 4's procedural BEGIN…END blocks): DECLARE'd
    * session variables, a WHILE loop driving per-iteration scalar
    * subqueries, and a final SELECT over the accumulated variables —
    * the stored-procedure-style control flow ETL schedulers lean on.
    * Each loop iteration is an ordinary Catalyst-planned query
    * (pushdown applies: the l_linenumber predicate reaches the scan);
    * the script only sequences them. The oracle collapses the loop to
    * its set-equivalent single aggregate — proving the iteration ≡
    * one-pass identity the loop relies on.
    */
  val c26SqlScripting: Q = (s, d) => {
    // ONE corpus pass pre-aggregates lineitem into a CACHED 7-row
    // per-linenumber summary; the WHILE loop's per-iteration scalar
    // subquery then reads 7 in-memory rows instead of re-planning +
    // re-scanning the corpus (the round-6 shape — 1.76 s of pure loop
    // overhead; this is also the only shape that survives 100 TB,
    // where a per-iteration table scan inside procedural control flow
    // is the classic anti-pattern). Each iteration is ONE
    // multi-variable SET (row-subquery assignment) rather than one
    // SET per accumulator: per-iteration cost is front-end planning,
    // so halving the statement count halves the loop's wall time
    // (round-7: 14 subqueries → 7). The scripting surface proven is
    // unchanged — DECLARE, WHILE, multi-assign SET, scalar
    // subqueries, final SELECT over the accumulated variables.
    lineitem(s, d)
      .groupBy(col("l_linenumber"))
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity").cast("long")).as("q"))
      .createOrReplaceTempView("c26_pre")
    val prev = s.conf.getOption("spark.sql.scripting.enabled")
    s.conf.set("spark.sql.scripting.enabled", "true")
    s.catalog.cacheTable("c26_pre")
    try s.sql(
      """BEGIN
        |  DECLARE ln INT DEFAULT 1;
        |  DECLARE n_acc BIGINT DEFAULT 0;
        |  DECLARE q_acc BIGINT DEFAULT 0;
        |  WHILE ln <= 7 DO
        |    SET (n_acc, q_acc) =
        |      (SELECT n_acc + coalesce(sum(n), 0),
        |              q_acc + coalesce(sum(q), 0) FROM c26_pre
        |       WHERE l_linenumber = ln);
        |    SET ln = ln + 1;
        |  END WHILE;
        |  SELECT n_acc AS n_rows, q_acc AS sum_qty, ln - 1 AS n_iters;
        |END""".stripMargin)
    finally {
      // scripting executes eagerly inside sql(), and the script's
      // final SELECT reads only session variables — safe to drop the
      // cache before the caller consumes the result
      s.catalog.uncacheTable("c26_pre")
      prev.fold(s.conf.unset("spark.sql.scripting.enabled"))(
        v => s.conf.set("spark.sql.scripting.enabled", v))
    }
  }

  /** PARAMETERIZED SQL — named-parameter binding (`:name` markers +
    * an args map), the injection-safe templating surface an
    * application embeds queries through. Binding happens at parse
    * time, so Catalyst sees literals: the predicate pushes to the
    * scan exactly as if inlined. The oracle IS the inlined query —
    * pinning that binding ≡ literal substitution.
    */
  val c27ParamSql: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("c27_orders")
    s.sql(
      """SELECT o_orderstatus, count(1) AS n, min(o_orderkey) AS min_key
        |FROM c27_orders
        |WHERE o_totalprice BETWEEN :lo AND :hi
        |  AND o_orderpriority <> :excl
        |GROUP BY o_orderstatus""".stripMargin,
      Map("lo" -> 1000, "hi" -> 150000, "excl" -> "1-URGENT"))
  }

  /** Case-insensitive semantics via Spark 4 string collations: the
    * grouping and equality key is `collate(k, 'UTF8_LCASE')`, so
    * 'ECONOMY' / 'economy' / 'Economy' land in ONE group with no
    * normalizing rewrite of the data — collation is metadata on the
    * comparison, and the plan stays the same single hash aggregate a
    * case-sensitive groupBy costs at 100 TB. The oracle (DuckDB has
    * no UTF8_LCASE) replays the semantics as GROUP BY lower(k). The
    * output key is min(lower(k)) on BOTH sides because a collated
    * group's passthrough representative is first-seen —
    * nondeterministic under parallel aggregation.
    */
  val c28Collation: Q = (s, d) => {
    val mixed = part(s, d).withColumn("k",
      expr("""CASE WHEN p_partkey % 3 = 0 THEN lower(p_type)
             |     WHEN p_partkey % 3 = 1 THEN p_type
             |     ELSE upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2))
             |END""".stripMargin))
    mixed
      // collated inequality filter: drops all case variants of STANDARD
      .filter(expr("collate(k, 'UTF8_LCASE') <> collate('Standard', 'UTF8_LCASE')"))
      .groupBy(expr("collate(k, 'UTF8_LCASE')").as("kc"))
      .agg(min(lower(col("k"))).as("k_ci"),
           count(lit(1)).as("n"),
           min(col("p_partkey")).as("min_pk"))
      .select(col("k_ci"), col("n"), col("min_pk"))
  }

  /** Deletion vectors (the lakehouse soft-delete mechanic: Delta DVs /
    * Iceberg positional deletes): a DELETE records the matching rows'
    * PHYSICAL positions — (file, row_index) — in a tiny sidecar and
    * rewrites nothing; readers apply the sidecar as an anti join on
    * position. The mechanism here is real, not simulated: the vector
    * is built from the built-in `_metadata.file_path`/`_metadata
    * .row_index` columns of the rows matching the delete predicate,
    * persisted as its own parquet sidecar, and the live table is
    * scan ⟕̸ sidecar ON POSITION (doc_id never drives the apply).
    * At 100 TB this is why DVs exist: DELETE costs O(deleted rows)
    * sidecar write instead of O(table) rewrite, and the apply is a
    * broadcast anti join riding the normal scan. The oracle replays
    * the SEMANTIC delete (doc_id % 7 = 0) — position-applied and
    * predicate-applied deletes must agree exactly.
    */
  val c29DeletionVectors: Q = (s, d) => {
    val data = scratchDir("c29_data")
    val dv = scratchDir("c29_dv")
    documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .repartition(4) // several data files → positions are per-file
      .write.mode("overwrite").parquet(data)
    val withPos = s.read.parquet(data)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))
    withPos.filter(col("doc_id") % 7 === 0)
      .select(col("fp"), col("ri"))
      .write.mode("overwrite").parquet(dv)
    withPos
      .join(broadcast(s.read.parquet(dv)), Seq("fp", "ri"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_live"),
           sum(col("n_chars")).cast("long").as("live_chars"),
           min(col("doc_id")).as("min_doc"))
  }

  /** Zone-map data skipping (the stats half of every lakehouse
    * manifest: Delta add-file stats / Iceberg manifests / ORC-style
    * min-max zones): files land range-clustered on doc_id, a MANIFEST
    * records each file's (min, max) — #files rows, driver-held like
    * every table format's metadata — and a point/range query prunes
    * to the files whose zone overlaps the predicate BEFORE the scan
    * plans; the residual filter still applies row-level. Distinct
    * from c15 (directory/partition-value pruning) and c20 (z-order
    * multi-column clustering): this is per-FILE stat pruning with no
    * partition scheme at all. At 100 TB the manifest read is O(files)
    * metadata, and a selective predicate scans only the overlapping
    * zone files — the skip ratio IS the clustering quality.
    * StatsSkippingSpec pins that the pruned plan reads 1 of 4 files
    * and equals the full scan + filter. The oracle replays the
    * semantic predicate over the logical table.
    */
  val c30StatsSkipping: Q = (s, d) => {
    val out = scratchDir("c30_data")
    val docs = documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // 4 range-clustered files (explicit bounds, not repartitionByRange's
    // sampled ones, so the layout is deterministic across runs)
    val bounded = docs.withColumn("b",
      (col("doc_id") * 4 / (maxId + 1)).cast("int"))
    (0 until 4).foreach { b =>
      bounded.filter(col("b") === b).drop("b").coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append").parquet(out)
    }
    graft.operators.Coverage.statsPrunedScan(s, out, 50L, 149L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
           sum(col("n_chars")).cast("long").as("sum_chars"),
           min(col("doc_id")).as("min_doc"))
  }

  /** Manifest build + zone-overlap prune + residual filter: the reader
    * half of c30, shared with StatsSkippingSpec so the spec pins the
    * exact plan the query runs.
    *
    * NOTE the manifest is REBUILT here by a full per-file min/max scan
    * (an O(data) aggregate) because plain parquet has nowhere to
    * persist it — a real table format (Delta/Iceberg) writes these
    * zone stats into the commit log at WRITE time, and this reader
    * would then be metadata-only. The collect() is #files rows, the
    * driver-held shape either way; only the manifest's PROVENANCE
    * differs from the real thing.
    */
  private[graft] def statsPrunedScan(
      s: SparkSession, dir: String, qlo: Long, qhi: Long): DataFrame = {
    val manifest = s.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("fp"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .collect() // #files rows: the driver-held manifest
    val survivors = manifest
      .filter(r => r.getAs[Long]("lo") <= qhi && r.getAs[Long]("hi") >= qlo)
      .map(_.getAs[String]("fp")).toSeq
    if (survivors.isEmpty)
      // every zone pruned: an empty relation WITH the scan's schema
      // (read.parquet(Nil) would throw "unable to infer schema")
      s.read.parquet(dir).filter(lit(false))
    else
      s.read.parquet(survivors: _*)
        .filter(col("doc_id").between(qlo, qhi))
  }

  /** Change data feed (the table_changes() read of Delta/Iceberg CDF):
    * given two MATERIALIZED snapshot versions of a keyed table (the
    * physical parquet versions a c23-style log points at), emit the
    * row-level change set v1→v2 — delete / insert / update with pre-
    * and post-images — as the snapshot diff: one full-outer join on
    * the key, change typed by null-side and value inequality. This is
    * exactly how CDF is DERIVED when the format didn't materialize a
    * change log; downstream incremental consumers (c22's shape) apply
    * it instead of re-reading the table. At 100 TB the diff shuffles
    * both versions once on the key — O(table) worst case but O(changed
    * files) in a real format where unchanged files are pruned by
    * manifest diff (c30's zone machinery) before the row diff runs.
    * The v1→v2 commit: cancelled orders (< 50k) deleted, the %3==0
    * survivors repriced (+10), the %3==2 partition inserted.
    */
  val c31ChangeDataFeed: Q = (s, d) => {
    val root = java.nio.file.Paths.get(scratchDir("c31_cdf"))
    def fs(n: String) = root.resolve(n).toString
    val o = orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    o.filter(col("k") % 3 < 2).write.mode("overwrite").parquet(fs("v1"))
    o.filter(col("k") % 3 < 2).filter(col("price") >= 50000)
      .withColumn("price",
        when(col("k") % 3 === 0, col("price") + 10).otherwise(col("price")))
      .unionByName(o.filter(col("k") % 3 === 2))
      .write.mode("overwrite").parquet(fs("v2"))
    val v1 = s.read.parquet(fs("v1")).withColumnRenamed("price", "pre")
    val v2 = s.read.parquet(fs("v2")).withColumnRenamed("price", "post")
    v1.join(v2, Seq("k"), "full_outer")
      .withColumn("change",
        when(col("post").isNull, "delete")
          .when(col("pre").isNull, "insert")
          .when(col("pre") =!= col("post"), "update")
          .otherwise("none"))
      .filter(col("change") =!= "none")
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n"),
           moneySum(col("pre")).as("sum_pre"),
           moneySum(col("post")).as("sum_post"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
  }

  val queries: Map[String, Q] = Map(
    "c31_change_data_feed" -> c31ChangeDataFeed,
    "c30_stats_skipping" -> c30StatsSkipping,
    "c29_deletion_vectors" -> c29DeletionVectors,
    "c28_collation" -> c28Collation,
    "c27_param_sql" -> c27ParamSql,
    "c26_sql_scripting" -> c26SqlScripting,
    "c24_variant_json" -> c24VariantJson,
    "c25_pipe_sql" -> c25PipeSql,
    "c23_time_travel" -> c23TimeTravel,
    "c22_incremental_agg" -> c22IncrementalAgg,
    "c21_expectations" -> c21Expectations,
    "c20_zorder_layout" -> c20ZorderLayout,
    "c19_upsert_merge" -> c19UpsertMerge,
    "c18_scd2_snapshot" -> c18Scd2Snapshot,
    "c17_merge_schema" -> c17MergeSchema,
    "c15_partitioned_prune" -> c15PartitionedPrune,
    "c16_bucketed_join" -> c16BucketedJoin,
    "c14_unpivot" -> c14Unpivot,
    "c13_xml_roundtrip" -> c13XmlRoundtrip,
    "c12_orc_roundtrip" -> c12OrcRoundtrip,
    "c32_avro_roundtrip" -> c32AvroRoundtrip,
    "c1_arg_max" -> c1ArgMax,
    "c2_shuffle_hash_hint" -> c2ShuffleHashHint,
    "c3_union_by_name" -> c3UnionByName,
    "c4_date_arithmetic" -> c4DateArithmetic,
    "c5_right_outer" -> c5RightOuter,
    "c6_decode" -> c6Decode,
    "c7_having" -> c7Having,
    "c8_pivot" -> c8Pivot,
    "c9_map_functions" -> c9MapFunctions,
    "c10_csv_roundtrip" -> c10CsvRoundtrip,
    "c11_json_roundtrip" -> c11JsonRoundtrip,
  )

  val oracles: Map[String, String] = Map(
    // the snapshot diff replayed from the semantic version definitions
    "c31_change_data_feed" ->
      s"""WITH v1 AS (SELECT o_orderkey AS k, o_totalprice AS pre
         |            FROM orders WHERE o_orderkey % 3 < 2),
         |v2 AS (SELECT o_orderkey AS k,
         |         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
         |              ELSE o_totalprice END AS post
         |       FROM orders
         |       WHERE o_orderkey % 3 < 2 AND o_totalprice >= 50000
         |       UNION ALL
         |       SELECT o_orderkey, o_totalprice FROM orders
         |       WHERE o_orderkey % 3 = 2),
         |df AS (SELECT coalesce(v1.k, v2.k) AS k, pre, post,
         |         CASE WHEN post IS NULL THEN 'delete'
         |              WHEN pre IS NULL THEN 'insert'
         |              WHEN pre <> post THEN 'update'
         |              ELSE 'none' END AS change
         |       FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
         |SELECT change, count(1) AS n,
         |  ${sqlMoneySum("pre")} AS sum_pre,
         |  ${sqlMoneySum("post")} AS sum_post,
         |  min(k) AS min_k, max(k) AS max_k
         |FROM df WHERE change <> 'none' GROUP BY change""".stripMargin,
    // the zone-pruned scan replayed as the semantic range predicate
    "c30_stats_skipping" ->
      """SELECT source, count(1) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc
        |FROM documents WHERE doc_id BETWEEN 50 AND 149
        |GROUP BY source""".stripMargin,
    // the position-applied delete replayed as its semantic predicate
    "c29_deletion_vectors" ->
      """SELECT source, count(1) AS n_live,
        |  CAST(sum(n_chars) AS BIGINT) AS live_chars,
        |  min(doc_id) AS min_doc
        |FROM documents WHERE doc_id % 7 <> 0
        |GROUP BY source""".stripMargin,
    // UTF8_LCASE collation replayed as GROUP BY lower(k)
    "c28_collation" ->
      """WITH m AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 3 = 0 THEN lower(p_type)
        |         WHEN p_partkey % 3 = 1 THEN p_type
        |         ELSE upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2))
        |    END AS k
        |  FROM part)
        |SELECT min(lower(k)) AS k_ci, count(1) AS n,
        |  min(p_partkey) AS min_pk
        |FROM m WHERE lower(k) <> lower('Standard')
        |GROUP BY lower(k)""".stripMargin,
    // the parameters inlined as literals
    "c27_param_sql" ->
      """SELECT o_orderstatus, count(1) AS n, min(o_orderkey) AS min_key
        |FROM orders
        |WHERE o_totalprice BETWEEN 1000 AND 150000
        |  AND o_orderpriority <> '1-URGENT'
        |GROUP BY o_orderstatus""".stripMargin,
    // the WHILE loop collapsed to its set-equivalent single aggregate
    "c26_sql_scripting" ->
      """SELECT count(1) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  7 AS n_iters
        |FROM lineitem WHERE l_linenumber BETWEEN 1 AND 7""".stripMargin,
    // the identical JSON document built from the same columns, paths
    // replayed with json_extract; missing path → NULL on both engines
    "c24_variant_json" ->
      """WITH j AS (SELECT '{"u":{"id":' || user_id || '},"t":"' ||
        |    event_type || '","arr":[' || event_id % 7 || ',' ||
        |    user_id % 5 || '],"p":' || props || '}' AS j FROM events)
        |SELECT json_extract_string(j, '$.t') AS etype, count(1) AS n,
        |  CAST(sum(CAST(json_extract(j, '$.p.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  max(CAST(json_extract(j, '$.u.id') AS BIGINT)) AS max_uid,
        |  CAST(sum(CAST(json_extract(j, '$.arr[1]') AS BIGINT)) AS BIGINT)
        |    AS sum_a1,
        |  CAST(count(CAST(json_extract(j, '$.missing') AS BIGINT)) AS BIGINT)
        |    AS n_missing_nonnull
        |FROM j GROUP BY 1""".stripMargin,
    // the pipe chain as its nested-SELECT equivalent
    "c25_pipe_sql" ->
      s"""SELECT l_returnflag, l_linestatus, count(1) AS n,
         |  ${sqlMoneySum("l_quantity")} AS sum_qty,
         |  ${sqlProdSum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem WHERE l_quantity < 25
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // the same integer bucketing + bit interleave, rolled up per
    // top-4-bit cell — the parquet round-trip is lossless so the
    // layout write drops out of the result
    "c20_zorder_layout" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) + 1 AS hi
        |           FROM events),
        |c AS (SELECT event_id, user_id % 32 AS ub,
        |        ((epoch_us(ts) - lo) * 32) // (hi - lo) AS tb
        |      FROM events CROSS JOIN b),
        |z AS (SELECT event_id, ub, tb,
        |        (tb & 1) | ((tb & 2) << 1) | ((tb & 4) << 2) |
        |        ((tb & 8) << 3) | ((tb & 16) << 4) |
        |        ((ub & 1) << 1) | ((ub & 2) << 2) | ((ub & 4) << 3) |
        |        ((ub & 8) << 4) | ((ub & 16) << 5) AS z
        |      FROM c)
        |SELECT z // 64 AS z_cell, count(1) AS n_events,
        |  min(ub) AS min_ub, max(ub) AS max_ub,
        |  min(tb) AS min_tb, max(tb) AS max_tb,
        |  min(event_id) AS min_event
        |FROM z GROUP BY 1""".stripMargin,
    // each check replayed as a scalar aggregate; FK as NOT IN
    "c21_expectations" ->
      """WITH li AS (SELECT count(1) AS n,
        |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |             THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
        |             THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
        |    CAST(sum(CASE WHEN l_extendedprice <= 0
        |             THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |    CAST(sum(CASE WHEN l_linenumber < 1 OR l_linenumber > 7
        |             THEN 1 ELSE 0 END) AS BIGINT) AS v_line
        |  FROM lineitem),
        |o AS (SELECT count(1) AS n,
        |    count(1) - count(DISTINCT o_orderkey) AS v_dup,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS v_cust,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS v_total,
        |    CAST(sum(CASE WHEN o_orderdate < DATE '1990-01-01'
        |                    OR o_orderdate > DATE '2000-01-01'
        |             THEN 1 ELSE 0 END) AS BIGINT) AS v_date
        |  FROM orders),
        |fk AS (SELECT (SELECT count(1) FROM lineitem) AS n,
        |    (SELECT count(1) FROM lineitem WHERE l_orderkey NOT IN
        |       (SELECT o_orderkey FROM orders)) AS v
        |),
        |rows AS (
        |  SELECT 'li_quantity_in_1_50' AS check_name, n AS n_checked,
        |         v_qty AS n_violations FROM li
        |  UNION ALL SELECT 'li_discount_in_0_10pct', n, v_disc FROM li
        |  UNION ALL SELECT 'li_price_positive', n, v_price FROM li
        |  UNION ALL SELECT 'li_linenumber_in_1_7', n, v_line FROM li
        |  UNION ALL SELECT 'o_orderkey_unique', n, v_dup FROM o
        |  UNION ALL SELECT 'o_custkey_not_null', n, v_cust FROM o
        |  UNION ALL SELECT 'o_totalprice_positive', n, v_total FROM o
        |  UNION ALL SELECT 'o_orderdate_in_decade', n, v_date FROM o
        |  UNION ALL SELECT 'li_orderkey_fk_orders', n, v FROM fk)
        |SELECT check_name, n_checked, n_violations,
        |  n_violations = 0 AS passed
        |FROM rows""".stripMargin,
    // each snapshot replayed from the flat table: v1/v2 by the commit
    // partition rule, v3 as compaction-minus-deletes plus the append
    "c23_time_travel" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
        |v1 AS (SELECT * FROM base WHERE o_orderkey % 3 = 0),
        |v2 AS (SELECT * FROM base WHERE o_orderkey % 3 <= 1),
        |v3 AS (SELECT * FROM v2 WHERE o_totalprice >= 50000
        |       UNION ALL SELECT * FROM base WHERE o_orderkey % 3 = 2)
        |SELECT 1 AS version, count(1) AS n_rows,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_price, CAST(1 AS BIGINT) AS n_files FROM v1
        |UNION ALL
        |SELECT 2, count(1),
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2),
        |  2 FROM v2
        |UNION ALL
        |SELECT 3, count(1),
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2),
        |  2 FROM v3""".stripMargin,
    // merge ≡ recompute: the oracle aggregates the FULL table directly
    "c22_incremental_agg" ->
      """SELECT o_orderstatus, count(1) AS n_rows,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_price,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / count(1), 2) AS avg_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    // the merge replayed as its set-algebra equivalent: untouched base
    // rows + updated rows + inserts, deletes dropped; money in decimal
    "c19_upsert_merge" ->
      """WITH m AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |    CAST(o_totalprice AS DECIMAL(18,2)) + 0 AS price
        |  FROM orders WHERE o_orderkey % 10 NOT IN (3, 7)
        |  UNION ALL
        |  SELECT o_orderkey, 'X',
        |    CAST(o_totalprice AS DECIMAL(18,2)) + 100
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT -o_orderkey, 'N',
        |    CAST(o_totalprice AS DECIMAL(18,2)) + 0
        |  FROM orders WHERE o_orderkey % 100 = 11)
        |SELECT status, count(1) AS n_rows,
        |  round(CAST(sum(price) AS DOUBLE), 2) AS sum_price,
        |  min(k) AS min_key, max(k) AS max_key
        |FROM m GROUP BY status""".stripMargin,
    // identical SCD2 build: lag change-detect, lead validity interval,
    // integer-micros midpoint probe
    "c18_scd2_snapshot" ->
      """WITH ev AS (SELECT user_id, event_type AS state,
        |              epoch_us(ts) AS us, event_id FROM events),
        |v0 AS (SELECT *, lag(state) OVER
        |         (PARTITION BY user_id ORDER BY us, event_id)
        |         AS prev_state FROM ev),
        |v1 AS (SELECT user_id, state, us AS valid_from, event_id FROM v0
        |       WHERE prev_state IS NULL OR prev_state <> state),
        |v2 AS (SELECT *, lead(valid_from) OVER
        |         (PARTITION BY user_id ORDER BY valid_from, event_id)
        |         AS valid_to FROM v1),
        |pr AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
        |         AS p_us FROM events)
        |SELECT state, count(1) AS n_versions,
        |  CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_current,
        |  CAST(sum(CASE WHEN valid_from <= p_us
        |                 AND (valid_to IS NULL OR valid_to > p_us)
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_at_probe,
        |  CAST(sum(CASE WHEN valid_to IS NOT NULL
        |            THEN valid_to - valid_from END) AS BIGINT)
        |    AS closed_dur_us,
        |  min(user_id) AS min_user
        |FROM v2 CROSS JOIN pr GROUP BY state""".stripMargin,
    // the merged union-schema read ≡ per-batch CASE projections of
    // the flat table (column absent in a batch → NULL)
    "c17_merge_schema" ->
      s"""SELECT o_orderstatus, count(1) AS n_rows,
         |  CAST(count(CASE WHEN o_orderkey % 2 = 0 THEN 1 END) AS BIGINT)
         |    AS n_with_price,
         |  CAST(count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT)
         |    AS n_with_priority,
         |  ${sqlMoneySum("CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END")}
         |    AS sum_price,
         |  min(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END)
         |    AS first_priority
         |FROM orders GROUP BY o_orderstatus""".stripMargin,
    // a lossless partitioned round-trip ≡ the filter on the flat table
    "c15_partitioned_prune" ->
      """SELECT source, lang, count(1) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc
        |FROM documents WHERE source IN ('src3', 'src7')
        |GROUP BY source, lang""".stripMargin,
    // bucketed layout changes the PLAN, not the result
    "c16_bucketed_join" ->
      s"""SELECT o_orderstatus, l_returnflag, count(1) AS n,
         |  ${sqlMoneySum("l_quantity")} AS sum_qty
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderstatus, l_returnflag""".stripMargin,
    "c14_unpivot" ->
      s"""SELECT measure, count(1) AS n, ${sqlProdSum("val")} AS total
         |FROM (
         |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice
         |  FROM part
         |) UNPIVOT (val FOR measure IN (p_size, p_retailprice))
         |GROUP BY measure""".stripMargin,
    "c13_xml_roundtrip" ->
      s"""SELECT c_mktsegment, count(1) AS n,
         |  ${sqlMoneySum("c_acctbal")} AS total_bal,
         |  min(c_custkey) AS min_key
         |FROM customer WHERE c_custkey % 40 = 0
         |GROUP BY c_mktsegment""".stripMargin,
    "c12_orc_roundtrip" ->
      s"""SELECT l_returnflag, count(1) AS n,
         |  ${sqlMoneySum("l_extendedprice")} AS total,
         |  min(l_orderkey) AS min_key
         |FROM lineitem WHERE l_orderkey % 100 = 0
         |GROUP BY l_returnflag""".stripMargin,
    "c10_csv_roundtrip" ->
      s"""SELECT o_orderstatus, count(1) AS n,
         |  ${sqlMoneySum("o_totalprice")} AS total,
         |  min(o_orderkey) AS min_key
         |FROM orders WHERE o_orderkey % 50 = 0
         |GROUP BY o_orderstatus""".stripMargin,
    "c11_json_roundtrip" ->
      s"""SELECT event_type, count(1) AS n,
         |  ${sqlMoneySum("value")} AS total_value,
         |  min(event_id) AS min_event
         |FROM events WHERE event_id % 20 = 0
         |GROUP BY event_type""".stripMargin,
    "c32_avro_roundtrip" ->
      s"""SELECT p_brand, count(1) AS n,
         |  ${sqlMoneySum("p_retailprice")} AS total,
         |  min(p_partkey) AS min_key
         |FROM part WHERE p_partkey % 25 = 0
         |GROUP BY p_brand""".stripMargin,
    // struct-ordered arg-max has no direct DuckDB form → window oracle
    "c1_arg_max" ->
      """WITH mx AS (SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT a.o_orderpriority, a.o_orderkey AS dearest_key, b.o_orderkey AS cheapest_key
        |FROM mx a JOIN mx b ON a.o_orderpriority = b.o_orderpriority
        |WHERE a.rmax = 1 AND b.rmin = 1""".stripMargin,
    "c2_shuffle_hash_hint" ->
      s"""SELECT o_orderstatus, ${sqlMoneySum("l_quantity")} AS sum_qty, count(1) AS n
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderstatus""".stripMargin,
    "c3_union_by_name" ->
      s"""SELECT count(1) AS n, ${sqlMoneySum("bal")} AS sum_bal FROM (
         |  SELECT c_custkey AS k, c_acctbal AS bal FROM customer
         |  UNION ALL
         |  SELECT s_suppkey AS k, s_acctbal AS bal FROM supplier)""".stripMargin,
    "c4_date_arithmetic" ->
      """SELECT o_orderkey,
        | date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS age_days,
        | strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        | year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr
        |FROM orders WHERE o_orderkey % 37 = 0""".stripMargin,
    "c5_right_outer" ->
      """SELECT o_orderstatus, count(1) AS n_orders,
        | count(c_custkey) AS n_rich_customer_orders
        |FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000) c
        |RIGHT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY o_orderstatus""".stripMargin,
    "c6_decode" ->
      """SELECT lang, count(1) AS n,
        | count(1) AS n_roundtrip_ok,
        | CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY lang""".stripMargin,
    "c7_having" ->
      s"""SELECT o_custkey, count(1) AS n_orders, ${sqlMoneySum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY o_custkey HAVING count(1) >= 15""".stripMargin,
    "c8_pivot" ->
      s"""SELECT l_linestatus,
         | ${sqlMoneySum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_a,
         | ${sqlMoneySum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_n,
         | ${sqlMoneySum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_r
         |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "c9_map_functions" ->
      """SELECT event_id, 'k' AS first_key,
        | CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_value,
        | 2 AS m_size
        |FROM events
        |WHERE CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 25 = 3""".stripMargin,
  )
}
