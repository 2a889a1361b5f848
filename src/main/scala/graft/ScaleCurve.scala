package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-curve harness: turns the 100 TB scaling ARGUMENTS into
  * MEASUREMENTS. For each heavy operator it times the query at three
  * corpus sizes — sf0.01, sf0.1 and a generated ~sf1 (10× sf0.1) — and
  * fits the growth exponent e in t ∝ n^e between the two largest
  * scales (the smaller pair is fixed-DAG-cost dominated, which would
  * flatter the exponent). Sub-quadratic e is the claim under test: a
  * prefix/LSH dedup that silently degenerates to all-pairs shows up
  * here as e → 2 long before a cluster burns a day on it.
  *
  * The ~sf1 corpus is REPLICATION WITH DISJOINT STRUCTURE, modelling
  * how a real corpus grows (new content, longer history) rather than
  * bit-identical duplication (which would quadratically inflate every
  * dedup op by construction and measure the generator, not the plan):
  *  - documents: each copy suffixes every word with the copy id, so
  *    shingle vocabularies are disjoint across copies — near-dup pairs
  *    exist only within a copy and candidate structure is copy-local;
  *  - events: each copy shifts into its own disjoint time range (+1 h
  *    gap) with shifted user/event ids — constant event density and
  *    per-user stream shape, so interval windows and as-of chains
  *    never span copies;
  *  - embeddings: shifted vec ids, vectors unchanged (10× points per
  *    k-means cell — density growth is exactly what an ANN index sees).
  *
  * Writes SCALECURVE.json (committed to the repo); ScaleCurveSpec
  * asserts the fitted exponents from that artifact.
  */
object ScaleCurve {

  private val copies = 10

  def genSf1(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val done = new java.io.File(s"$outDir/_GEN_DONE")
    if (done.exists()) return
    // documents: per-copy word suffix → disjoint shingle vocabularies
    val docs = graft.sources.Tables.table(spark, srcDir, "documents")
    (0 until copies).map { c =>
      docs.select(
        (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1c$c").as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
                col("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // embeddings: id shift only
    val emb = graft.sources.Tables.table(spark, srcDir, "embeddings")
    (0 until copies).map { c =>
      emb.select((col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
                 col("embedding"), col("label"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // events: ts stays an int64 nanos column (Tables.events div-1000s
    // it the same way it handles the source TIMESTAMP(NANOS) files);
    // copies occupy disjoint time ranges so densities stay constant
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.sources.Tables.table(spark, srcDir, "events")
    val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
    val span = mm.getLong(1) - mm.getLong(0) + 3600000000000L // +1 h gap
    (0 until copies).map { c =>
      ev.select(
        (col("event_id") + lit(c.toLong * 1000000000L)).as("event_id"),
        (col("ts") + lit(c.toLong * span)).as("ts"),
        (col("user_id") + lit(c.toLong * 100000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    done.createNewFile()
    ()
  }

  // op → the table whose row count is the op's n; q13 (the composed
  // union+window as-of) rides along so the native q19's advantage is
  // measured ACROSS scales, not just at one point
  private val ops = Seq(
    "d8_prefix_join" -> "documents",
    "d9_dup_clusters" -> "documents",
    "d10_curate_canonical" -> "documents",
    "d11_decontaminate" -> "documents",
    "d12_chunk_dedup" -> "documents",
    "t14_corpus_pipeline" -> "documents",
    "n5_ivf_kmeans" -> "embeddings",
    "q13_join_asof" -> "events",
    "q19_asof_native" -> "events",
    "q24_interval_join" -> "events")

  private def time2(body: => Unit): Double = {
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    ts.min
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val gen = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      "/root/repo/target/scalecurve/sf1")
    val out = sys.env.getOrElse("SPARK_GRAFT_CURVE_OUT",
      "/root/repo/SCALECURVE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // partitions == cores, the Bench methodology this harness extends
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.parquet is TIMESTAMP(NANOS): the legacy conf must be set
    // before ANY events read in this session (row counts below read the
    // raw table), not just inside genSf1 (skipped when _GEN_DONE exists)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warmup
    genSf1(spark, s"$base/sf0.1", gen)
    val scales = Seq("sf0.01" -> s"$base/sf0.01", "sf0.1" -> s"$base/sf0.1",
                     "sf1" -> gen)
    val nRows: Map[(String, String), Long] = (for {
      (sfName, dir) <- scales
      t <- Seq("documents", "embeddings", "events")
    } yield (sfName, t) ->
        graft.sources.Tables.table(spark, dir, t).count()).toMap
    val series = ops.map { case (op, table) =>
      val fn = SparkEntry.queries(op)
      val pts = scales.map { case (sfName, dir) =>
        val sec = time2 { fn(spark, dir).count(); () }
        (sfName, nRows((sfName, table)), sec)
      }
      (op, table, pts)
    }
    // d8 candidate-count curve: the direct sub-quadratic evidence (no
    // timer noise) — candidates must grow ≈ linearly in this corpus
    val candPts = scales.map { case (sfName, dir) =>
      val c = graft.operators.Dedup.d8Candidates(
        graft.operators.Dedup.d8Ordered(spark, dir)).count()
      (sfName, nRows((sfName, "documents")), c)
    }
    def exponent(n1: Long, v1: Double, n2: Long, v2: Double): Double =
      math.log(math.max(v2, 1e-9) / math.max(v1, 1e-9)) /
        math.log(n2.toDouble / n1.toDouble)
    // Locale.ROOT: f"" uses the default locale, which would emit comma
    // decimals (invalid JSON) on non-dot-decimal JVMs
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val opJson = series.map { case (op, table, pts) =>
      val e = exponent(pts(1)._2, pts(1)._3, pts(2)._2, pts(2)._3)
      val ser = pts.map { case (sf, n, sec) =>
        s"""{"sf":"$sf","n":$n,"sec":${fmt(sec)}}""" }.mkString("[", ",", "]")
      s""""$op":{"table":"$table","series":$ser,"exp_sf01_sf1":${fmt(e)}}"""
    }.mkString(",")
    val candExp = exponent(candPts(1)._2, candPts(1)._3.toDouble,
                           candPts(2)._2, candPts(2)._3.toDouble)
    val candJson = candPts.map { case (sf, n, c) =>
      s"""{"sf":"$sf","n":$n,"candidates":$c}""" }.mkString("[", ",", "]")
    val json =
      s"""{"copies":$copies,"ops":{$opJson},""" +
      s""""d8_candidates":{"series":$candJson,"exp_sf01_sf1":${fmt(candExp)}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
