package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** d8_prefix_join invariants the oracle can't see:
  * - COMPLETENESS: the prefix filter loses no pairs — its verified
  *   output equals brute-force all-pairs Jaccard over the same token
  *   sets (the PPJoin prefix lemma, checked on real data);
  * - SCALE: the candidate set the filter emits is a small fraction of
  *   n(n-1)/2 (the whole point of prefix filtering — without this the
  *   operator silently degenerates to an all-pairs join).
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("d8 prefix filter finds exactly the brute-force pair set") {
    val t = Dedup.d8Build(spark, sf)._2
      .select(col("doc_id"), col("lang"), col("st"))
    val a = t.select(col("doc_id").as("a_id"), col("lang"),
                     col("st").as("a_t"))
    val b = t.select(col("doc_id").as("b_id"), col("st").as("b_t"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_t"), col("b_t"))))
      .withColumn("uni", size(col("a_t")) + size(col("b_t")) - col("inter"))
      .filter(col("inter") * 10 >= col("uni") * 7)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_pairs"), min(col("a_id")).as("min_a"))
      .collect().map(_.toString).toSet
    val got = Dedup.d8PrefixJoin(spark, sf).collect().map(_.toString).toSet
    assert(got == brute)
    assert(got.nonEmpty, "corpus should contain near-dup pairs")
  }

  test("connected components converge across multi-hop chains") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 → several propagation rounds),
    // separate pair {10,11}, triangle {20,21,22}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == want)
  }

  test("connected components match a driver-side union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // fixed seed — deterministic trials
    for (trial <- 1 to 5) {
      val n = 30
      val edges = (1 to 40)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.groupBy(x => find(x.toInt)).values
        .flatMap { grp => val m = grp.min; grp.map(_ -> m) }.toMap
      val got = Dedup.connectedComponents(edges.toDF("a", "b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial: distributed CC != union-find")
    }
  }

  test("d9 clusters partition the candidate-edge node set") {
    val out = Dedup.d9DupClusters(spark, sf).collect()
    assert(out.nonEmpty, "corpus should contain dup clusters")
    // every cluster id is its own minimum and sizes are >= 2 only if
    // an edge existed — all nodes here come from edges, so >= 2... a
    // size-1 cluster would mean a node lost its own label
    assert(out.forall(_.getLong(1) >= 2),
      "label propagation dropped a node's own label")
    assert(out.forall(r => r.getLong(2) > r.getLong(0)),
      "cluster root must be the minimum id in the cluster")
  }

  test("d12 chunk totals and boilerplate count reconcile with a window recount") {
    val out = Dedup.d12ChunkDedup(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("nc", expr(
        "cast(ceil(size(split(trim(text), '\\\\s+')) / 8.0) as bigint)"))
    // per-source chunk counts must add up to an independently computed
    // total (catches a dropped/duplicated explode row)
    val expChunks = docs.agg(sum(col("nc"))).head.getLong(0)
    assert(out.map(_.getAs[Long]("n_chunks")).sum == expChunks)
    // recompute the flagged count through a DIFFERENT mechanism — a
    // window count of distinct docs per RAW chunk string (no md5, no
    // join) — and require exact agreement with d12's groupBy+join path
    val ch = docs.select(col("doc_id"), explode(expr(
      """transform(sequence(0, cast(ceil(size(split(trim(text), '\\s+')) / 8.0) as int) - 1),
        |          i -> array_join(slice(split(trim(text), '\\s+'), i*8 + 1, 8), ' '))""".stripMargin))
      .as("chunk"))
    val flagged = ch
      .withColumn("nd", size(org.apache.spark.sql.functions.collect_set(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("chunk")))))
      .filter(col("nd") > 1).count()
    assert(flagged > 0, "corpus should contain cross-doc shared chunks")
    assert(out.map(_.getAs[Long]("n_boilerplate_chunks")).sum == flagged)
  }

  test("d13 bloom gate has no false negatives and a sane false-positive rate") {
    val rows = Dedup.d13BloomDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    // the bloom property under test: membership ground truth (the
    // ungated exact join) must never be missed by the sketch
    assert(rows.forall(_.getAs[Boolean]("fn_free")),
      "bloom filter produced a false negative")
    val nBatch = rows.map(_.getAs[Long]("n_batch")).sum
    val hits = rows.map(_.getAs[Long]("n_hits")).sum
    val dups = rows.map(_.getAs[Long]("n_true_dups")).sum
    assert(dups > 0, "re-crawl slice should guarantee true dups")
    assert(hits >= dups)
    // 200k bits for <20k items keeps FPR well under 10% of the batch
    assert(hits - dups <= nBatch / 10,
      s"false-positive rate too high: $hits hits, $dups true dups, $nBatch batch")
  }

  test("d13 raises the runtime bloom-filter conf caps to its sizing") {
    // bloom_filter_agg silently clamps its sizing to these confs via
    // Math.min — at driver scales the defaults (4M items) are ample,
    // so force the clamp into range by lowering them first and assert
    // d13 raises them back to >= its estimated sizing (10 bits/item)
    val items = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bits = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prev = Seq(items, bits).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(items, "1000")
      spark.conf.set(bits, "5000")
      Dedup.d13BloomDedup(spark, sf).collect()
      val gotItems = spark.conf.get(items).toLong
      val gotBits = spark.conf.get(bits).toLong
      assert(gotItems >= 20000L,
        s"maxNumItems not raised past the clamp: $gotItems")
      assert(gotBits >= 10 * gotItems || gotBits >= 200000L,
        s"maxNumBits not raised to 10 bits/item: $gotBits")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("d15's canonicalizer is idempotent and collapses every planted variant") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("url", Dedup.syntheticUrl)
      .withColumn("canon", Dedup.canonUrl(col("url")))
      .withColumn("canon2", Dedup.canonUrl(col("canon")))
    // idempotence: a second canonicalization pass is the identity —
    // the property that makes re-crawled canonical URLs stable keys
    val drift = docs.filter(col("canon") =!= col("canon2")).count()
    assert(drift == 0, s"$drift urls drift under a second canonicalization")
    // every canonical form is variant-free: lowercase host, no
    // fragment, no tracking params, no trailing slash
    val dirty = docs.filter(
      col("canon").rlike("[A-Z]|#|utm_") || col("canon").rlike("/$")).count()
    assert(dirty == 0, s"$dirty canonical urls retain variant markers")
  }

  test("d14's per-label accounting conserves the corpus") {
    val rows = SparkEntry.queries("d14_semdedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    // kept + removed = total within every label; labels cover the corpus
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed")
               == r.getAs[Long]("n_vecs"),
        s"label ${r.get(0)}: kept+removed != total")
    }
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    val corpus = graft.sources.Tables.embeddings(spark, sf).count()
    assert(total == corpus, s"labels cover $total of $corpus vectors")
  }

  test("d23's adaptive K bounds cell width where d14's fixed K cannot") {
    import spark.implicits._
    val rows = SparkEntry.queries("d23_semdedup_adaptive")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed")
               == r.getAs[Long]("n_vecs"),
        s"label ${r.get(0)}: kept+removed != total")
    }
    // the point of d23: with K = ceil(sqrt(N)) the widest cell stays
    // ~sqrt(N)-sized, so within-cell pair work per cell is bounded.
    // Replay the assignment at this corpus' K and pin max cell width
    // against the sqrt budget (generous constant: seeds are corpus
    // vectors, not fitted centroids, so cells are uneven but must not
    // approach the O(N)-wide cells fixed K=8 produces at scale).
    val e = graft.sources.Tables.embeddings(spark, sf)
    val n = e.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toLong
    val cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    val widest = e.crossJoin(broadcast(cents))
      .withColumn("csim",
        graft.functions.VectorFunctions.cosineSim(col("embedding"), col("ce")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("csim"), -col("cell"))).as("cell"))
      .groupBy(col("cell")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(widest <= 8 * math.ceil(math.sqrt(n.toDouble)).toLong,
      s"widest cell $widest vs sqrt budget for n=$n, k=$k")
  }

  test("d24's cell-blocked pairs are a subset of the exhaustive label-blocked pairs") {
    // d24 trades cross-cell recall for a bounded pair stage; the
    // trade's invariant is containment — per label it can never count
    // MORE sim>0.30 pairs than the exhaustive label-only join (d6's
    // shape at d24's threshold; d6's own 0.5 cut is empty on this
    // corpus, so the reference is computed here rather than via d6)
    val blocked = SparkEntry.queries("d24_embedding_dup_cells")(spark, sf)
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Long]("n_blocked_pairs")).toMap
    assert(blocked.nonEmpty, "blocked pair count should be non-vacuous")
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
    val a = e.select(col("vec_id").as("a_id"), col("label"),
                     col("embedding").as("a_e"))
    val b = e.select(col("vec_id").as("b_id"), col("label").as("b_label"),
                     col("embedding").as("b_e"))
    val exhaustive = a
      .join(b, col("label") === col("b_label") && col("a_id") < col("b_id"))
      .withColumn("sim", round(
        graft.functions.VectorFunctions.cosineSim(col("a_e"), col("b_e")), 6))
      .filter(col("sim") > 0.30)
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Long]("n")).toMap
    blocked.foreach { case (label, n) =>
      assert(n <= exhaustive.getOrElse(label, 0L),
        s"label $label: blocked $n > exhaustive ${exhaustive.get(label)}")
    }
  }

  test("d25's hierarchical blocks stay bounded and its report conserves the corpus") {
    val rows = SparkEntry.queries("d25_semdedup_hier")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed")
               == r.getAs[Long]("n_vecs"),
        s"label ${r.get(0)}: kept+removed != total")
    }
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    val e = graft.sources.Tables.embeddings(spark, sf)
    val n = e.count()
    assert(total == n, s"labels cover $total of $n vectors")
    // the point of the hierarchy: the pair stage's blocking key is
    // (coarse cell, sub-cell) and sub-seeds are ceil(sqrt(n_c)) per
    // coarse cell, so the widest block should track the coarse cell's
    // SQUARE ROOT, not its width. Replay both assignment levels and
    // pin the widest (cell, scell) block against a generous multiple
    // of the widest coarse cell's sqrt (seeds are corpus vectors, not
    // fitted centroids, so blocks are uneven but must not degenerate
    // back to coarse-cell width).
    import org.apache.spark.sql.expressions.Window
    val k1 = math.ceil(math.cbrt(n.toDouble)).toLong
    val cents = e.filter(col("vec_id") < k1)
      .select(col("vec_id").as("cell"),
              col("embedding").cast("array<double>").as("ce"))
    val coarse = e.crossJoin(broadcast(cents))
      .withColumn("csim",
        graft.functions.VectorFunctions.cosineSim(col("embedding"), col("ce")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("csim"), -col("cell"))).as("cell"),
           first(col("embedding")).as("emb"))
    val byCell = Window.partitionBy(col("cell"))
    val subSeeds = coarse
      .withColumn("srk", row_number().over(byCell.orderBy(col("vec_id"))))
      .withColumn("nc", count(lit(1)).over(byCell))
      .filter(col("srk") <= ceil(sqrt(col("nc"))))
      .select(col("cell").as("s_cell"), col("vec_id").as("scell"),
              col("emb").cast("array<double>").as("se"))
    val blocks = coarse.join(subSeeds, col("cell") === col("s_cell"))
      .withColumn("csim2",
        graft.functions.VectorFunctions.cosineSim(col("emb"), col("se")))
      .groupBy(col("vec_id"))
      .agg(first(col("cell")).as("cell"),
           max_by(col("scell"), struct(col("csim2"), -col("scell")))
             .as("scell"))
      .groupBy(col("cell"), col("scell")).count()
    val widestBlock = blocks.agg(max(col("count"))).head().getLong(0)
    val widestCoarse = coarse.groupBy(col("cell")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(widestBlock <= 8 * math.ceil(math.sqrt(widestCoarse.toDouble)).toLong,
      s"widest (cell, scell) block $widestBlock vs sqrt budget of widest " +
        s"coarse cell $widestCoarse (n=$n, k1=$k1)")
  }

  test("d8 candidate pairs are a small fraction of all-pairs") {
    val (prefix, sets, parts) = Dedup.d8Build(spark, sf)
    val n = sets.count()
    val allPairs = n * (n - 1) / 2
    val cand = Dedup.d8Candidates(prefix, parts).count()
    // measured: 28 candidates vs 124,750 all-pairs at this corpus —
    // the 1% bound leaves room for fixture drift while still failing
    // loudly if the filter ever degenerates toward all-pairs
    assert(cand * 100 < allPairs,
      s"prefix filter degenerated: $cand candidates vs $allPairs all-pairs")
  }
}

/** d17 substring-dedup invariants beyond the oracle compare: the
  * windowing covers every document, the dup fraction is a true
  * fraction, and the stride-16/width-32 overlap guarantee holds — any
  * two documents sharing a verbatim run of >= 47 chars MUST collide on
  * at least one window (a 47-run contains a full aligned 32-window for
  * any alignment of the 16-stride grid).
  */
class SubstringDedupSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("window accounting is a true fraction and covers all docs") {
    import org.apache.spark.sql.functions._
    val rows = operators.Dedup.queries("d17_substring_dedup")(spark, sf)
      .collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs,
      "per-source doc counts must tile the corpus")
    rows.foreach { r =>
      val (wins, dups, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dups <= wins && ppm >= 0 && ppm <= 1000000,
        s"dup accounting out of range: $r")
      assert(ppm == dups * 1000000L / wins, s"ppm must derive from counts: $r")
    }
  }

  test("a shared 47-char run is guaranteed to collide on some window") {
    // construct the guarantee's worst case directly against the same
    // windowing arithmetic: for every alignment offset of a 47-char
    // shared run relative to the stride grid, some stride-16 window
    // start falls at least fully inside the run
    for (off <- 0 until 16) {
      val runStart = 100 + off          // shared run at arbitrary alignment
      val runEnd = runStart + 47 - 1
      val starts = Iterator.from(1, 16).takeWhile(_ <= runEnd - 31)
      assert(starts.exists(s => s >= runStart && s + 31 <= runEnd),
        s"no aligned window inside a 47-run at offset $off")
    }
  }
}

/** d18 content-defined chunking: the EDIT-LOCALITY property that
  * justifies CDC over fixed grids (d12/d17) — an insertion changes the
  * chunks it touches, while every chunk whose window context lies
  * beyond the edit re-synchronizes to identical boundaries and hashes.
  * Replayed in plain Scala with the exact boundary rule the query and
  * its oracle share (md5 of the 8-char window, first hex nibble 0).
  */
class CdcChunkSpec extends org.scalatest.funsuite.AnyFunSuite {
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def chunks(text: String): Seq[String] = {
    val n = text.length
    val starts = (1 to math.max(n - 7, 1)).filter { p =>
      p == 1 || md5hex(text.substring(p - 1, p - 1 + 8)).startsWith("0")
    }
    (starts :+ (n + 1)).sliding(2).map {
      case Seq(a, b) => text.substring(a - 1, b - 1)
    }.toSeq
  }

  test("chunks tile the document exactly") {
    val text = (1 to 200).map(i => s"w$i").mkString(" ")
    assert(chunks(text).mkString == text)
  }

  test("an insertion leaves chunks beyond the edit window unchanged") {
    val text = (1 to 400).map(i => s"token$i").mkString(" ")
    val edited = text.substring(0, 50) + "INSERTED " + text.substring(50)
    val orig = chunks(text)
    val after = chunks(edited)
    assert(orig.size >= 4, s"corpus too small to test resync: ${orig.size}")
    // every original chunk whose content starts beyond the edit's
    // resync horizon (edit position + window width) must survive
    // verbatim in the edited chunking
    val afterSet = after.toSet
    val survivors = orig.drop(2).count(afterSet.contains)
    assert(survivors >= orig.size - 3,
      s"CDC lost downstream chunks: ${survivors} of ${orig.size - 2} survived")
    // and a fixed-offset grid over the same edit keeps (almost) none:
    // the insertion shifts every downstream 32-grid window
    def grid(t: String) = t.grouped(32).toSeq
    val gridSurvivors = grid(text).drop(2).count(grid(edited).toSet.contains)
    assert(gridSurvivors <= 1,
      "fixed grid unexpectedly survived the shift — test premise broken")
  }
}
