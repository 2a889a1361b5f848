package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.DeterministicHash.h32Local

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Two paths (SURVEY.md §2.12 / BASELINE.json north star):
  * - n1: brute-force cosine top-k — the correctness baseline. Scales as
  *   |Q|×|C|; fine when the query set is small and broadcast.
  * - n2: random-hyperplane LSH (SimHash for vectors): 4 deterministic
  *   hyperplanes → 16 buckets; candidates only within a bucket. At
  *   100 TB the bucket id becomes the shuffle/partition key, turning
  *   ANN into a groupBy — the bucketing cost is one map pass.
  *
  * Dot products fold left-to-right in doubles on both engines, so the
  * oracle comparison is exact (no float-order nondeterminism).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic pseudo-random hyperplanes via the shared md5-prefix
    * hash — reproducible in SQL, no RNG.
    */
  private[graft] def plane(j: Int, dims: Int): Seq[Double] =
    (0 until dims).map(i => (h32Local(s"$j:$i") % 2001 - 1000) / 1000.0)

  private val dims = 64
  private val nPlanes = 4

  /** Pair similarities use the native codegen'd CosineSimilarity
    * expression (one fused pass, no intermediate arrays — see
    * graft.functions.CosineSimilarity); the fold order matches these
    * HOF forms exactly, so either computes bit-identical doubles.
    * The HOF fold is kept for the hyperplane projections, whose plane
    * side is a double-array literal (and runs once per vector, not per
    * pair).
    */
  // r14 (guide §4): the composed fold
  //   aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0.0, +)
  // evaluated TWO interpreted lambdas per element and materialized the
  // product array per pair — and n9 runs it per JOINED ROW (|Q| × N
  // candidate stream). The native dot_product kernel is one generated
  // loop with the identical left-to-right double fold (PairFoldSpec
  // pins bit equality against the composed form; the oracle replays
  // the composed SQL unchanged).
  private def dotCol(a: String, b: String): Column =
    graft.functions.VectorFunctions.dotProduct(col(a), col(b))

  /** Brute-force cosine top-5 for query vectors (vec_id < 8). */
  val n1BruteTopK: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    // broadcast the (small, fixed) query set and stream the corpus —
    // the build side must be the one that does NOT grow with the data
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosineSim(col("qe"), col("ce")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("cid"), col("sim"), col("rnk"))
  }

  /** Sign-bit LSH bucket id of the `embedding` column — ONE definition
    * shared by n2 and n3 (and mirrored by sqlBucket): the two queries'
    * bucket ids must stay bit-identical or n3's candidate sets silently
    * diverge from n2's published histogram.
    */
  private def bucketCol: Column = (0 until nPlanes).map { j =>
    val p = typedLit(plane(j, dims))
    // r14: native dot_product kernel per plane instead of the
    // interpreted zip_with/aggregate fold — same float→double widening
    // and left fold, so the sign (and hence every bucket id) is
    // bit-identical to n2/n3/n16's oracle SQL (sqlBucket, unchanged)
    when(graft.functions.VectorFunctions.dotProduct(col("embedding"), p) > 0,
         lit(1 << j)).otherwise(lit(0))
  }.reduce(_ + _)

  /** LSH bucketing: sign-bit bucket id per vector + bucket histogram. */
  val n2LshBuckets: Q = (s, d) =>
    graft.sources.Tables.embeddings(s, d)
      .select(col("vec_id"), bucketCol.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))

  /** LSH ANN: top-3 cosine neighbors per query, candidates restricted
    * to the query's bucket (the scale path: bucket = join key).
    */
  val n3LshTopK: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    val withB = e.select(col("vec_id"), col("embedding"), bucketCol.as("bucket"))
    val q = withB.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
    val c = withB.select(col("vec_id").as("cid"), col("embedding").as("ce"),
                         col("bucket").as("c_bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.join(broadcast(q), col("bucket") === col("c_bucket") && col("qid") =!= col("cid"))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosineSim(col("qe"), col("ce")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("bucket"), col("cid"), col("sim"), col("rnk"))
  }

  /** IVF-style ANN: a fixed centroid table (16 "trained" centroids —
    * here vectors 100..115, deterministic stand-ins for k-means
    * output), every vector assigned to its nearest centroid by cosine;
    * queries are MULTI-PROBE (their top-2 cells — the recall/cost knob
    * of IVF). At 100 TB the cell id is the partition key: assignment
    * is one broadcast-join map pass, search shuffles only within
    * probed cells.
    */
  val n4IvfTopK: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    val cents = e.filter(col("vec_id") >= 100 && col("vec_id") < 116)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_e"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    def rankedAgainstCentroids(vecs: org.apache.spark.sql.DataFrame) =
      vecs.crossJoin(broadcast(cents))
        .withColumn("csim", graft.functions.VectorFunctions.cosineSim(col("embedding"), col("cent_e")))
        .withColumn("crn", row_number().over(wAssign))
    // CORPUS assignment = the nearest_seed kernel against the 16-row
    // driver-held codebook (r13): the window form shuffled and SORTED
    // the N×16 product carrying the embedding column — the explicit-
    // sort twin of the ObjectHashAggregate fallback that killed the
    // d23 helper at 6M vectors. Float centroids widen to double in
    // the literal exactly as cosine_sim widens them per element, so
    // the kernel's csims — and the (csim DESC, cent_id ASC) argmax —
    // are bit-identical to the oracle's window replay. The PROBE
    // ranking below keeps the window: it needs top-2, and its input
    // is 8×16 rows at any corpus size.
    val centRows = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .sortBy(_._1).toSeq
    val assigned = e.select(col("vec_id"), col("embedding"),
      graft.functions.VectorFunctions.nearestSeed(col("embedding"),
        typedLit(centRows.map(_._1)), typedLit(centRows.map(_._2)))
        .as("cell"))
    val q = rankedAgainstCentroids(e.filter(col("vec_id") < 8))
      .filter(col("crn") <= 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
              col("cent_id").as("cell"))
    val c = assigned.select(col("vec_id").as("cid"), col("embedding").as("ce"),
                            col("cell").as("c_cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.join(broadcast(q), col("cell") === col("c_cell") && col("qid") =!= col("cid"))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosineSim(col("qe"), col("ce")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("cid"), col("sim"), col("rnk"))
  }

  /** IVF with TRAINED centroids: 2 deterministic Lloyd iterations of
    * k-means (K=8, seeds = vectors 0..7, cosine assignment, exact
    * decimal element-means so the update is order-independent), then
    * the same multi-probe search as n4 against the trained cells.
    *
    * 100 TB-shaped the way iterative ML actually runs on Spark: the
    * K×64-double centroid table is DRIVER-HELD (collected after each
    * distributed mean — K rows, never grows with data) and folded into
    * the next pass as literal arrays, so assignment is a pure MAP over
    * the corpus (argmax across K expressions — no cross join, no
    * per-vector window shuffle), and each iteration is its own job
    * instead of one ever-deepening lineage that AQE would re-execute.
    * The centroid update stays a distributed two-level hash agg; the
    * final search shuffles only probed cells.
    */
  val n5IvfKmeans: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    import org.apache.spark.sql.types.DecimalType

    // driver-held centroids (cell id → double vector); norms use the
    // same left-fold-of-squares as the oracle's list_sum
    var cents: Seq[(Long, Seq[Double])] = e.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toSeq)
      .sortBy(_._1).toSeq

    // assignment = the nearest_seed codegen kernel against the
    // driver-held centroid literals, rebuilt from `cents` each pass
    // (def, so every reference sees the iteration's centroids): ONE
    // map over the corpus, argmax by (csim DESC, cell ASC) — the same
    // arithmetic and tie rule as the oracle's ORDER BY cos DESC, cell.
    // The pre-r13 crossJoin + max_by(cell, struct(...)) form was the
    // cellAssigned fallback bomb in miniature: a struct-ordering
    // aggregate runs as ObjectHashAggregate, whose partials fall back
    // to SORT-BASED past 128 distinct keys per partition — sorting
    // the corpus×K product (see NearestSeed's scaladoc; measured at
    // 6M vectors on the d23 helper before the rewrite).
    def assigned: DataFrame = e.select(
      col("vec_id"),
      graft.functions.VectorFunctions.nearestSeed(col("embedding"),
        typedLit(cents.map(_._1)), typedLit(cents.map(_._2))).as("cell"),
      col("embedding"))

    for (_ <- 1 to 2) {
      // element-wise mean via exact decimal sums (order-independent).
      // ONE distributed aggregation (cell, pos) → mean; the K×64 mean
      // rows are assembled into centroid arrays ON THE DRIVER instead
      // of through a second collect_list aggregation — that second agg
      // (plus the array rebuild) was pure plan-compile weight for data
      // that is 512 rows at ANY corpus size. (A 64-mean-column single
      // agg was also tried: 64 decimal agg buffers codegen even
      // slower — measured cold 9.5 s vs this form's.)
      cents = assigned
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(col("col").cast(DoubleType).cast(DecimalType(30, 12)))
                .cast(DoubleType) / count(lit(1))).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
        .toSeq.sortBy(_._1)
    }

    val cells = assigned
      .select(col("vec_id").as("cid"), col("embedding").as("ce2"),
              col("cell").as("c_cell"))
    // probe set = 8 query vectors: their top-2 cells are 8×K dots —
    // computed on the driver with the SAME left-fold double arithmetic
    // and (csim desc, cell asc) order, then inlined as a literal table
    // (saves a full corpus pass; the query side never grows with data)
    val probes = {
      import s.implicits._
      val qvecs = e.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
        .sortBy(_._1)
      qvecs.flatMap { case (qid, qe) =>
        val qnorm = math.sqrt(qe.foldLeft(0.0)((a, x) => a + x * x))
        cents.map { case (cid, ce) =>
          val dotv = qe.zip(ce).foldLeft(0.0)((a, p) => a + p._1 * p._2)
          val cnorm = math.sqrt(ce.foldLeft(0.0)((a, x) => a + x * x))
          (qid, qe.map(_.toFloat), cid, dotv / (qnorm * cnorm))
        }.sortBy { case (_, _, cid, csim) => (-csim, cid) }.take(2)
      }.toSeq.toDF("qid", "qe", "cell", "csim")
        .select(col("qid"), col("qe"), col("cell"))
    }
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    cells.join(broadcast(probes),
               col("cell") === col("c_cell") && col("qid") =!= col("cid"))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosineSim(col("qe"), col("ce2")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("cid"), col("sim"), col("rnk"))
  }

  /** Uint8 quantization of the embedding column — the compression
    * pass a 100 TB vector store runs before ANN serving (4× smaller
    * than float32): per-vector min/max affine map onto 0..255 with
    * floor. Map-only, no shuffle except the final per-label checksum
    * aggregation. Exactness: every step is an IEEE-exact op on values
    * both engines share (float→double widening, subtract, multiply,
    * divide, floor), so the integer codes — and their checksums —
    * are bit-identical under the DuckDB oracle. Degenerate constant
    * vectors (max == min) quantize to 0.
    */
  val n6Quantize: Q = (s, d) =>
    graft.sources.Tables.embeddings(s, d)
      .withColumn("mn", array_min(col("embedding")))
      .withColumn("mx", array_max(col("embedding")))
      .withColumn("q", expr(
        """transform(embedding, v ->
          |  CASE WHEN mx = mn THEN 0L
          |       ELSE floor((cast(v as double) - cast(mn as double)) * 255.0
          |                  / (cast(mx as double) - cast(mn as double)))
          |  END)""".stripMargin))
      .withColumn("qsum", expr("aggregate(q, cast(0 as bigint), (a, x) -> a + x)"))
      .groupBy(col("label"))
      .agg(sum(col("qsum")).cast("long").as("q_checksum"),
           count(lit(1)).as("n_vecs"),
           min(col("qsum")).as("min_qsum"),
           max(col("qsum")).as("max_qsum"))

  /** ANN index-quality evaluation: recall@3 of the LSH index (n3)
    * against brute-force ground truth (n1's top-3) — the measurement a
    * vector store runs before trusting an approximate index at scale.
    * Per query: |approx ∩ truth| / |truth| as an integer percent.
    * Plan shape: the two top-k subplans (broadcast query set each), a
    * semi join on (qid, cid) — both sides k·|Q| rows, tiny at any
    * corpus size — and a K-row rollup; the corpus-sized work is
    * exactly n1 + n3, nothing extra shuffles.
    */
  val n7AnnRecall: Q = (s, d) => {
    val truth = n1BruteTopK(s, d).filter(col("rnk") <= 3)
      .select(col("qid"), col("cid"))
    val approx = n3LshTopK(s, d)
      .select(col("qid").as("aqid"), col("cid").as("acid"))
    val hits = truth.join(approx,
        col("qid") === col("aqid") && col("cid") === col("acid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    truth.groupBy(col("qid")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("qid"), "left_outer")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("recall_pct", expr("n_hit * 100 DIV n_true"))
      .select(col("qid"), col("n_true"), col("n_hit"), col("recall_pct"))
  }

  /** PRODUCT QUANTIZATION encoder — the vector-compression format
    * serving-scale ANN actually ships (FAISS's PQ): the 64-dim vector
    * splits into M=8 contiguous 8-dim SUBSPACES, each subvector snaps
    * to its nearest of K=4 sub-centroids (L2, seeds = the subvectors
    * of vectors 0..3 — the deterministic n5-style seeding), and the
    * vector is stored as 8 2-bit codes (16 bits total vs 2048 — a
    * 128× compression). Reported per label: the packed-code checksum,
    * distinct packed codes, and total quantization distortion (the
    * accuracy-vs-compression dial).
    *
    * Scale shape: the codebook is driver-held K·M·8 doubles inlined as
    * typed literals (independent of corpus size) so encoding is a PURE
    * MAP over the corpus — 32 fused fold expressions, no shuffle, no
    * join — followed by the K-row label rollup. Exactness: float→
    * double widening, fixed-order left folds, first-index argmin on
    * both engines; distortion rounds per subspace THEN sums as exact
    * decimal, so addition order cannot flake the hash.
    */
  val n8PqEncode: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    // driver-held codebook seeds: full vectors 0..3, subspace-sliced
    val seeds: Seq[Seq[Double]] = e.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    // squared-L2 lists of subspace m against the 4 seed subvectors —
    // the native sq_dist_list kernel (r14; was 8×4 separate
    // interpreted zip_with/aggregate folds with the codebook inlined
    // as literals — see n10). Same arithmetic, same array order.
    var df = e
    for (m <- 0 until 8) {
      df = df.withColumn(s"dl_$m", graft.functions.VectorFunctions
          .sqDistList(col("embedding"),
                      (0 until 4).map(k => seeds(k).slice(m * 8, m * 8 + 8)),
                      m * 8))
        .withColumn(s"code_$m",
          array_position(col(s"dl_$m"), array_min(col(s"dl_$m"))) - 1)
        .withColumn(s"err6_$m",
          round(array_min(col(s"dl_$m")), 6).cast("decimal(22,6)"))
    }
    val codeKey = (0 until 8)
      .map(m => col(s"code_$m") * lit(1L << (2 * m)))
      .reduce(_ + _)
    val err6 = (0 until 8).map(m => col(s"err6_$m")).reduce(_ + _)
    df.withColumn("code_key", codeKey)
      .withColumn("err6", err6)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
           sum(col("code_key")).as("sum_code_key"),
           countDistinct(col("code_key")).as("n_distinct_codes"),
           round(sum(col("err6")).cast(DoubleType), 6).as("total_distortion"))
  }

  /** MAXIMUM INNER-PRODUCT SEARCH via the norm-augmentation reduction
    * (Bachrach et al., RecSys'14 — the standard public trick): append
    * a synthetic coordinate sqrt(M² − ‖x‖²) to every corpus vector
    * (M = max corpus norm) and 0 to every query; the augmented
    * vectors all have norm M, so cosine against the augmented corpus
    * is dot(q,x) / (‖q‖·M) — a per-query POSITIVE constant times the
    * inner product, hence MIPS ≡ cosine-NN on the augmented space and
    * every cosine index in this file (LSH buckets, IVF cells) serves
    * MIPS unchanged. The query ranks by that augmented cosine and
    * reports the raw inner product alongside; SimilaritySpec asserts
    * the order-preservation theorem against a direct dot-product rank.
    *
    * Scale shape: M is a one-row aggregate broadcast to the map side
    * (no shuffle added), the query set is the fixed broadcast side,
    * and the corpus streams exactly as n1 — the reduction costs one
    * extra fused fold per pair, nothing data-sized moves.
    */
  val n9MipsTopK: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    val m = e.agg(max(sqrt(dotCol("embedding", "embedding"))).as("m_norm"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("aug_sim").desc, col("cid"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .crossJoin(broadcast(m))
      .withColumn("ip", dotCol("qe", "ce"))
      .withColumn("aug_sim",
        round(col("ip") / (sqrt(dotCol("qe", "qe")) * col("m_norm")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("cid"), round(col("ip"), 4).as("ip"),
              col("aug_sim"), col("rnk"))
  }

  /** IVF + PQ — the composite a serving-scale vector store actually
    * runs (FAISS `IVFx,PQy`): a coarse 16-cell inverted index prunes
    * the corpus to the probed cells, and within them distances are
    * computed AGAINST THE 16-BIT PQ CODES via asymmetric distance
    * computation (ADC) — the query precomputes one 8×4 table of
    * subspace distances to the sub-centroids, and a candidate's
    * approximate distance is eight table lookups summed, never
    * touching the raw vector.
    *
    * Scale shape, piece by piece:
    * - corpus encode is a PURE MAP (cell = full-dim L2 argmin against
    *   16 driver-held centroids, codes = n8's subspace argmin against
    *   the driver-held 8×4 codebook) — no shuffle, no join; after it
    *   the corpus rides as (cell, 8 codes) ≈ 5 bytes/vector, and at
    *   100 TB the raw vectors are never re-read.
    * - the ADC table is computed ONCE per query on the 8-row query
    *   set (the classic ADC trick — without it each pair recomputes
    *   32 subspace distances), then broadcast.
    * - the search is a broadcast HASH join on the probed cell id (an
    *   equi key — no nested loop), cost O(candidates in probed
    *   cells), i.e. the inverted-list scan.
    * Exactness: per-subspace lookups round to 6 decimals and sum as
    * exact decimal (order-proof); ranking ties break on cid; probe
    * ranking ties break on cell — all replayed verbatim by the
    * oracle, which rebuilds both codebooks from the table in SQL.
    */
  val n10IvfPq: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    // driver-held codebooks: PQ seeds = vectors 0..3 (n8's seeding),
    // coarse centroids = vectors 100..115 (n4's fixed-probe seeding)
    val seeds: Seq[Seq[Double]] = e.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val cents: Seq[Seq[Double]] =
      e.filter(col("vec_id") >= 100 && col("vec_id") < 116)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    // distance lists through the native sq_dist_list kernel (r14):
    // the r13 nested-HOF form already collapsed the flat 16 + 8×4
    // separate folds into one expression per list (~6× plan weight);
    // the kernel goes the rest of the way — the codebook rides as a
    // compact reference object instead of literal arrays in the tree,
    // and the K×dim fold runs as two generated loops instead of
    // interpreted transform/zip_with/aggregate lambdas per row.
    // Arithmetic identical (float→double widening, left-to-right
    // accumulation in index order; SqDistListSpec pins bit equality
    // against the composed fold).
    // per-subspace 4-entry distance list of `c` against the PQ seeds
    def dlOf(c: String, m: Int): Column =
      graft.functions.VectorFunctions.sqDistList(
        col(c), seeds.map(_.slice(m * 8, m * 8 + 8)), m * 8)
    // 16-entry full-dim distance list against the coarse centroids
    def cdlOf(c: String): Column =
      graft.functions.VectorFunctions.sqDistList(col(c), cents, 0)

    // corpus: cell + 8 PQ codes, one map pass (first-index argmin ≡
    // lowest cell/code on ties, matching the oracle's list_position)
    var cor = e.select(col("vec_id").as("cid"), col("embedding"))
      .withColumn("ccdl", cdlOf("embedding"))
      .withColumn("cell",
        (array_position(col("ccdl"), array_min(col("ccdl"))) - 1).cast("int"))
    for (m <- 0 until 8) {
      cor = cor.withColumn(s"dl_$m", dlOf("embedding", m))
        .withColumn(s"code_$m",
          (array_position(col(s"dl_$m"), array_min(col(s"dl_$m"))) - 1).cast("int"))
    }
    cor = cor.select(col("cid") +: col("cell") +:
      (0 until 8).map(m => col(s"code_$m")): _*)

    // queries: ADC tables (once per query) + top-2 probe cells by
    // (distance, cell) — a window over the exploded 16-cell list
    var q1 = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    for (m <- 0 until 8)
      q1 = q1.withColumn(s"qdl_$m", dlOf("qe", m))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cd"), col("pcell"))
    val probes = q1
      .withColumn("qcdl", cdlOf("qe"))
      .select(col("qid") +: posexplode(col("qcdl")).as(Seq("pcell", "cd")) +:
        (0 until 8).map(m => col(s"qdl_$m")): _*)
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= 2)
      .select(col("qid") +: col("pcell").cast("int").as("pcell") +:
        (0 until 8).map(m => col(s"qdl_$m")): _*)

    // ADC: eight table lookups, rounded then summed as exact decimal
    val ad6 = (0 until 8).map { m =>
      round(element_at(col(s"qdl_$m"), col(s"code_$m") + 1), 6)
        .cast("decimal(22,6)")
    }.reduce(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("ad6"), col("cid"))
    cor.join(broadcast(probes),
             col("cell") === col("pcell") && col("qid") =!= col("cid"))
      .withColumn("ad6", ad6)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("cid"), col("cell"),
              round(col("ad6").cast(DoubleType), 6).as("approx_dist"),
              col("rnk"))
  }

  /** TWO-STAGE retrieval — quantized-scan shortlist + full-precision
    * re-rank (the ScaNN/FAISS serving pattern): stage 1 scans integer
    * fixed-point codes (floor(x·100) per component — 4 bytes of exact
    * integer arithmetic instead of a float dot) and keeps the top-8
    * candidates per query by quantized dot; stage 2 fetches the FULL
    * vectors for only those 8·|Q| survivors and re-ranks the top-3 by
    * exact cosine. Both stage ranks are reported so rank swaps (the
    * quantization error the re-rank exists to fix) are visible.
    *
    * Scale shape: stage 1 streams the code column only — at 100 TB the
    * raw float vectors are never read by the scan, and the integer dot
    * is a fused fold (order-independent integer sums, bit-identical on
    * any partitioning). Stage 2's full-vector fetch is a broadcast
    * hash join of the TINY shortlist against the corpus — full
    * precision touches O(k·|Q|) rows, not O(N). Quantization uses
    * floor, not round, so both engines agree at .5 boundaries.
    */
  val n11Rerank: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    val codes = expr(
      "transform(embedding, v -> cast(floor(cast(v as double) * 100.0) as bigint))")
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), codes.as("qc"))
    val c = e.select(col("vec_id").as("cid"), codes.as("cc"))
    val w1 = Window.partitionBy(col("qid")).orderBy(col("qdot").desc, col("cid"))
    val shortlist = c.join(broadcast(q), col("qid") =!= col("cid"))
      // r14: native long_dot_product kernel — the composed
      // aggregate(zip_with(qc, cc, *), 0L, +) fold ran interpreted per
      // candidate pair (8 × N evaluations, two lambdas + an
      // intermediate array each); same integer sum, bit-identical
      // (PairFoldSpec), oracle SQL unchanged
      .withColumn("qdot",
        graft.functions.VectorFunctions.longDotProduct(col("qc"), col("cc")))
      .withColumn("rnk_approx", row_number().over(w1))
      .filter(col("rnk_approx") <= 8)
      .select(col("qid"), col("cid"), col("qdot"), col("rnk_approx"))
    val qe = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val ce = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w2 = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    ce.join(broadcast(shortlist), "cid")
      .join(broadcast(qe), "qid")
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosineSim(col("qe"), col("ce")), 6))
      .withColumn("rnk", row_number().over(w2))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("cid"), col("qdot").as("approx_dot"),
              col("rnk_approx"), col("sim"), col("rnk"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two
    * retrievers — the standard way a hybrid search stack merges
    * rankings whose scores live on incomparable scales. Retriever A
    * ranks candidates by cosine similarity, retriever B by (negative)
    * squared L2 distance; the fused score is Σ 1/(60+rank), carried
    * as integer ppm (1000000 DIV (60+rank)) so the fusion — unlike
    * the retriever scores themselves — is bit-identical across
    * engines and never compares floats.
    *
    * Scale shape: the fixed 8-query set broadcasts onto the corpus
    * (n1's build-side rule); both per-query ranks AND the fused rank
    * are windows partitioned on qid, so candidate scoring exchanges
    * ONCE and every window reuses that clustering. At 100 TB each
    * retriever would be its own ANN shortlist (n3/n4) unioned before
    * fusion — the fusion stage itself is already shortlist-sized.
    */
  val n12RrfFusion: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val wCos = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    val wL2 = Window.partitionBy(col("qid"))
      .orderBy(col("d2").asc, col("cid"))
    val wFused = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_ppm").desc, col("cid"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosineSim(col("qe"), col("ce")), 6))
      // r14: native sq_distance kernel — the composed cast-both-arrays
      // + zip_with((x-y)²) + fold chain ran interpreted per candidate
      // pair; the kernel widens per element and accumulates in the
      // same index order, so every partial sum (and the round) is
      // bit-identical (PairFoldSpec); oracle SQL unchanged
      .withColumn("d2", round(
        graft.functions.VectorFunctions.sqDistance(col("qe"), col("ce")), 6))
      .withColumn("rnk_cos", row_number().over(wCos))
      .withColumn("rnk_l2", row_number().over(wL2))
      .withColumn("rrf_ppm",
        expr("1000000 DIV (60 + rnk_cos) + 1000000 DIV (60 + rnk_l2)"))
      .withColumn("rnk", row_number().over(wFused))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("cid"), col("rnk_cos").cast("long"),
              col("rnk_l2").cast("long"), col("rrf_ppm"), col("rnk").cast("long"))
      .toDF("qid", "cid", "rnk_cos", "rnk_l2", "rrf_ppm", "rnk")
  }

  /** ColBERT-style LATE-INTERACTION retrieval (MaxSim): instead of one
    * vector per document, each side is a BAG of token vectors and the
    * pair score is Σ_q max_d ⟨q_i, d_j⟩ — every query token finds its
    * best-matching document token and the per-token maxima sum. Here
    * each 64-d embedding stands in for 8 token vectors of 8 dims
    * (contiguous slices — the multi-vector plumbing is real even though
    * the "tokens" come from slicing); a production encoder would swap
    * in its own Array[Array[Float]] column without changing the plan.
    *
    * The whole 8×8 interaction matrix folds IN-ROW (no explode: token
    * vectors never become rows, so nothing about the multi-vector
    * structure rides a shuffle) through the NATIVE codegen'd `maxsim`
    * kernel — the nested-HOF original (aggregate over array_max over
    * zip_with/slice dots) evaluated an interpreted lambda per element
    * and materialized a sliced array per token-pair dot, which held
    * n13 in the bench top-3 at ~2 s; the kernel is one straight-line
    * nested loop with identical fold order (MaxSimSpec pins
    * bit-equality against the HOF form). Scale shape = n1's: fixed
    * query set broadcast, corpus streamed map-side, per-query top-k
    * via window. Dot products fold left-to-right in doubles; maxima
    * and the qi-ordered sum replay identically in the oracle, so
    * comparison is exact.
    */
  val n13MaxSim: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("maxsim").desc, col("cid"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("maxsim", round(
        graft.functions.VectorFunctions.maxSim(col("qe"), col("ce"), 8), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("cid"), col("maxsim"), col("rnk").cast("long").as("rnk"))
  }

  /** FILTERED vector search — ANN under a metadata predicate (here:
    * candidates must share the query's label; in production: language,
    * license, tenant, date range). The predicate joins BEFORE ranking
    * (pre-filter, the recall-exact discipline), and because it is an
    * EQUI-condition it becomes the hash-join key: the plan is a
    * BroadcastHashJoin on label, not the ANN family's nested-loop over
    * the full corpus — the predicate doesn't just mask results, it
    * SHRINKS the scored set. At 100 TB label becomes the partition
    * key and each query scores only its slice.
    */
  val n14FilteredAnn: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
              col("label").as("qlabel"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
                     col("label"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.join(broadcast(q),
           col("label") === col("qlabel") && col("qid") =!= col("cid"))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosineSim(col("qe"), col("ce")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("label").cast("long").as("label"), col("cid"),
              col("sim"), col("rnk").cast("long").as("rnk"))
  }

  /** Matryoshka-truncation retrieval eval (Kusupati et al. 2022 — the
    * MRL deployment question): how much top-1 agreement survives when
    * the 64-dim embeddings are truncated to their first k dims? For
    * each k ∈ {4, 16, 64} the brute top-1 neighbor under truncated
    * cosine is compared against the full-dim top-1; the k = 64 row is
    * the built-in sanity anchor (agreement ≡ n_queries). Truncation is
    * `slice` — a pure map — and each k's search is the n1 broadcast
    * shape (fixed query set broadcast, corpus streamed once per k; at
    * scale the three k-passes fuse over one corpus scan since slice
    * feeds from the same row). The measurement says what index width
    * to SHIP — run it before quantization (n6), which answers the
    * same question for bit depth. On THIS corpus the answer is the
    * honest one for i.i.d. random embeddings: ~zero agreement at
    * k = 4/16 (no Matryoshka structure to exploit) — which is exactly
    * the failure this eval exists to catch before a truncated index
    * ships.
    */
  val n15MrlEval: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    // r14 optimization (guide §1.2 step 1 — don't recompute passes):
    // the old shape ran the brute top-1 as a WINDOW over the pair
    // stream once per k AND re-derived the full-dim top-1 inside each
    // of the three union branches — SIX broadcast-join passes over
    // the corpus. One pass now computes the truncated cosine at every
    // k off the same joined row (slice feeds from one row read), and
    // the per-(qid, k) top-1 is an ARGMAX AGGREGATE
    // (max(struct(sim, -cid)) ≡ the (sim DESC, cid ASC) window rank-1
    // rule, |Q| groups — partial-aggregating, no pair-stream sort);
    // agreement then reduces on the |Q|-row table. 6 corpus scans →
    // 1, window sorts → one 16-group aggregate. Values identical:
    // same rounded sims, same argmax tie rule, and the k = 64 branch
    // compares the full-dim winner with itself exactly as before.
    val ks = Seq(4, 16, dims)
    def simK(k: Int) = round(graft.functions.VectorFunctions.cosineSim(
      slice(col("qe"), 1, k), slice(col("ce"), 1, k)), 6)
    val pairs = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid") +: col("cid") +:
        ks.map(k => simK(k).as(s"sim_$k")): _*)
    val aggs = ks.map(k =>
      max(struct(col(s"sim_$k").as("s"), (-col("cid")).as("nc"))).as(s"m_$k"))
    val per = pairs.groupBy(col("qid")).agg(aggs.head, aggs.tail: _*)
    val sums = ks.map(k =>
      sum(when(col(s"m_$k").getField("nc") ===
               col(s"m_$dims").getField("nc"), 1L).otherwise(0L))
        .as(s"a_$k"))
    val counts = per.agg(count(lit(1)).as("nq"), sums: _*)
    counts.select(explode(array(ks.map(k =>
        struct(lit(k).cast("int").as("trunc_dims"),
               col("nq").as("n_queries"),
               col(s"a_$k").cast("long").as("n_agree"))): _*)).as("r"))
      .select(col("r.trunc_dims").as("trunc_dims"),
              col("r.n_queries").as("n_queries"),
              col("r.n_agree").as("n_agree"))
  }

  /** Margin-based bitext mining — the LASER/CCMatrix recipe for
    * building parallel corpora from two monolingual embedding pools
    * (Artetxe & Schwenk 2019's ratio margin): a raw cosine threshold
    * over-selects "hubs" (vectors close to everything), so each
    * candidate pair is scored by its cosine RELATIVE to the two
    * vectors' average k-NN cosine, and a pair is mined only when that
    * ratio clears 1 — i.e. the two sides are closer to each other
    * than to their own neighborhoods. Sides are the deterministic
    * vec_id parity split (stand-ins for the two languages).
    *
    * Scale shape: candidates and both k-NN neighborhoods come from
    * the SAME n2/n3 sign-bit LSH bucketing — bucket id is the one
    * corpus-sized shuffle key, neighborhoods are window functions
    * over the slim (bucket, a, b, sim) pair stream (two keyed
    * exchanges on pair rows, never on embeddings), and nothing is
    * all-pairs. Margins are integer ppm end-to-end: sims quantize to
    * e6 micro-units immediately, so the ratio is pure int64
    * arithmetic (`DIV`) that replays bit-exactly in the oracle — no
    * float-association drift, and the positive-only filter keeps
    * truncating vs flooring division semantics off the table.
    */
  val n16BitextMining: Q = (s, d) => {
    val e = graft.sources.Tables.embeddings(s, d)
    val withB = e.select(col("vec_id"), col("embedding"), bucketCol.as("bucket"))
    val a = withB.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("a_id"), col("embedding").as("ae"), col("bucket"))
    val b = withB.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("b_id"), col("embedding").as("be"),
              col("bucket").as("b_bucket"))
    // the pair table has THREE consumers (both k-NN neighborhood aggs
    // + the margin join) — materialize it once or the bucket join and
    // every pairwise cosine recompute per consumer (the d8-build
    // lesson; slim (bucket, a, b, sim) rows, candidate-sized)
    val pairs = a.join(b, col("bucket") === col("b_bucket"))
      .withColumn("sim_e6",
        round(graft.functions.VectorFunctions.cosineSim(col("ae"), col("be"))
                * 1000000, 0).cast("long"))
      .select(col("bucket"), col("a_id"), col("b_id"), col("sim_e6"))
      .localCheckpoint(eager = false)
    val wa = Window.partitionBy(col("a_id"))
      .orderBy(col("sim_e6").desc, col("b_id"))
    val wb = Window.partitionBy(col("b_id"))
      .orderBy(col("sim_e6").desc, col("a_id"))
    val aN = pairs.withColumn("r", row_number().over(wa)).filter(col("r") <= 4)
      .groupBy(col("a_id"))
      .agg(count(lit(1)).as("ka"), sum(col("sim_e6")).as("sa"))
    val bN = pairs.withColumn("r", row_number().over(wb)).filter(col("r") <= 4)
      .groupBy(col("b_id"))
      .agg(count(lit(1)).as("kb"), sum(col("sim_e6")).as("sb"))
    // ratio margin sim / ((mean_a + mean_b) / 2) in exact integer ppm:
    // 2e6·sim·ka·kb DIV (sa·kb + sb·ka); positive-only so Spark's
    // truncating DIV and DuckDB's flooring // agree
    val best = pairs.join(aN, "a_id").join(bN, "b_id")
      .filter(col("sim_e6") > 0 &&
              col("sa") * col("kb") + col("sb") * col("ka") > 0)
      .withColumn("margin_ppm",
        expr("2000000 * sim_e6 * ka * kb DIV (sa * kb + sb * ka)"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("a_id"))
        .orderBy(col("margin_ppm").desc, col("b_id"))))
      .filter(col("rk") === 1 && col("margin_ppm") > 1000000)
    best.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_mined"),
           sum(col("margin_ppm")).as("sum_margin_ppm"),
           min(col("a_id")).as("min_a"))
  }

  val queries: Map[String, Q] = Map(
    "n16_bitext_mining" -> n16BitextMining,
    "n15_mrl_eval" -> n15MrlEval,
    "n14_filtered_ann" -> n14FilteredAnn,
    "n13_maxsim" -> n13MaxSim,
    "n12_rrf_fusion" -> n12RrfFusion,
    "n11_rerank" -> n11Rerank,
    "n10_ivf_pq" -> n10IvfPq,
    "n9_mips_topk" -> n9MipsTopK,
    "n8_pq_encode" -> n8PqEncode,
    "n7_ann_recall" -> n7AnnRecall,
    "n1_cosine_brute_topk" -> n1BruteTopK,
    "n2_lsh_buckets" -> n2LshBuckets,
    "n3_lsh_topk" -> n3LshTopK,
    "n4_ivf_topk" -> n4IvfTopK,
    "n5_ivf_kmeans" -> n5IvfKmeans,
    "n6_quantize" -> n6Quantize,
  )

  // ---- oracle SQL ----

  /** DuckDB double dot product with the same left fold. */
  private def sqlDot(a: String, b: String) =
    s"list_sum(list_transform(list_zip($a::DOUBLE[], $b::DOUBLE[]), p -> p[1] * p[2]))"

  private def sqlNorm(a: String) =
    s"sqrt(list_sum(list_transform($a::DOUBLE[], x -> x * x)))"

  private def sqlPlane(j: Int): String =
    plane(j, dims).mkString("[", ", ", "]::DOUBLE[]")

  private val sqlBucket: String = (0 until nPlanes).map { j =>
    s"(CASE WHEN ${sqlDot("embedding", sqlPlane(j))} > 0 THEN ${1 << j} ELSE 0 END)"
  }.mkString(" + ")

  private def mrlKCte(k: Int): String = {
    val qe = s"q.embedding[1:$k]"
    val ce = s"c.embedding[1:$k]"
    s"""p$k AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    round(${sqlDot(qe, ce)} /
       |          (${sqlNorm(qe)} * ${sqlNorm(ce)}), 6) AS sim
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 16 AND q.vec_id <> c.vec_id),
       |t$k AS (SELECT qid, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY sim DESC, cid) AS rnk FROM p$k) WHERE rnk = 1)"""
      .stripMargin
  }

  private def mrlAgreeRow(k: Int): String =
    s"""SELECT $k AS trunc_dims, count(1) AS n_queries,
       |  CAST(sum(CASE WHEN a.cid = b.cid THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_agree
       |FROM t$k a JOIN t$dims b USING (qid)""".stripMargin

  val oracles: Map[String, String] = Map(
    // per-k truncated brute top-1 vs the full-dim top-1
    "n15_mrl_eval" ->
      s"""WITH ${mrlKCte(4)},
         |${mrlKCte(16)},
         |${mrlKCte(dims)}
         |${mrlAgreeRow(4)}
         |UNION ALL
         |${mrlAgreeRow(16)}
         |UNION ALL
         |${mrlAgreeRow(dims)}""".stripMargin,
    // the label pre-filter as the join predicate, then n1's ranking
    "n14_filtered_ann" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
         |           FROM embeddings),
         |p AS (SELECT q.vec_id AS qid, CAST(q.label AS BIGINT) AS label,
         |             c.vec_id AS cid,
         |             round(${sqlDot("q.emb", "c.emb")} /
         |                   (${sqlNorm("q.emb")} * ${sqlNorm("c.emb")}), 6)
         |               AS sim
         |      FROM e q JOIN e c ON q.vec_id < 8 AND q.label = c.label
         |                           AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM p)
         |SELECT qid, label, cid, sim, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3""".stripMargin,
    // the 8×8 interaction matrix rebuilt via the n8 unnest pattern
    // (DuckDB-safe: no nested lambdas); per-(pair, qi) max over di,
    // then the qi-ORDERED list_sum replays Spark's left fold exactly
    "n13_maxsim" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |p AS (SELECT q.vec_id AS qid, q.emb AS qe, c.vec_id AS cid,
        |             c.emb AS ce
        |      FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
        |d0 AS (SELECT qid, cid, qi.i AS qi, di.i AS di,
        |  list_sum(list_transform(
        |    list_zip(qe[qi.i*8+1 : qi.i*8+8], ce[di.i*8+1 : di.i*8+8]),
        |    pr -> pr[1] * pr[2])) AS dot
        |  FROM p CROSS JOIN (SELECT unnest(range(0, 8)) AS i) qi
        |         CROSS JOIN (SELECT unnest(range(0, 8)) AS i) di),
        |m1 AS (SELECT qid, cid, qi, max(dot) AS mx
        |       FROM d0 GROUP BY qid, cid, qi),
        |m2 AS (SELECT qid, cid,
        |  round(CAST(list_sum(list(mx ORDER BY qi)) AS DOUBLE), 6) AS maxsim
        |  FROM m1 GROUP BY qid, cid),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY qid ORDER BY maxsim DESC, cid) AS rnk FROM m2)
        |SELECT qid, cid, maxsim, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 3""".stripMargin,
    // stage 1 replayed over the same floor(x*100) codes (integer-exact
    // dot, DESC/cid tie order), stage 2 re-fetches full vectors for the
    // shortlist rows only and re-ranks by the shared cosine form
    "n11_rerank" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |codes AS (SELECT vec_id,
         |  list_transform(emb, x -> CAST(floor(x * 100.0) AS BIGINT)) AS c
         |  FROM e),
         |s0 AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |  CAST(list_sum(list_transform(list_zip(q.c, c.c),
         |                               p -> p[1] * p[2])) AS BIGINT) AS qdot
         |  FROM codes q JOIN codes c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
         |s1 AS (SELECT *, row_number() OVER
         |         (PARTITION BY qid ORDER BY qdot DESC, cid) AS rnk_approx
         |       FROM s0),
         |sh AS (SELECT * FROM s1 WHERE rnk_approx <= 8),
         |r0 AS (SELECT sh.qid, sh.cid, sh.qdot, sh.rnk_approx,
         |  round(${sqlDot("q.emb", "c.emb")} /
         |        (${sqlNorm("q.emb")} * ${sqlNorm("c.emb")}), 6) AS sim
         |  FROM sh JOIN e q ON q.vec_id = sh.qid JOIN e c ON c.vec_id = sh.cid),
         |r1 AS (SELECT *, row_number() OVER
         |         (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |       FROM r0)
         |SELECT qid, cid, qdot AS approx_dot, rnk_approx, sim, rnk
         |FROM r1 WHERE rnk <= 3""".stripMargin,
    // codebook rebuilt in SQL from vectors 0..3 (the n5 pattern); the
    // per-(vector, subspace) distances regroup into k-ordered lists so
    // argmin tie order matches Spark's first-index array_position
    "n8_pq_encode" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
        |cb AS (SELECT vec_id AS k, emb AS ce FROM e WHERE vec_id < 4),
        |sub AS (SELECT v.vec_id, v.label, ms.m, c.k,
        |  list_sum(list_transform(
        |    list_zip(v.emb[ms.m*8+1 : ms.m*8+8], c.ce[ms.m*8+1 : ms.m*8+8]),
        |    p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        |  FROM e v CROSS JOIN (SELECT unnest(range(0, 8)) AS m) ms
        |           CROSS JOIN cb c),
        |enc AS (SELECT vec_id, label, m,
        |  list_position(dl, list_min(dl)) - 1 AS code,
        |  CAST(round(list_min(dl), 6) AS DECIMAL(22,6)) AS err6
        |  FROM (SELECT vec_id, label, m, list(dist ORDER BY k) AS dl
        |        FROM sub GROUP BY vec_id, label, m)),
        |vc AS (SELECT vec_id, label,
        |  CAST(sum(code * (1::BIGINT << (2*m))) AS BIGINT) AS code_key,
        |  sum(err6) AS err6v
        |  FROM enc GROUP BY vec_id, label)
        |SELECT label, count(1) AS n_vecs,
        |  CAST(sum(code_key) AS BIGINT) AS sum_code_key,
        |  count(DISTINCT code_key) AS n_distinct_codes,
        |  round(CAST(sum(err6v) AS DOUBLE), 6) AS total_distortion
        |FROM vc GROUP BY label""".stripMargin,
    "n7_ann_recall" ->
      s"""WITH bb AS (SELECT vec_id, embedding, $sqlBucket AS bucket FROM embeddings),
         |t0 AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(${sqlDot("q.embedding", "c.embedding")} /
         |          (${sqlNorm("q.embedding")} * ${sqlNorm("c.embedding")}), 6) AS sim
         |  FROM embeddings q JOIN embeddings c
         |    ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
         |tr AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM t0),
         |truth AS (SELECT qid, cid FROM tr WHERE rnk <= 3),
         |p AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(${sqlDot("q.embedding", "c.embedding")} /
         |          (${sqlNorm("q.embedding")} * ${sqlNorm("c.embedding")}), 6) AS sim
         |  FROM bb q JOIN bb c
         |    ON q.bucket = c.bucket AND q.vec_id < 8 AND q.vec_id <> c.vec_id),
         |ar AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM p),
         |approx AS (SELECT qid, cid FROM ar WHERE rnk <= 3),
         |h AS (SELECT t.qid, count(1) AS n_hit FROM truth t
         |      JOIN approx a ON t.qid = a.qid AND t.cid = a.cid
         |      GROUP BY t.qid),
         |g AS (SELECT qid, count(1) AS n_true FROM truth GROUP BY qid)
         |SELECT g.qid, g.n_true,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(coalesce(h.n_hit, 0) * 100 // g.n_true AS BIGINT) AS recall_pct
         |FROM g LEFT JOIN h USING (qid)""".stripMargin,
    "n6_quantize" ->
      """WITH b AS (
        |  SELECT label, embedding,
        |         list_min(embedding) AS mn, list_max(embedding) AS mx
        |  FROM embeddings),
        |q AS (
        |  SELECT label,
        |    list_sum(list_transform(embedding, v ->
        |      CASE WHEN mx = mn THEN 0
        |           ELSE CAST(floor((v::DOUBLE - mn::DOUBLE) * 255.0
        |                           / (mx::DOUBLE - mn::DOUBLE)) AS BIGINT)
        |      END)) AS qsum
        |  FROM b)
        |SELECT label, CAST(sum(qsum) AS BIGINT) AS q_checksum,
        |       count(1) AS n_vecs,
        |       CAST(min(qsum) AS BIGINT) AS min_qsum,
        |       CAST(max(qsum) AS BIGINT) AS max_qsum
        |FROM q GROUP BY label""".stripMargin,
    // both codebooks rebuilt from the table in SQL (the n8 pattern);
    // sub/enc replay the PQ encoding, cas/cellof the coarse
    // assignment, probes the top-2 window, and the ADC sum uses the
    // same round-then-decimal-sum as the Spark side
    "n10_ivf_pq" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |cb AS (SELECT vec_id AS k, emb AS ce FROM e WHERE vec_id < 4),
        |cent AS (SELECT vec_id - 100 AS cell, emb AS ce FROM e
        |         WHERE vec_id >= 100 AND vec_id < 116),
        |sub AS (SELECT v.vec_id, ms.m, c.k,
        |  list_sum(list_transform(
        |    list_zip(v.emb[ms.m*8+1 : ms.m*8+8], c.ce[ms.m*8+1 : ms.m*8+8]),
        |    p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        |  FROM e v CROSS JOIN (SELECT unnest(range(0, 8)) AS m) ms
        |           CROSS JOIN cb c),
        |subl AS (SELECT vec_id, m, list(dist ORDER BY k) AS dl
        |         FROM sub GROUP BY vec_id, m),
        |enc AS (SELECT vec_id, m, list_position(dl, list_min(dl)) - 1 AS code
        |        FROM subl),
        |cas AS (SELECT v.vec_id, c.cell,
        |  list_sum(list_transform(list_zip(v.emb, c.ce),
        |    p -> (p[1]-p[2])*(p[1]-p[2]))) AS cd
        |  FROM e v CROSS JOIN cent c),
        |cellof AS (SELECT vec_id,
        |  CAST(list_position(cdl, list_min(cdl)) - 1 AS INT) AS cell
        |  FROM (SELECT vec_id, list(cd ORDER BY cell) AS cdl
        |        FROM cas GROUP BY vec_id)),
        |probes AS (SELECT vec_id AS qid, cell FROM (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cd, cell) AS rn
        |  FROM cas WHERE vec_id < 8) WHERE rn <= 2),
        |qtab AS (SELECT vec_id AS qid, m, dl FROM subl WHERE vec_id < 8),
        |cand AS (SELECT p.qid, co.vec_id AS cid, co.cell
        |         FROM probes p JOIN cellof co
        |           ON co.cell = p.cell AND co.vec_id <> p.qid),
        |approx AS (SELECT ca.qid, ca.cid, ca.cell,
        |  sum(CAST(round(q.dl[en.code + 1], 6) AS DECIMAL(22,6))) AS ad6
        |  FROM cand ca
        |  JOIN enc en ON en.vec_id = ca.cid
        |  JOIN qtab q ON q.qid = ca.qid AND q.m = en.m
        |  GROUP BY ca.qid, ca.cid, ca.cell),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY qid ORDER BY ad6, cid) AS rnk FROM approx)
        |SELECT qid, cid, cell, round(CAST(ad6 AS DOUBLE), 6) AS approx_dist, rnk
        |FROM r WHERE rnk <= 5""".stripMargin,
    "n9_mips_topk" ->
      s"""WITH m AS (SELECT max(${sqlNorm("embedding")}) AS m_norm FROM embeddings),
         |p AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    ${sqlDot("q.embedding", "c.embedding")} AS ip,
         |    round(${sqlDot("q.embedding", "c.embedding")} /
         |          (${sqlNorm("q.embedding")} * m.m_norm), 6) AS aug_sim
         |  FROM embeddings q JOIN embeddings c
         |    ON q.vec_id < 8 AND q.vec_id <> c.vec_id
         |  CROSS JOIN m),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY aug_sim DESC, cid) AS rnk FROM p)
         |SELECT qid, cid, round(ip, 4) AS ip, aug_sim, rnk FROM r WHERE rnk <= 5""".stripMargin,
    // both retriever scores replay through the shared fold forms
    // (rounded to 6 before ranking); the fusion itself is integer
    "n12_rrf_fusion" ->
      s"""WITH p AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(${sqlDot("q.embedding", "c.embedding")} /
         |          (${sqlNorm("q.embedding")} * ${sqlNorm("c.embedding")}), 6)
         |      AS sim,
         |    round(list_sum(list_transform(
         |      list_zip(q.embedding::DOUBLE[], c.embedding::DOUBLE[]),
         |      z -> (z[1] - z[2]) * (z[1] - z[2]))), 6) AS d2
         |  FROM embeddings q JOIN embeddings c
         |    ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
         |r AS (SELECT qid, cid,
         |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid)
         |    AS rnk_cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY d2 ASC, cid)
         |    AS rnk_l2
         |  FROM p),
         |f AS (SELECT qid, cid, rnk_cos, rnk_l2,
         |  1000000 // (60 + rnk_cos) + 1000000 // (60 + rnk_l2) AS rrf_ppm
         |  FROM r),
         |o AS (SELECT *, row_number() OVER
         |        (PARTITION BY qid ORDER BY rrf_ppm DESC, cid) AS rnk
         |      FROM f)
         |SELECT qid, cid, CAST(rnk_cos AS BIGINT) AS rnk_cos,
         |  CAST(rnk_l2 AS BIGINT) AS rnk_l2, CAST(rrf_ppm AS BIGINT)
         |    AS rrf_ppm, CAST(rnk AS BIGINT) AS rnk
         |FROM o WHERE rnk <= 5""".stripMargin,
    "n1_cosine_brute_topk" ->
      s"""WITH p AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(${sqlDot("q.embedding", "c.embedding")} /
         |          (${sqlNorm("q.embedding")} * ${sqlNorm("c.embedding")}), 6) AS sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM p)
         |SELECT qid, cid, sim, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "n2_lsh_buckets" ->
      s"""WITH b AS (SELECT vec_id, $sqlBucket AS bucket FROM embeddings)
         |SELECT bucket, count(1) AS n_vecs, min(vec_id) AS min_vec
         |FROM b GROUP BY bucket""".stripMargin,
    // the ratio margin replayed in exact integer ppm over the same
    // LSH buckets; r is computed on the UNFILTERED pair table exactly
    // as the Spark windows are
    "n16_bitext_mining" ->
      s"""WITH b0 AS (SELECT vec_id, embedding, $sqlBucket AS bucket
         |            FROM embeddings),
         |p AS (
         |  SELECT a.bucket, a.vec_id AS a_id, c.vec_id AS b_id,
         |    CAST(round(${sqlDot("a.embedding", "c.embedding")} /
         |          (${sqlNorm("a.embedding")} * ${sqlNorm("c.embedding")})
         |          * 1000000) AS BIGINT) AS sim_e6
         |  FROM b0 a JOIN b0 c ON a.bucket = c.bucket
         |   AND a.vec_id % 2 = 0 AND c.vec_id % 2 = 1),
         |an AS (SELECT a_id, count(1) AS ka, CAST(sum(sim_e6) AS BIGINT) AS sa
         |  FROM (SELECT *, row_number() OVER
         |          (PARTITION BY a_id ORDER BY sim_e6 DESC, b_id) AS r FROM p)
         |  WHERE r <= 4 GROUP BY a_id),
         |bn AS (SELECT b_id, count(1) AS kb, CAST(sum(sim_e6) AS BIGINT) AS sb
         |  FROM (SELECT *, row_number() OVER
         |          (PARTITION BY b_id ORDER BY sim_e6 DESC, a_id) AS r FROM p)
         |  WHERE r <= 4 GROUP BY b_id),
         |sc AS (SELECT p.bucket, p.a_id, p.b_id,
         |    (2000000 * sim_e6 * ka * kb) // (sa * kb + sb * ka) AS margin_ppm
         |  FROM p JOIN an USING (a_id) JOIN bn USING (b_id)
         |  WHERE sim_e6 > 0 AND sa * kb + sb * ka > 0),
         |best AS (SELECT *, row_number() OVER
         |    (PARTITION BY a_id ORDER BY margin_ppm DESC, b_id) AS rk FROM sc)
         |SELECT bucket, count(1) AS n_mined,
         |  CAST(sum(margin_ppm) AS BIGINT) AS sum_margin_ppm,
         |  min(a_id) AS min_a
         |FROM best WHERE rk = 1 AND margin_ppm > 1000000
         |GROUP BY bucket""".stripMargin,
    "n3_lsh_topk" ->
      s"""WITH b AS (SELECT vec_id, embedding, $sqlBucket AS bucket FROM embeddings),
         |p AS (
         |  SELECT q.vec_id AS qid, q.bucket AS bucket, c.vec_id AS cid,
         |    round(${sqlDot("q.embedding", "c.embedding")} /
         |          (${sqlNorm("q.embedding")} * ${sqlNorm("c.embedding")}), 6) AS sim
         |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < 8 AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM p)
         |SELECT qid, bucket, cid, sim, rnk FROM r WHERE rnk <= 3""".stripMargin,
    "n4_ivf_topk" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cent_e FROM embeddings
         |  WHERE vec_id >= 100 AND vec_id < 116),
         |asg AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlDot("e.embedding", "c.cent_e")} /
         |               (${sqlNorm("e.embedding")} * ${sqlNorm("c.cent_e")}) DESC,
         |      c.cent_id) AS crn
         |  FROM embeddings e CROSS JOIN cents c),
         |cells AS (SELECT vec_id, embedding, cent_id AS cell FROM asg WHERE crn = 1),
         |probes AS (SELECT vec_id, embedding, cent_id AS cell FROM asg
         |           WHERE crn <= 2 AND vec_id < 8),
         |p AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(${sqlDot("q.embedding", "c.embedding")} /
         |          (${sqlNorm("q.embedding")} * ${sqlNorm("c.embedding")}), 6) AS sim
         |  FROM probes q JOIN cells c ON q.cell = c.cell AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM p)
         |SELECT qid, cid, sim, rnk FROM r WHERE rnk <= 3""".stripMargin,
    "n5_ivf_kmeans" -> {
      // one Lloyd assignment pass against centroid CTE `cents`
      def asg(cents: String) =
        s"""SELECT e.vec_id, e.emb, c.cell,
           |    row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${sqlDot("e.emb", "c.ce")} /
           |               (${sqlNorm("e.emb")} * ${sqlNorm("c.ce")}) DESC,
           |        c.cell) AS rn
           |  FROM e CROSS JOIN $cents c"""
      // centroid update: exact decimal element-means of rn=1 members
      // (zipped unnests pair value with position; list(... ORDER BY)
      // rebuilds the array)
      def upd(a: String) =
        s"""SELECT cell, list(m ORDER BY pos) AS ce FROM (
           |  SELECT cell, pos,
           |         CAST(sum(CAST(v AS DECIMAL(30,12))) AS DOUBLE) / count(1) AS m
           |  FROM (SELECT cell, unnest(emb) AS v,
           |               unnest(range(1, length(emb) + 1)) AS pos
           |        FROM $a WHERE rn = 1)
           |  GROUP BY cell, pos) GROUP BY cell"""
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |c0 AS (SELECT vec_id AS cell, emb AS ce FROM e WHERE vec_id < 8),
         |a0 AS (${asg("c0")}),
         |c1 AS (${upd("a0")}),
         |a1 AS (${asg("c1")}),
         |c2 AS (${upd("a1")}),
         |fin AS (${asg("c2")}),
         |cells AS (SELECT vec_id AS cid, emb AS ce2, cell FROM fin WHERE rn = 1),
         |probes AS (SELECT vec_id AS qid, emb AS qe, cell FROM fin
         |           WHERE rn <= 2 AND vec_id < 8),
         |p AS (SELECT q.qid, c.cid,
         |  round(${sqlDot("q.qe", "c.ce2")} /
         |        (${sqlNorm("q.qe")} * ${sqlNorm("c.ce2")}), 6) AS sim
         |  FROM probes q JOIN cells c ON q.cell = c.cell AND q.qid <> c.cid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM p)
         |SELECT qid, cid, sim, rnk FROM r WHERE rnk <= 3""".stripMargin
    },
  )
}
