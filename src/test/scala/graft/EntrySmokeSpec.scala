package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guard: entry() yields rows; every oracleSql key has
  * a query; all queries run on sf0.001.
  */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("the registered surface never shrinks") {
    // a refactor that drops a module's map from SparkEntry (or a
    // merge that shadows keys between modules) would silently shrink
    // the driver-gated surface; pin the full round-12 surface (237 —
    // the floor must track the surface or the newest queries sit
    // outside the ratchet)
    assert(SparkEntry.queries.size >= 237,
      s"query surface shrank to ${SparkEntry.queries.size} (< 237)")
  }

  test("every registered query has an oracle") {
    // forgetting an oracle silently downgrades a query to the weaker
    // rows-only driver check. Round 7 closed the last three
    // exceptions (a3/a9/d13): their sketch-specific columns moved out
    // of the published output, and the tolerance/property verdicts
    // the sketches feed are now hash-checked against literal TRUE in
    // the oracle — so the full surface is oracle-exact.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"un-oracled queries: $noOracle")
  }

  test("every query runs at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("a3's self-check bounds the HLL estimate against the exact count") {
    val rows = SparkEntry.queries("a3_approx_distinct")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_rsd")),
      "HLL estimate outside 10x the configured RSD")
  }

  test("a9's self-check bounds the merged-sketch estimate against the exact count") {
    val rows = SparkEntry.queries("a9_hll_union")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_tol")),
      "merged HLL estimate outside 10x the lgK=12 standard error")
    assert(rows.forall(_.getAs[Long]("n_shards") > 1),
      "a9 must actually merge sketches from multiple shards")
  }

  // ONE plan sweep feeds both join lints (planning every query three
  // times tripled suite cost), and a query whose PLANNING throws is a
  // loud entry here instead of being silently excused from the lints
  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> (try fn(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING-FAILED: ${e.getMessage}" })
    }

  test("every query's physical plan materializes") {
    val failed = plans.filter(_._2.startsWith("PLANNING-FAILED"))
    assert(failed.isEmpty, failed.mkString("\n"))
  }

  test("BroadcastNestedLoopJoin appears only where a fixed-size side is deliberate") {
    // BNLJ is safe ONLY when the broadcast side cannot grow with the
    // data: the declared q11 cross join, the broadcast fixed query sets
    // of the ANN family (n1/n4/n5/n7), and the one-row/K-row total and
    // threshold tables of t8/t9. Anywhere else it means a join lost its
    // keys — the plan that detonates at scale.
    // d14's centroid assignment broadcasts the fixed K-row seed table,
    // same as the ANN family; n9 adds a one-row max-norm broadcast on
    // top of the fixed query set
    // t18 broadcasts its ONE-ROW leak-check aggregate back onto the
    // K-row split report — fixed-size by construction
    // g1 broadcasts the one-row node count onto the corpus edge map;
    // t19 the one-row (N, total-token) stats; t20 the one-row winning
    // pair — all fixed-size by construction
    // n11's stage-1 quantized scan broadcasts the fixed 8-row query
    // code set (n1's shape); g3/g4 ride g1's one-row node-count edge
    // map; c20 broadcasts the one-row time bounds and c21 the one-row
    // lineitem count onto the one-row FK-violation aggregate
    val allowed = Set("q11_join_cross", "n1_cosine_brute_topk", "n4_ivf_topk",
      "n5_ivf_kmeans", "n7_ann_recall", "t8_tfidf", "t9_mixture_sample",
      "d14_semdedup", "n9_mips_topk", "t18_group_split",
      "g1_pagerank", "g2_triangles", "t19_bm25", "t20_bpe_pairs",
      "c18_scd2_snapshot", "n11_rerank", "g3_neighbor_agg",
      "g4_bfs", "c20_zorder_layout", "c21_expectations",
      // n12 broadcasts the same fixed 8-row query set as n1 (the
      // qid<>cid predicate is deliberately non-equi); g5 rides g1's
      // one-row node-count edge map
      // n13 broadcasts n1's fixed 8-row query set (MaxSim scores the
      // streamed corpus against it map-side); n15 broadcasts its fixed
      // 16-row query set per truncation width (n1's shape, three times)
      // d20 broadcasts its one-row corpus-count aggregate onto the
      // positive-pair table (the in-plan n_docs scalar)
      // d23 broadcasts d14's centroid codebook at K = ceil(sqrt N) —
      // sqrt-bounded rows (448 at sf10), the IVF-codebook class, never
      // corpus-sized
      // d25's LEVEL-1 assignment broadcasts the coarse codebook at
      // K1 = ceil(cbrt N) — cube-root-bounded rows, strictly smaller
      // than d23's sqrt codebook; level 2 is an equi-join on the
      // coarse-cell id (no BNLJ)
      "n12_rrf_fusion", "g5_label_prop", "n13_maxsim", "n15_mrl_eval",
      "d20_contrastive_pairs", "d23_semdedup_adaptive",
      "d24_embedding_dup_cells", "d25_semdedup_hier")
    val offenders = plans.collect {
      case (name, p) if p.contains("BroadcastNestedLoopJoin") && !allowed(name) => name
    }
    assert(offenders.isEmpty, s"unexpected nested-loop joins in: $offenders")
  }

  test("no query publishes a container column (driver-comparer contract)") {
    // The driver's pandas-based comparer sorts raw cell values and
    // dies on array/map/struct cells (round-6 u3: `TypeError:
    // unhashable type: 'numpy.ndarray'`), and tools/check.py now
    // mirrors that strictness. Container-valued RESULTS must be
    // projected to scalars before publishing — posexplode (u3),
    // array_join (a2) — so the lint allows no exceptions.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val bad = try fn(spark, "/root/testdata/sf0.001").schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] => f.name
      } catch { case _: Throwable => Array.empty[String] } // planning lint covers throws
      if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"container-typed output columns (driver cannot sort them): $offenders")
  }

  test("no query plans a CartesianProduct") {
    // BroadcastNestedLoopJoin (small side broadcast) is the intended
    // shape for the deliberate cross joins; CartesianProduct means
    // BOTH sides stream — the plan that detonates at scale
    val offenders = plans.collect {
      case (name, p) if p.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
