package graft

/** Structural invariants for the round-13 additions (q359–q372) —
  * value-level correctness is the DuckDB oracle's job; these pin
  * cross-metric identities and bounds the oracle cannot see (the
  * code-health census at two geometries sharing one corpus mass, the
  * MRL identity row, digest-dedup vs the q60 exact-dedup clusters,
  * merge-of-partials totals vs the raw table, BH rank/q-value
  * structure, Mann–Kendall vs Pettitt on the same pair relation).
  * Everything runs at sf0.001 off the session-memoized relations.
  */
class Round13Spec extends SparkSpec {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, Sf).collect()

  private def d(r: org.apache.spark.sql.Row, c: String): Double =
    r.getAs[Double](c)
  private def l(r: org.apache.spark.sql.Row, c: String): Long =
    r.getAs[Long](c)
  private def i(r: org.apache.spark.sql.Row, c: String): Int =
    r.getAs[Int](c)

  test("q359/q341: both code-health censuses assign the whole corpus " +
    "and used + dead = ksub at each geometry") {
    val prod = rows("q359_pq_code_health_prod")
    val trace = rows("q341_pq_code_health")
    assert(prod.length == 16 && trace.length == operators.VectorQueries.PqTrM)
    val massP = prod.map(r => l(r, "n_assigned")).distinct
    val massT = trace.map(r => l(r, "n_assigned")).distinct
    assert(massP.length == 1 && massT.length == 1)
    // same corpus, same non-null milli-quantized vectors -> same mass
    assert(massP.head == massT.head)
    prod.foreach(r => assert(l(r, "n_used") + l(r, "n_dead") == 16L))
  }

  test("q364/q345: same matched panel; Tornqvist is positive and sits " +
    "near the Laspeyres-Paasche band like a superlative index should") {
    val tq = rows("q364_tornqvist").head
    val fi = rows("q345_price_index").head
    assert(l(tq, "n_parts") == l(fi, "n_parts"))
    val t = d(tq, "tornqvist4")
    val las = d(fi, "laspeyres4"); val paa = d(fi, "paasche4")
    assert(t > 0.0)
    assert(t >= math.min(las, paa) * 0.9 && t <= math.max(las, paa) * 1.1)
  }

  test("q366 MRL ladder: full width is the identity row; every rung " +
    "shares the probe pool and its truth size") {
    val rs = rows("q366_matryoshka_recall")
    assert(rs.map(r => i(r, "dims")).toSeq == Seq(8, 16, 32, 64))
    val np = rs.map(r => l(r, "n_probes")).distinct
    assert(np.length == 1 && np.head > 0)
    rs.foreach { r =>
      assert(l(r, "n_true") == 3 * l(r, "n_probes"))
      assert(l(r, "n_overlap") >= 0 && l(r, "n_overlap") <= l(r, "n_true"))
    }
    val full = rs.find(r => i(r, "dims") == 64).get
    assert(l(full, "n_overlap") == l(full, "n_true"))
    assert(l(full, "recall_pm") == 1000L)
  }

  test("q367 digest dedup agrees with the q60 exact-dedup clusters") {
    val m = rows("q367_media_dedup").head
    val groups = rows("q60_dedup_exact")
    assert(l(m, "n_distinct") == groups.length)
    assert(l(m, "n_media") == groups.map(r => l(r, "n_copies")).sum)
    assert(l(m, "n_redundant") ==
      groups.map(r => l(r, "n_copies") - 1).sum)
    assert(l(m, "max_clique") ==
      groups.map(r => l(r, "n_copies")).max)
    assert(l(m, "redundant_bytes") <= l(m, "total_bytes"))
    assert(l(m, "savings_pm") >= 0 && l(m, "savings_pm") < 1000)
  }

  test("q369 maintenance rollup conserves the raw orders table") {
    val rs = rows("q369_agg_maintenance")
    val orders = Tables.load(spark, Sf, "orders")
    assert(rs.map(r => l(r, "n_orders")).sum == orders.count())
    rs.foreach(r =>
      assert(l(r, "n_base") + l(r, "n_delta") == l(r, "n_orders")))
    val cents = orders.selectExpr(
      "sum(cast(round(o_totalprice * 100) as bigint)) c")
      .collect().head.getLong(0)
    assert(rs.map(r => l(r, "revenue_cents")).sum == cents)
  }

  test("q371 steady state: both distributions sum to ~1, tv matches " +
    "its own gaps, and gaps bound tv") {
    val rs = rows("q371_markov_steady")
    assert(rs.nonEmpty)
    val sPi = rs.map(r => d(r, "pi_steady8")).sum
    val sEmp = rs.map(r => d(r, "emp8")).sum
    assert(math.abs(sPi - 1.0) < 1e-5, s"pi mass $sPi")
    assert(math.abs(sEmp - 1.0) < 1e-5, s"emp mass $sEmp")
    val tv = d(rs.head, "tv6")
    assert(rs.forall(r => math.abs(d(r, "tv6") - tv) == 0.0))
    assert(tv >= 0.0 && tv <= 1.0)
    val half = rs.map(r => d(r, "gap8")).sum / 2.0
    assert(math.abs(tv - half) < 1e-5)
  }

  test("q372 BH: ranks are a permutation, q-values are a nondecreasing " +
    "step-up envelope, rejections form a rank prefix") {
    val rs = rows("q372_bh_fdr").sortBy(r => l(r, "bh_rank"))
    assert(rs.map(r => l(r, "bh_rank")).toSeq ==
      (1L to rs.length.toLong))
    val qs = rs.map(r => d(r, "qval8"))
    assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
    rs.foreach { r =>
      assert(d(r, "p8") >= 0.0 && d(r, "p8") <= 1.0)
      // min over j>=i of p_j*m/j >= p_j >= p_i: adjusting never
      // drops a q-value below its own p
      assert(d(r, "qval8") >= d(r, "p8") - 1e-9)
    }
    val rejects = rs.map(r => i(r, "reject"))
    assert(rejects.zip(rejects.tail).forall { case (a, b) => a >= b },
      "rejections must be a prefix of the rank order")
  }

  test("q360/q363 agree on the daily series: same n_days, z sign " +
    "follows S, |U*| = K, p in [0,1]") {
    val mk = rows("q360_mann_kendall").head
    val pt = rows("q363_pettitt").head
    assert(l(mk, "n_days") == l(pt, "n_days"))
    val s = l(mk, "s_stat")
    val z = d(mk, "z4")
    if (s > 0) assert(z > 0) else if (s < 0) assert(z < 0)
    assert(math.abs(l(pt, "u_at_t")) == l(pt, "k_stat"))
    assert(d(pt, "p4") >= 0.0 && d(pt, "p4") <= 1.0)
    val n = l(mk, "n_days")
    assert(l(pt, "k_stat") <= n * (n - 1) / 2)
  }

  test("q362/q94 rank the same matched candidate pool") {
    val qlm = rows("q362_dirichlet_qlm")
    val bm = rows("q94_bm25")
    assert(qlm.length == bm.length && qlm.nonEmpty)
    assert(qlm.map(r => i(r, "rank")).toSeq == (1 to qlm.length))
    assert(bm.map(r => i(r, "rank")).toSeq == (1 to bm.length))
  }

  test("q365/q249 read the same per-language label masses") {
    val ap = rows("q365_avg_precision")
      .map(r => r.getAs[String]("lang") -> (l(r, "n_pos"), l(r, "n_neg")))
      .toMap
    val auc = rows("q249_quality_auc")
      .map(r => r.getAs[String]("lang") -> (l(r, "n_pos"), l(r, "n_neg")))
      .toMap
    // q365 drops zero-keep langs; every lang it keeps must match q249
    assert(ap.nonEmpty)
    ap.foreach { case (lang, m) => assert(auc(lang) == m) }
    ap.foreach { case (_, (np, _)) => assert(np > 0) }
    rows("q365_avg_precision").foreach { r =>
      assert(d(r, "ap6") >= 0.0 && d(r, "ap6") <= 1.0 + 1e-9)
      assert(d(r, "prev6") > 0.0 && d(r, "prev6") < 1.0)
    }
  }

  test("q368 Hurst: one slope for the whole ladder and block counts " +
    "bounded by the calendar") {
    val rs = rows("q368_hurst").sortBy(r => l(r, "block_len"))
    assert(rs.map(r => l(r, "block_len")).toSeq ==
      Seq(16L, 32L, 64L, 128L))
    val n = l(rows("q360_mann_kendall").head, "n_days")
    rs.foreach(r => assert(l(r, "n_blocks") <= n / l(r, "block_len")))
    val hs = rs.map(r => Option(r.getAs[java.lang.Double]("hurst4")))
    assert(hs.distinct.length == 1, "hurst must be ladder-constant")
  }

  test("q361 alpha is bounded and its variances are consistent") {
    val r = rows("q361_cronbach_alpha").head
    assert(l(r, "n_docs") > 0)
    Seq("var_wlen6", "var_ttr6", "var_stop6", "var_tot6")
      .foreach(c => assert(d(r, c) >= 0.0))
    assert(d(r, "alpha4") <= 1.0 + 1e-9)
  }

  test("q373 spatial join: one row per customer, matches stay inside " +
    "the ring's metric reach") {
    val rs = rows("q373_geo_grid_knn")
    assert(rs.length == Tables.load(spark, Sf, "customer").count())
    rs.foreach { r =>
      val f = i(r, "found")
      assert(f == 0 || f == 1)
      if (f == 1) {
        val d2 = l(r, "d2")
        // nearest candidate sits in the 3x3 ring of 30-degree cells:
        // each wrapped axis delta is under two cell widths
        assert(d2 >= 0 && d2 < 2L * 60000000L * 60000000L)
      } else assert(r.isNullAt(r.fieldIndex("nearest_supp")))
    }
  }

  test("q374 seasonal strength is a [0,1] variance share over the " +
    "interior days") {
    val rs = rows("q374_seasonal_strength")
    // sf0.001's daily series is gappy: only weekdays owning at least
    // one complete centered window appear (all 7 at sf >= 0.01)
    assert(rs.nonEmpty && rs.length <= 7)
    val st = rs.map(r => d(r, "strength4")).distinct
    assert(st.length == 1 && st.head >= 0.0 && st.head <= 1.0)
    rs.foreach(r => assert(d(r, "var_d6") >= 0.0 && d(r, "var_r6") >= 0.0))
    val nDays = l(rows("q360_mann_kendall").head, "n_days")
    assert(rs.map(r => l(r, "n_days")).sum <= nDays - 6)
  }

  test("q375 Hill estimator reads exactly k order statistics above a " +
    "positive threshold") {
    val r = rows("q375_hill_tail").head
    assert(l(r, "k") == 100L)
    assert(l(r, "xmin_cents") > 0L)
    assert(d(r, "hill_alpha4") > 0.0)
  }

  test("q376 skew audit: percentiles are ordered, totals match the " +
    "fact table, skew >= 1") {
    val r = rows("q376_join_skew_audit").head
    assert(l(r, "n_rows") == Tables.load(spark, Sf, "lineitem").count())
    assert(l(r, "p50_rows") <= l(r, "p99_rows"))
    assert(l(r, "p99_rows") <= l(r, "max_rows"))
    assert(d(r, "skew4") >= 1.0 - 1e-9)
  }

  test("q377 Bloom planner: tighter fpp costs monotonically more bits " +
    "and hashes") {
    val rs = rows("q377_bloom_planner").sortBy(r => -i(r, "fpp_ppm"))
    assert(rs.map(r => i(r, "fpp_ppm")).toSeq == Seq(10000, 1000, 100))
    val ms = rs.map(r => l(r, "m_bits"))
    val ks = rs.map(r => l(r, "k_hashes"))
    assert(ms.zip(ms.tail).forall { case (a, b) => a < b })
    assert(ks.toSeq == Seq(7L, 10L, 13L))
    rs.foreach(r => assert(math.abs(d(r, "mib4")
      - l(r, "m_bits").toDouble / 8388608.0) < 1e-3))
  }

  test("q378 length-bias buckets partition the corpus") {
    val rs = rows("q378_dup_length_bias")
    assert(rs.map(r => l(r, "n_docs")).sum ==
      Tables.load(spark, Sf, "documents").count())
    val buckets = rs.map(_.getAs[String]("bucket")).toSet
    assert(buckets.subsetOf(Set("0", "1", "2", "3+")))
    rs.foreach(r => assert(l(r, "mean_chars") > 0L))
  }

  test("q380 W1 is a nonnegative mass move over the full corpus, " +
    "bounded by the length range") {
    val r = rows("q380_wasserstein").head
    val docs = Tables.load(spark, Sf, "documents")
    assert(l(r, "n_focus") + l(r, "n_rest") == docs.count())
    val range = docs.selectExpr("max(n_chars) - min(n_chars) r")
      .collect().head.getAs[Number]("r").longValue()
    assert(d(r, "w1_chars6") >= 0.0 && d(r, "w1_chars6") <= range)
  }

  test("q370 keyness scores are nonnegative evidence with exact " +
    "focus+rest counts") {
    val rs = rows("q370_keyness_g2")
    assert(rs.nonEmpty && rs.length <= 15)
    rs.foreach { r =>
      assert(d(r, "g2_6") >= 0.0)
      assert(l(r, "n_focus") + l(r, "n_rest") > 0)
      val ov = i(r, "overused")
      assert(ov == 0 || ov == 1)
    }
    val gs = rs.map(r => d(r, "g2_6"))
    assert(gs.zip(gs.tail).forall { case (a, b) => a >= b })
  }
}
