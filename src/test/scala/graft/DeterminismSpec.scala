package graft

/** §5.4 determinism harness — the SAMPLED checks. The two full-tree
  * determinism gates (1-vs-default shuffle partitions, emptiness) now
  * ride GoldenSpec's single full-tree execution (the r13 suite-time
  * fold); this suite keeps the orthogonal runtime-planning checks.
  */
class DeterminismSpec extends SparkSpec {

  test("representative queries are invariant to AQE on/off") {
    // AQE swaps join strategies and coalesces partitions at runtime —
    // cluster-dependent behavior the [D1]/[D2] conventions must make
    // invisible in results. Sample the heavy families rather than all.
    val sample = Seq("q11_join_sortmerge", "q20_agg_pricing", "q30_rank_topk",
      "q52_win_session", "q61_dedup_near", "q63_centroid_agg",
      "q66_minhash_lsh", "q77_dedup_cluster", "q79_pack_tokens")
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    val failures = sample.flatMap { name =>
      val base = SparkEntry.queries(name)(spark, Sf)
        .collect().map(_.toString).toSeq
      val off = SparkEntry.queries(name)(noAqe, Sf)
        .collect().map(_.toString).toSeq
      if (base != off) Some(name) else None
    }
    assert(failures.isEmpty, s"AQE-sensitive results: $failures")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
