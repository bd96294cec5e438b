package graft

/** §5.4 determinism harness: every declared query must produce identical
  * rows no matter how the data is partitioned — the local stand-in for
  * "same answer on 8 threads and on 1000 executors". Catches
  * partition-order-dependent float sums, unordered limits, and
  * collect_list without array_sort before the driver's gate does.
  */
class DeterminismSpec extends SparkSpec {

  test("all queries are invariant to shuffle partition count") {
    val narrow = spark.newSession()
    narrow.conf.set("spark.sql.shuffle.partitions", "1")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val base = fn(spark, Sf).collect().map(_.toString).toSeq
        val single = fn(narrow, Sf).collect().map(_.toString).toSeq
        if (base != single) Some(name) else None
    }
    assert(failures.isEmpty, s"nondeterministic queries: $failures")
  }

  test("representative queries are invariant to AQE on/off") {
    // AQE swaps join strategies and coalesces partitions at runtime —
    // cluster-dependent behavior the [D1]/[D2] conventions must make
    // invisible in results. Sample the heavy families rather than all 64.
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

  test("every query returns rows at sf0.001 (except known-empty)") {
    // q338: at sf0.001 the daily revenue series is too sparse for any
    // 12-consecutive-calendar-day window to be full, so the MACD
    // full-window cut legitimately yields zero rows (2268 at sf0.01).
    val mayBeEmpty = Set("q15_join_anti", "q39_except", "q69_embed_neardup",
      "q338_macd")
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if !mayBeEmpty(name) && fn(spark, Sf).isEmpty => name
    }
    assert(empty.isEmpty, s"unexpectedly empty: $empty")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
