package graft.streaming

import java.sql.Timestamp

import graft.Dets
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Reusable Structured Streaming topologies over the events schema —
  * the same event-time expressions the batch queries (q50–q52) gate on,
  * plus a custom stateful sessionizer (flatMapGroupsWithState), the
  * §2.9 "custom state" operator.
  *
  * Scale notes: all topologies key state by user/window so state is
  * hash-partitioned across executors; watermarks bound state size (late
  * rows are dropped, closed sessions are evicted on emission). Nothing
  * here holds unbounded per-key buffers.
  */
object EventStreams {

  /** Epoch-aligned tumbling counts + exact decimal sums per event type. */
  def tumblingCounts(events: DataFrame, window: String,
    watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), Dets.decSumD(col("value")).as("sum_value"))
      .select(Dets.tsOut(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: Timestamp,
    last_ts: Timestamp, n_events: Long)

  /** Custom stateful sessionizer: merges each user's events into
    * gap-separated sessions and emits a session once the watermark
    * passes its end + gap. Semantics match `session_window(ts, gap)` /
    * the q52 islands oracle: a gap of exactly `gapMs` starts a new
    * session, and — like session_window — OUT-OF-ORDER events within
    * the watermark are handled correctly: state holds every open
    * session (not just the newest), a late event joins the session
    * whose extended window it overlaps, starts its own if none, and
    * merges sessions it bridges. A single-session state would silently
    * fold a late event into the newer session and never move its start
    * back — diverging from the batch result on any out-of-order input.
    * State per user is bounded by the number of open sessions inside
    * the watermark horizon.
    *
    * Requires append mode + event-time watermark on the input. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long)
  : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, batch, state: GroupState[List[SessionState]]) =>
          var open = state.getOption.getOrElse(Nil)
          batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            // the event's window [t, t+gap) overlaps session
            // [start, last+gap) — strict bounds: an exactly-gap gap
            // separates (the q52 islands rule)
            val (hit, miss) = open.partition(s =>
              t < s.last + gapMs && s.start < t + gapMs)
            val merged = SessionState(
              (t +: hit.map(_.start)).min,
              (t +: hit.map(_.last)).max,
              hit.map(_.n).sum + 1)
            open = merged :: miss
          }
          // a session whose end + gap is at or below the watermark can
          // never absorb another event (all future events are above the
          // watermark) — emit it, in start order for determinism
          val wm = state.getCurrentWatermarkMs()
          val (done, live) = open.partition(s => s.last + gapMs <= wm)
          val closed = done.sortBy(_.start).map { s =>
            ClosedSession(user, new Timestamp(s.start),
              new Timestamp(s.last), s.n)
          }
          if (live.isEmpty) state.remove()
          else {
            state.update(live)
            // wake when the earliest open session becomes closable
            state.setTimeoutTimestamp(live.map(_.last).min + gapMs)
          }
          closed.iterator
      }
  }

  /** One row per key: the newest by `order` — q81's latest-wins
    * semantics, shared by batch and incremental paths. Defaults bind to
    * the events schema (per user, newest (ts, event_id)). Runs through
    * the bounded-heap top-k operator: an argmax per key needs no full
    * sort of each key's history. `order` must be total (include a unique
    * id) for a deterministic winner. */
  def latestWins(events: DataFrame,
    keys: Seq[Column] = Seq(col("user_id")),
    order: Seq[Column] =
      Seq(col("ts").desc_nulls_last, col("event_id").desc_nulls_last))
  : DataFrame =
    graft.plans.GraftOps.topKPerGroup(events, keys, order, 1, rankName = "__rn")
      .drop("__rn")

  /** Incremental latest-wins compaction: merges each micro-batch into a
    * parquet snapshot keyed by user_id (the staging→serving upsert an
    * incremental ETL performs). Each batch unions the previous snapshot
    * generation with the new rows, re-resolves latest-wins, and writes a
    * NEW generation directory before retargeting — never rewriting the
    * generation it read, so a crashed batch leaves the previous snapshot
    * intact. Latest-wins is associative (argmax of (ts,event_id)), so
    * per-batch folding equals recomputing over the full log.
    *
    * Scale notes: each batch shuffles only on user_id; the snapshot stays
    * partitioned by the write and at 100 TB would be bucketed by user_id
    * so the merge join is co-located. A production variant would use a
    * transactional table format for the generation swap; plain parquet +
    * generation dirs keeps the same semantics dependency-free.
    */
  def upsertSnapshot(events: DataFrame, snapshotRoot: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    foldSnapshot(events, snapshotRoot) { (prev, batch) =>
      prev match {
        case Some(p) =>
          latestWins(p.unionByName(batch.select(p.columns.map(col): _*)))
        case None => latestWins(batch)
      }
    }

  /** The generation-compaction kernel shared by [[upsertSnapshot]] and
    * [[aggSnapshot]]: each micro-batch folds the previous snapshot
    * generation with the new rows via `fold` and writes a NEW
    * generation directory before retargeting — never rewriting the
    * generation it read, so a crashed batch leaves the previous
    * snapshot intact (`_SUCCESS`-gated, see [[completedGens]]).
    * Superseded generations are pruned: crash safety needs the one
    * just written plus the completed one it derived from, nothing
    * older — without the prune the lake grows a full snapshot copy
    * per micro-batch. `fold` must be associative-by-construction
    * (latest-wins argmax, keyed decimal re-sum) so per-batch folding
    * equals recomputing over the full log. */
  def foldSnapshot(stream: DataFrame, snapshotRoot: String)(
    fold: (Option[DataFrame], DataFrame) => DataFrame)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val root = new java.io.File(snapshotRoot)
    root.mkdirs()
    def gens = completedGens(root)
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val cur = gens.lastOption
      val prev = cur.map(g => spark.read.parquet(s"$snapshotRoot/gen_$g"))
      fold(prev, batch).write.mode("overwrite")
        .parquet(s"$snapshotRoot/gen_${cur.fold(0L)(_ + 1)}")
      gens.dropRight(2).foreach { g =>
        deleteRecursively(new java.io.File(root, s"gen_$g"))
      }
      ()
    }.outputMode(OutputMode.Append).start()
  }

  /** Incremental keyed-aggregate compaction — the micro-batch reporting
    * cadence: `aggOf` maps each arriving fact micro-batch to a keyed
    * partial whose non-key columns are all re-summable (decimal sums,
    * counts), and each batch folds `prev ∪ partial` back down with one
    * `groupBy(keys).sum`. Exactness: decimal sums and counts are
    * associative, so the snapshot equals the one-shot aggregate over
    * everything ingested so far — a report finisher (share window,
    * top-k) derives the exact batch report from the snapshot at any
    * point. Scale shape: each micro-batch pays one keyed shuffle of
    * partial rows (dimension-bounded, never the fact rows), and the
    * snapshot stays aggregate-sized. */
  def aggSnapshot(stream: DataFrame, snapshotRoot: String,
    keys: Seq[String])(aggOf: DataFrame => DataFrame)
  : org.apache.spark.sql.streaming.StreamingQuery =
    foldSnapshot(stream, snapshotRoot) { (prev, batch) =>
      val part = aggOf(batch)
      prev match {
        case Some(p) =>
          val valCols = p.columns.filterNot(keys.contains).toSeq
          p.unionByName(part.select(p.columns.map(col): _*))
            .groupBy(keys.map(col): _*)
            .agg(sum(col(valCols.head)).as(valCols.head),
              valCols.tail.map(c => sum(col(c)).as(c)): _*)
        case None => part
      }
    }

  /** Incremental KMV distinct-count sketch per event type — the
    * streaming sibling of the gated q239 batch sketch, and the reason
    * KMV (not HLL) is this engine's distinct sketch: the state is the
    * K smallest DISTINCT portable hashes per group, and "K smallest of
    * (prev K-min ∪ batch K-min)" equals "K smallest over the whole
    * log" by construction, so the fold is EXACT — the snapshot after
    * the last micro-batch carries the identical h_K (and hence the
    * identical estimate) as the one-shot batch sketch, bit for bit
    * (StreamingSpec pins the agreement). State: ≤ K rows per group.
    * NULL user ids are excluded (q239 contract). */
  def kmvStream(events: DataFrame, snapshotRoot: String, k: Int = 64)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val hashM = graft.functions.TextFunctions.HashMod
    foldSnapshot(events, snapshotRoot) { (prev, batch) =>
      val bh = batch.filter(col("user_id").isNotNull)
        .select(col("event_type"),
          graft.operators.GraphQueries.polyMix(
            pmod(col("user_id"), lit(hashM))).as("h"))
        .distinct()
      val all = prev match {
        case Some(p) => p.select("event_type", "h").unionByName(bh).distinct()
        case None => bh
      }
      graft.plans.GraftOps.topKPerGroup(all, Seq(col("event_type")),
          Seq(col("h").asc), k, rankName = "__rn")
        .select("event_type", "h")
    }
  }

  /** Finish [[kmvStream]]'s snapshot to per-group estimates:
    * (event_type, kmv_est) with the same (K−1)·M div h_K integer
    * estimator as q239 (exact sketch size when a group holds fewer
    * than K hashes). */
  def kmvReport(snapshot: DataFrame, k: Int = 64): DataFrame = {
    val hashM = graft.functions.TextFunctions.HashMod
    snapshot.groupBy("event_type")
      .agg(count(lit(1)).as("nh"), max(col("h")).as("hk"))
      .select(col("event_type"),
        when(col("nh") < k || col("hk") === 0, col("nh"))
          .otherwise(expr(s"(${k - 1}L * ${hashM}L) div hk"))
          .as("kmv_est"))
      .orderBy("event_type")
  }

  /** Incremental sampled-quantile state — the streaming sibling of the
    * gated q240 batch estimator: each lineitem micro-batch contributes
    * its polyMix-sampled rows' value histogram, and keyed count
    * histograms are RE-SUMMABLE, so the folded snapshot equals the
    * one-shot sample histogram exactly and [[sampledQuantileReport]]
    * reproduces the batch quantiles bit-for-bit at any fold point
    * (StreamingSpec pins it). State: one row per distinct
    * (returnflag, sampled price) — bounded by the SAMPLE, 16× smaller
    * than the data's value domain. */
  def sampledQuantileStream(lineitem: DataFrame, snapshotRoot: String,
    oneIn: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    aggSnapshot(lineitem, snapshotRoot,
      Seq("l_returnflag", "l_extendedprice")) { b =>
      b.filter(pmod(graft.operators.GraphQueries.pairMix(
          col("l_orderkey"), col("l_linenumber")), lit(oneIn.toLong)) === 0)
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(count(lit(1)).as("cnt"))
    }

  /** Finish [[sampledQuantileStream]]'s histogram snapshot to the q240
    * report: (l_returnflag, n_sample, p25, p50, p75) via the same
    * cumulative-sum thresholds. */
  def sampledQuantileReport(snapshot: DataFrame): DataFrame =
    graft.functions.GlobalRank
      .cumSum(snapshot, "l_returnflag", "l_extendedprice", "cnt")
      .groupBy("l_returnflag")
      .agg(max(col("n")).as("n_sample"),
        min(when(col("cum") * 4 >= col("n"), col("l_extendedprice")))
          .as("p25"),
        min(when(col("cum") * 2 >= col("n"), col("l_extendedprice")))
          .as("p50"),
        min(when(col("cum") * 4 >= col("n") * 3, col("l_extendedprice")))
          .as("p75"))
      .orderBy("l_returnflag")

  /** Streaming market-share: lineitem micro-batches (the COPY cadence —
    * each batch is a fresh fact-file load) fold into the keyed revenue
    * snapshot via the SAME join+rollup stage the batch endpoint uses
    * ([[graft.api.EtlService.marketShareAgg]]); derive the report at
    * any point with `marketShareReport(readSnapshot(...).get)`. Static
    * dims join against each micro-batch inside foreachBatch. */
  def marketShareStream(lineitemStream: DataFrame, orders: DataFrame,
    customer: DataFrame, nation: DataFrame, region: DataFrame,
    part: DataFrame, from: Timestamp, until: Timestamp,
    snapshotRoot: String): org.apache.spark.sql.streaming.StreamingQuery =
    aggSnapshot(lineitemStream, snapshotRoot,
      Seq("region", "part_type", "yr")) { b =>
      new graft.api.EtlService(b.sparkSession).marketShareAgg(
        b, orders, customer, nation, region, part, from, until)
    }

  /** Streaming returned-items loss ledger: the per-customer lost-revenue
    * partials fold per micro-batch
    * ([[graft.api.EtlService.returnedLossAgg]]); finish to the ranked
    * report with `returnedItemsReport(readSnapshot(...).get, ...)`. */
  def returnedItemsStream(lineitemStream: DataFrame, orders: DataFrame,
    from: Timestamp, until: Timestamp, snapshotRoot: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    aggSnapshot(lineitemStream, snapshotRoot, Seq("o_custkey")) { b =>
      new graft.api.EtlService(b.sparkSession).returnedLossAgg(
        b, orders, from, until)
    }

  /** Streaming rolling-7-day-active-users: the q177 WAU curve folded
    * incrementally. Each event micro-batch fans its distinct
    * (user, day) pairs out to the 7 target days they contribute to
    * (q177's constant fan-out — no range join in the stream either)
    * and folds into a (day, user)-keyed snapshot. Distinctness under
    * re-summable merge: the DERIVED report counts snapshot KEYS, so
    * duplicate arrivals only inflate the summed hit counters, never
    * the WAU. `n_origin` (hits where target == source day) marks which
    * days actually occurred, so the report emits exactly q177's day
    * set. Snapshot size is (active days × 7) × users — bounded by the
    * dimension product, never the event volume. */
  def rollingWauStream(events: DataFrame, snapshotRoot: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    aggSnapshot(events, snapshotRoot, Seq("day", "user_id")) { b =>
      b.select(col("user_id"), to_date(col("ts")).as("src"))
        .withColumn("day", explode(expr("sequence(src, date_add(src, 6))")))
        .groupBy("day", "user_id")
        .agg(count(lit(1)).as("n_hits"),
          sum(when(col("day") === col("src"), 1L).otherwise(0L))
            .as("n_origin"))
    }

  /** Streaming day-of-week × hour heatmap: each event micro-batch folds
    * its 168-cell count partial into the snapshot (plain re-summable
    * counts — the simplest aggSnapshot instance). The weekday derives
    * from the epoch day exactly as the q211 batch query does (the
    * portable (days + 3) mod 7 form), so the finished report is
    * bit-identical to the batch heatmap at any fold point. */
  def dowHourStream(events: DataFrame, snapshotRoot: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    aggSnapshot(events, snapshotRoot, Seq("dow", "hod")) { b =>
      b.select(((datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")) + 3) % 7).as("dow"),
          hour(col("ts")).as("hod"))
        .groupBy("dow", "hod").agg(count(lit(1)).as("n"))
    }

  /** Finish [[dowHourStream]]'s snapshot to the q211 report (share of
    * total per cell). */
  def dowHourReport(snapshot: DataFrame): DataFrame = {
    val cells = snapshot
    cells.crossJoin(broadcast(cells.agg(sum(col("n")).as("tot"))))
      .select(col("dow"), col("hod"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("share6"))
      .orderBy("dow", "hod")
  }

  /** Finish [[rollingWauStream]]'s snapshot to the q177 report: WAU =
    * distinct snapshot keys per day, restricted to days with at least
    * one origin hit (days that actually occurred in the stream). */
  def rollingWauReport(snapshot: DataFrame): DataFrame = {
    val days = snapshot.groupBy("day")
      .agg(sum(col("n_origin")).as("no"))
      .filter(col("no") > 0).select("day")
    snapshot.join(days, Seq("day"))
      .groupBy("day").agg(count(lit(1)).as("wau"))
      .select(graft.Dets.tsOut(col("day").cast("timestamp")).as("day"),
        col("wau"))
      .orderBy("day")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Interval join of two event streams: every (signup, purchase) of the
    * same user with the purchase inside [signup_ts, signup_ts + horizon]
    * — q17's range-join semantics, shared by the batch query (where the
    * watermarks are no-ops) and the streaming topology (where they bound
    * the join state: a buffered signup can be evicted once the purchase
    * watermark passes its horizon, so state never grows with the log).
    *
    * Scale notes: Spark plans this as a stream-stream join keyed on
    * user_id — state is hash-partitioned across executors, and the time
    * -range predicate is what lets the state manager compute eviction
    * bounds; an unconstrained stream join would buffer forever. */
  def attributionJoin(signups: DataFrame, purchases: DataFrame,
    horizon: String = "1 HOUR", watermark: String = "2 hours"): DataFrame = {
    val s = signups.select(col("event_id").as("signup_id"), col("user_id"),
      col("ts").as("signup_ts")).withWatermark("signup_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    s.join(p, col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $horizon"))
      .select(col("signup_id"), col("purchase_id"), col("user_id"),
        Dets.tsOut(col("signup_ts")).as("signup_ts"),
        Dets.tsOut(col("purchase_ts")).as("purchase_ts"))
  }

  /** A generation is current only once its `_SUCCESS` marker exists
    * (Spark's file committer writes it after all tasks commit) — a batch
    * that crashes mid-write leaves a partial gen_N dir that must never be
    * read as the snapshot, or its missing rows are silently lost. */
  private def completedGens(root: java.io.File): Array[Long] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.getName.startsWith("gen_") &&
        new java.io.File(d, "_SUCCESS").exists())
      .map(_.getName.stripPrefix("gen_").toLong).sorted

  /** Streamed sibling of q369's incremental aggregate maintenance
    * (r13 verdict item 5): the monthly revenue rollup maintained from
    * ORDER micro-batches. Each arriving batch contributes a
    * month-keyed partial carrying the q369 base/delta split (the
    * seeded polyMix parity of the order key, [D1]) as four re-summable
    * columns; [[aggSnapshot]] folds prev ∪ partial with one keyed sum,
    * so after the last micro-batch the snapshot equals the one-shot
    * partials over the whole log exactly — counts and integer-cent
    * sums are associative. [[revenueMaintenanceReport]] renders the
    * snapshot in q369's exact output schema, and StreamingSpec pins
    * the streamed form bit-for-bit against the batch key. Scale: each
    * micro-batch pays one keyed shuffle of month-sized partials, never
    * a history rescan — the nightly-ETL shape q369's batch identity
    * justifies, now demonstrated on the stream. */
  def revenueMaintenanceStream(orders: DataFrame, snapshotRoot: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    aggSnapshot(orders, snapshotRoot, Seq("month")) { batch =>
      val hm = graft.operators.GraphQueries.HashM
      batch
        .withColumn("flag", pmod(graft.operators.GraphQueries.polyMix(
          pmod(col("o_orderkey"), lit(hm))), lit(2L)))
        .withColumn("month", date_trunc("month", col("o_orderdate")))
        .withColumn("cents",
          round(col("o_totalprice") * 100).cast("long"))
        .groupBy("month")
        .agg(
          sum(when(col("flag") === 0L, 1L).otherwise(0L)).as("n_base"),
          sum(when(col("flag") === 0L, col("cents")).otherwise(0L))
            .as("c_base"),
          sum(when(col("flag") === 1L, 1L).otherwise(0L)).as("n_delta"),
          sum(when(col("flag") === 1L, col("cents")).otherwise(0L))
            .as("c_delta"))
    }

  /** q369's output schema over a [[revenueMaintenanceStream]] snapshot. */
  def revenueMaintenanceReport(snapshot: DataFrame): DataFrame =
    snapshot.select(Dets.tsOut(col("month")).as("month"),
      col("n_base"), col("n_delta"),
      (col("n_base") + col("n_delta")).as("n_orders"),
      (col("c_base") + col("c_delta")).as("revenue_cents"))
      .orderBy("month")

  /** Read the current snapshot generation (empty None if no batch ran). */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
    snapshotRoot: String): Option[DataFrame] = {
    val gs = completedGens(new java.io.File(snapshotRoot))
    gs.lastOption.map(g => spark.read.parquet(s"$snapshotRoot/gen_$g"))
  }
}
