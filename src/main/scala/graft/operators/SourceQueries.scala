package graft.operators

import graft.{Dets, Tables}
import graft.sources.LakeWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.1 COPY/UNLOAD round-trips as ORACLE-GATED queries (round 6 —
  * previously unit-test-only because no CSV/JSON fixtures ship).
  *
  * The gate works without text fixtures: each query UNLOADs a parquet
  * table to CSV/JSON in a temp dir, COPYs it back with the explicit
  * schema, and aggregates the re-read rows; the DuckDB oracle runs the
  * same aggregation on the ORIGINAL parquet. Any write-side formatting
  * loss or read-side parse drift (doubles through Double.toString,
  * timestamps through the ISO JSON format, nulls, quoting) breaks the
  * hash — so the whole text codec path sits under the same per-cell
  * gate as every relational operator.
  *
  * Scale shape: both legs are one pass (write is a narrow map to text,
  * read is a schema-pinned scan), and the aggregation collapses
  * map-side. The temp lake is a FIXED per-query directory under
  * java.io.tmpdir — `mode(overwrite)` replaces it on every invocation
  * (so repeated gate sweeps don't accumulate table-sized copies) and a
  * shutdown hook removes it when the JVM exits.
  */
object SourceQueries {

  private val tmpDirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.io.File]())

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    tmpDirs.forEach(deleteRecursively)))

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
    ()
  }

  private def tmp(prefix: String): String = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"), prefix)
    d.mkdirs()
    tmpDirs.synchronized {
      if (!tmpDirs.contains(d)) { tmpDirs.add(d); () }
    }
    d.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CSV round-trip: customer (i64/i32/string/double columns) out and
    // back, then a per-segment rollup. Java's Double.toString emits the
    // shortest digits that reparse to the same double, so the decimal
    // sum over the re-read acctbal matches the parquet oracle exactly.
    "q129_csv_copy" -> ((s, dir) => {
      val out = tmp("graft_csv_copy")
      val cust = Tables.load(s, dir, "customer")
      LakeWriter.unloadCsv(cust, out)
      LakeWriter.copyCsv(s, out, Tables.schemas("customer"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_cust"),
          Dets.decSumD(col("c_acctbal")).as("sum_bal"),
          count_distinct(col("c_nationkey")).as("n_nations"))
        .orderBy("segment")
    }),

    // JSON-lines round-trip: orders (timestamp + string + double) out
    // and back, then a per-(status, year) rollup — gating the ISO
    // timestamp write/parse leg in particular.
    "q130_json_copy" -> ((s, dir) => {
      val out = tmp("graft_json_copy")
      val orders = Tables.load(s, dir, "orders")
      LakeWriter.unloadJson(orders, out)
      LakeWriter.copyJson(s, out, Tables.schemas("orders"))
        .groupBy(col("o_orderstatus").as("status"),
          year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n_orders"),
          Dets.decSumD(col("o_totalprice")).as("sum_price"))
        .orderBy("status", "yr")
    }),

    // Pipe-delimited round-trip (the Redshift DELIMITER '|' COPY):
    // supplier out and back through the explicit-separator codec, then
    // a per-nation rollup vs the parquet oracle — gating the
    // non-default-delimiter quoting/parse leg.
    "q155_tsv_copy" -> ((s, dir) => {
      val out = tmp("graft_tsv_copy")
      val sup = Tables.load(s, dir, "supplier")
      LakeWriter.unloadDelimited(sup, out, "|")
      LakeWriter.copyDelimited(s, out, Tables.schemas("supplier"), "|")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"),
          Dets.decSumD(col("s_acctbal")).as("sum_bal"))
        .orderBy("s_nationkey")
    }),

    // ORC round-trip: part out and back through Spark's native ORC
    // source (the columnar interchange format), then a per-brand
    // rollup vs the parquet oracle — typed binary both legs, gating
    // the schema-pinned ORC read/write path.
    "q157_orc_copy" -> ((s, dir) => {
      val out = tmp("graft_orc_copy")
      val part = Tables.load(s, dir, "part")
      LakeWriter.unloadOrc(part, out)
      LakeWriter.copyOrc(s, out, Tables.schemas("part"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
          Dets.decSumD(col("p_retailprice")).as("sum_price"),
          Dets.decAvg(col("p_size")).as("avg_size"))
        .orderBy("p_brand")
    }),

    // Schema-evolution read: two parquet generations of the orders
    // lake with DIFFERENT column sets (the early files lack the later
    // columns and vice versa) read back through mergeSchema, which
    // unions the schemas and null-fills the columns each file lacks.
    // The aggregate counts per-column presence and decimal-sums the
    // column only one generation carries — any drift in the merge
    // (column misalignment, type widening, wrong null-fill) breaks the
    // hash vs the UNION-ALL-BY-NAME oracle replay on the original
    // table.
    "q166_schema_evolution" -> ((s, dir) => {
      val out = tmp("graft_schema_evo")
      val orders = Tables.load(s, dir, "orders")
      orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$out/gen0")
      orders.select("o_orderkey", "o_orderstatus", "o_orderdate")
        .write.mode("overwrite").parquet(s"$out/gen1")
      s.read.option("mergeSchema", "true")
        .parquet(s"$out/gen0", s"$out/gen1")
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_custkey")).as("n_with_cust"),
          count(col("o_orderstatus")).as("n_with_status"),
          Dets.decSumD(col("o_totalprice")).as("sum_price"),
          count_distinct(col("o_orderkey")).as("n_keys"))
    }),

    // Small-file compaction round-trip: fragment orders into 48 small
    // parquet files, compact to 4 via LakeWriter.compact, read back and
    // prove content survived bit-exact (row/key counts + decimal price
    // sum vs the original parquet oracle). The file-count contract
    // itself is asserted in LakeWriterSpec — the relational gate here
    // pins that compaction is content-neutral.
    "q172_compaction" -> ((s, dir) => {
      val out = tmp("graft_compact")
      val orders = Tables.load(s, dir, "orders")
      orders.repartition(48).write.mode("overwrite").parquet(s"$out/small")
      LakeWriter.compact(s, s"$out/small", s"$out/compacted", 4,
        Tables.schemas("orders"))
      s.read.schema(Tables.schemas("orders")).parquet(s"$out/compacted")
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("o_orderkey")).as("n_keys"),
          Dets.decSumD(col("o_totalprice")).as("sum_price"),
          count(col("o_orderdate")).as("n_dates"))
    }),

    // MAXERROR-style tolerant COPY: unload orders to JSON, plant
    // CorruptLines malformed lines in an extra part file, permissive-
    // copy back. Good rows must survive bit-exact (decimal price sum vs
    // the parquet oracle) and the quarantine must catch EXACTLY the
    // planted lines — the oracle pins that as a literal.
    "q131_json_quarantine" -> ((s, dir) => {
      val out = tmp("graft_json_quar")
      val orders = Tables.load(s, dir, "orders")
      LakeWriter.unloadJson(orders, out)
      val bad = new java.io.File(out, "part-corrupt.json")
      val w = new java.io.PrintWriter(bad, "UTF-8")
      try (1 to CorruptLines).foreach(i => w.println(s"{not json at all #$i"))
      finally w.close()
      val (good, corrupt) = LakeWriter.copyJsonPermissive(
        s, out, Tables.schemas("orders"))
      good.agg(count(lit(1)).as("n_good"),
          Dets.decSumD(col("o_totalprice")).as("sum_price"))
        .crossJoin(broadcast(
          corrupt.agg(count(lit(1)).as("n_corrupt"))))
        .select(col("n_good"), col("n_corrupt"), col("sum_price"))
    }),

    // Partition-pruned lake read: orders unload partitioned by order
    // year (the Spectrum/date-prefix layout LakeWriter.unloadPartitioned
    // exists for), then a year-filtered rollup off the re-read lake.
    // The filter must resolve as a PARTITION filter (directory pruning —
    // PlanShapeSpec asserts no non-1997 partition is listed), and the
    // oracle replays the same year predicate on the original table, so
    // both the layout round-trip and the pruned read are gated.
    "q207_partition_prune" -> ((s, dir) => {
      val out = tmp("graft_part_prune")
      val orders = Tables.load(s, dir, "orders")
      LakeWriter.unloadPartitioned(
        orders.withColumn("o_year", year(col("o_orderdate"))),
        out, Seq("o_year"))
      val schema = org.apache.spark.sql.types.StructType(
        Tables.schemas("orders").fields :+
          org.apache.spark.sql.types.StructField("o_year",
            org.apache.spark.sql.types.IntegerType))
      s.read.schema(schema).parquet(out)
        .filter(col("o_year") === PruneYear)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_orders"),
          Dets.decSumD(col("o_totalprice")).as("sum_price"),
          count_distinct(col("o_custkey")).as("n_cust"))
        .orderBy("status")
    }),

    // CSV quoting/escape round-trip: fields carrying the delimiter, the
    // quote char and a backslash go out through the CSV writer (which
    // must quote-and-escape them) and come back through the strict
    // reader. The gate hashes the exact string content (length sum +
    // polynomial charhash sum), so one mis-escaped byte anywhere in the
    // codec breaks it. Embedded newlines are deliberately excluded —
    // reading them needs multiLine=true, which makes the files
    // non-splittable (the wrong trade at 100 TB; documented here).
    "q208_csv_quoting" -> ((s, dir) => {
      val out = tmp("graft_csv_quote")
      val hostile = Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          concat(col("c_name"), lit(",\"|\\"), col("c_mktsegment"))
            .as("s"))
      LakeWriter.unloadCsv(hostile, out)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("c_custkey", org.apache.spark.sql.types.LongType)
        .add("s", org.apache.spark.sql.types.StringType)
      LakeWriter.copyCsv(s, out, schema)
        .agg(count(lit(1)).as("n_rows"),
          sum(length(col("s"))).cast("long").as("sum_len"),
          sum(expr("graft_charhash(s)")).as("hsum"))
    }),

    // Bucketed (DISTKEY-style) lake round-trip: both sides pre-shuffle
    // ONCE into 8 catalog-registered buckets on the join key, then the
    // orders⋈lineitem rollup runs off the bucketed tables — the
    // co-located-join layout for repeatedly-joined 100 TB facts
    // (LakeWriterSpec proves the zero-exchange plan under disabled
    // broadcast; this gates that the bucketed round-trip loses no rows
    // or values). Tables overwrite per invocation; the warehouse dir is
    // session-scoped.
    "q224_bucketed_join" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      LakeWriter.writeBucketed(
        orders.select("o_orderkey", "o_orderpriority"),
        "graft_b_orders", "o_orderkey", 8, Some("o_orderkey"))
      LakeWriter.writeBucketed(
        li.select(col("l_orderkey"), col("l_extendedprice"),
          col("l_quantity")),
        "graft_b_lineitem", "l_orderkey", 8, Some("l_orderkey"))
      s.table("graft_b_orders")
        .join(s.table("graft_b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          Dets.decSumD(col("l_extendedprice")).as("sum_price"),
          Dets.decSumD(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // Zone-map pruning audit — the block min/max statistics mechanism
    // (Redshift zone maps / parquet row-group stats) measured AGAINST
    // the table's physical order: lineitem is cut into ZmBlock-row
    // blocks under two layouts (natural load order vs shipdate
    // sort-key), each block keeps (min, max, cnt) of l_shipdate, and
    // four quarter predicates are answered from the zone maps alone —
    // blocks whose [min, max] misses the range are pruned unread. The
    // audit reports blocks pruned and rows scanned per layout: on the
    // natural layout shipdate is uncorrelated with position so ~zero
    // blocks prune; under the sort key a quarter touches only its own
    // blocks (rows_scanned collapses to ~rows_match + two boundary
    // blocks). That delta IS the sort-key decision at 100 TB — the
    // audit is what a lake optimizer reads before choosing a cluster
    // column, and it runs from the zone-map table (rows ÷ ZmBlock
    // entries), never the data. Global block ids come from
    // GlobalRank.rowNumber (range-partitioned ranking, no single-task
    // window); exact per-quarter counts ride along for self-audit.
    "q246_zonemap_prune" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      def layout(name: String, order: Seq[org.apache.spark.sql.Column]) =
        graft.functions.GlobalRank.rowNumber(li, order)
          .select(lit(name).as("layout"),
            expr(s"(rn - 1) div $ZmBlock").as("blk"), col("l_shipdate"))
      val both = layout("natural",
          Seq(col("l_orderkey"), col("l_linenumber")))
        .unionByName(layout("shipdate_sorted",
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))))
      val zm = both.groupBy("layout", "blk")
        .agg(min("l_shipdate").as("mn"), max("l_shipdate").as("mx"),
          count(lit(1)).as("cnt"))
      val wins = Seq(
        ("1995Q1", "1995-01-01", "1995-04-01"),
        ("1995Q2", "1995-04-01", "1995-07-01"),
        ("1995Q3", "1995-07-01", "1995-10-01"),
        ("1995Q4", "1995-10-01", "1996-01-01")).toDF("win", "lo", "hi")
        .select(col("win"), col("lo").cast("date"), col("hi").cast("date"))
      val pruned = col("mx") < col("lo") || col("mn") >= col("hi")
      val audit = zm.crossJoin(broadcast(wins))
        .groupBy("layout", "win")
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(pruned, 1L).otherwise(0L)).as("n_pruned"),
          sum(when(pruned, 0L).otherwise(col("cnt"))).as("rows_scanned"))
      val mt = li.crossJoin(broadcast(wins))
        .filter(col("l_shipdate") >= col("lo")
          && col("l_shipdate") < col("hi"))
        .groupBy("win").agg(count(lit(1)).as("rows_match"))
      audit.join(broadcast(mt), Seq("win"))
        .select(col("layout"), col("win"), col("n_blocks"),
          col("n_pruned"), col("rows_scanned"), col("rows_match"))
        .orderBy("layout", "win")
    }),

    // Block-Bloom data-skipping audit — the EQUALITY-predicate sibling
    // of q246's zone maps (parquet column-index bloom filters / any
    // lake's per-block membership stats): point lookups on a
    // high-cardinality column in NATURAL order are exactly where zone
    // maps die (every block's [min, max] spans the whole key domain,
    // nothing prunes), and a BfBits-bit partitioned Bloom per
    // 4096-row block (BfK affine hash rows — the CMS constant family
    // at offset BfSeed — each setting one bit in its own BfBits/BfK
    // partition) answers "block might contain k" from fixed-size
    // stats instead. The audit probes the 4 heaviest part keys and
    // reports, per key: zone-map-pruned blocks (~0, the negative
    // control), Bloom-pruned blocks, rows scanned after Bloom
    // pruning, the true block count, and the false-positive blocks
    // the Bloom let through — the number a lake optimizer reads
    // before sizing m/k at 100 TB, computed from the rows÷4096-entry
    // stats table plus one bounded probe join, never a full rescan.
    // Everything is integer hash arithmetic ([D5]); the Bloom's set
    // bits are DISTINCT (blk, r, bit) rows, so DuckDB replays the
    // filter bit-exactly.
    "q252_block_bloom" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val base = graft.Caches.persistTracked(
        graft.functions.GlobalRank.rowNumber(li,
            Seq(col("l_orderkey"), col("l_linenumber")))
          .select(expr(s"(rn - 1) div $ZmBlock").as("blk"),
            col("l_partkey"),
            GraphQueries.polyMix(pmod(col("l_partkey"),
              lit(graft.functions.TextFunctions.HashMod))).as("h")))
      def bitsOf(h: org.apache.spark.sql.Column) =
        array((0 until BfK).map { r =>
          struct(lit(r).as("r"),
            pmod(pmod(h * lit(graft.functions.TextFunctions.mhMul(BfSeed + r))
              + lit(graft.functions.TextFunctions.mhAdd(BfSeed + r)),
              lit(graft.functions.TextFunctions.HashMod)),
              lit(BfBits)).as("bit"))
        }: _*)
      val bloom = base.select(col("blk"), explode(bitsOf(col("h"))).as("rb"))
        .select(col("blk"), col("rb.r").as("r"), col("rb.bit").as("bit"))
        .distinct()
      val stats = base.groupBy("blk").agg(min("l_partkey").as("mn"),
        max("l_partkey").as("mx"), count(lit(1)).as("cnt"))
      val keyStats = base.groupBy("l_partkey", "h")
        .agg(count(lit(1)).as("rows_match"),
          countDistinct(col("blk")).as("n_true_blocks"))
      // 2 heaviest keys (the everywhere-present negative control) +
      // 2 rarest (the point lookup the Bloom exists for)
      val probes = keyStats
        .orderBy(col("rows_match").desc, col("l_partkey").asc).limit(2)
        .unionByName(keyStats
          .orderBy(col("rows_match").asc, col("l_partkey").asc).limit(2))
      val pbits = probes
        .select(col("l_partkey").as("probe_key"),
          explode(bitsOf(col("h"))).as("rb"))
        .select(col("probe_key"), col("rb.r").as("r"),
          col("rb.bit").as("bit"))
      val hits = broadcast(pbits).join(bloom, Seq("r", "bit"))
        .groupBy("probe_key", "blk").agg(count(lit(1)).as("nr"))
        .filter(col("nr") === BfK)
        .select(col("probe_key"), col("blk"), lit(1L).as("bf_pass"))
      stats
        .crossJoin(broadcast(probes.select(
          col("l_partkey").as("probe_key"),
          col("rows_match"), col("n_true_blocks"))))
        .join(hits, Seq("probe_key", "blk"), "left")
        .withColumn("bf_pass", coalesce(col("bf_pass"), lit(0L)))
        .groupBy("probe_key", "rows_match", "n_true_blocks")
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(col("probe_key").between(col("mn"), col("mx")), 0L)
            .otherwise(1L)).as("n_zm_pruned"),
          sum(lit(1L) - col("bf_pass")).as("n_bf_pruned"),
          sum(col("bf_pass") * col("cnt")).as("rows_scanned_bf"),
          sum(col("bf_pass")).as("n_pass"))
        .select(col("probe_key"), col("n_blocks"), col("n_zm_pruned"),
          col("n_bf_pruned"), col("rows_scanned_bf"),
          (col("n_pass") - col("n_true_blocks")).as("n_fp_blocks"),
          col("n_true_blocks"), col("rows_match"))
        .orderBy("probe_key")
    }),

    // Z-ORDER clustering audit — the multi-dimensional completion of
    // the layout trilogy (q246 single-column sort keys, q252 equality
    // Blooms): lineitem under FOUR layouts — natural, shipdate-sorted,
    // partkey-sorted, and Z-ordered (both columns scaled to 16-bit
    // rank space, bits interleaved into one 32-bit curve value, the
    // Delta/Iceberg OPTIMIZE ZORDER mechanism) — each cut into
    // 4096-row blocks carrying min/max of BOTH columns, probed by one
    // date-range and one partkey-band predicate. The table shows the
    // exact trade a lake optimizer buys: each single-column sort
    // prunes its own dimension perfectly and the other not at all;
    // the Z-order layout prunes BOTH well (neither perfectly) — the
    // right default when two predicate families share a 100 TB table.
    // All integer arithmetic ([D5] scaling, generated-once interleave
    // expression shared with the oracle); block ids from the
    // range-partitioned GlobalRank, stats read rows÷4096 entries.
    "q261_zorder_prune" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          datediff(col("l_shipdate"), lit(ZEpoch).cast("date"))
            .cast("long").as("sd"))
      val bounds = li.agg(min("sd").as("sdmn"), max("sd").as("sdmx"),
        min("l_partkey").as("pkmn"), max("l_partkey").as("pkmx"))
      // persistTracked: four layout rankings + two match counts read
      // this relation — cache the scan + interleave once (measured
      // neutral at sf0.1: the cost is the four range-partitioned
      // SORTS, which are the audit's subject; the cache just stops
      // the projection re-running six times)
      val scaled = graft.Caches.persistTracked(li
        .crossJoin(broadcast(bounds))
        // a constant column (possible on a degenerate slice at scale)
        // scales to rank 0 rather than dividing by zero
        .withColumn("zx", when(col("sdmx") > col("sdmn"),
          expr(s"((sd - sdmn) * ${(1 << ZBits) - 1}L) div (sdmx - sdmn)"))
          .otherwise(0L))
        .withColumn("zy", when(col("pkmx") > col("pkmn"), expr(
          s"((l_partkey - pkmn) * ${(1 << ZBits) - 1}L) div (pkmx - pkmn)"))
          .otherwise(0L))
        .withColumn("z", expr(zExpr))
        .withColumn("pk_lo", expr("pkmn + ((pkmx - pkmn) * 2) div 5"))
        .withColumn("pk_hi", expr("pkmn + ((pkmx - pkmn) * 9) div 20")))
      val (dLo, dHi) = (zDays("1995-04-01"), zDays("1995-07-01"))
      def layout(name: String, order: Seq[org.apache.spark.sql.Column]) =
        graft.functions.GlobalRank.rowNumber(scaled, order)
          .select(lit(name).as("layout"),
            expr(s"(rn - 1) div $ZmBlock").as("blk"),
            col("sd"), col("l_partkey"), col("pk_lo"), col("pk_hi"))
      val all = layout("1_natural",
          Seq(col("l_orderkey"), col("l_linenumber")))
        .unionByName(layout("2_shipdate_sorted",
          Seq(col("sd"), col("l_orderkey"), col("l_linenumber"))))
        .unionByName(layout("3_partkey_sorted",
          Seq(col("l_partkey"), col("l_orderkey"), col("l_linenumber"))))
        .unionByName(layout("4_zorder",
          Seq(col("z"), col("l_orderkey"), col("l_linenumber"))))
      val zm = all.groupBy("layout", "blk")
        .agg(min("sd").as("mn_sd"), max("sd").as("mx_sd"),
          min("l_partkey").as("mn_pk"), max("l_partkey").as("mx_pk"),
          max("pk_lo").as("pk_lo"), max("pk_hi").as("pk_hi"),
          count(lit(1)).as("cnt"))
      def audit(pred: String, pruned: org.apache.spark.sql.Column) =
        zm.groupBy("layout")
          .agg(count(lit(1)).as("n_blocks"),
            sum(when(pruned, 1L).otherwise(0L)).as("n_pruned"),
            sum(when(pruned, 0L).otherwise(col("cnt"))).as("rows_scanned"))
          .withColumn("pred", lit(pred))
      val aDate = audit("date_1995Q2",
        col("mx_sd") < dLo || col("mn_sd") >= dHi)
      val aPart = audit("part_band",
        col("mx_pk") < col("pk_lo") || col("mn_pk") > col("pk_hi"))
      val mDate = scaled.filter(col("sd") >= dLo && col("sd") < dHi)
        .agg(count(lit(1)).as("rows_match"))
        .withColumn("pred", lit("date_1995Q2"))
      val mPart = scaled.filter(col("l_partkey").between(
          col("pk_lo"), col("pk_hi")))
        .agg(count(lit(1)).as("rows_match"))
        .withColumn("pred", lit("part_band"))
      aDate.unionByName(aPart)
        .join(broadcast(mDate.unionByName(mPart)), Seq("pred"))
        .select(col("pred"), col("layout"), col("n_blocks"),
          col("n_pruned"), col("rows_scanned"), col("rows_match"))
        .orderBy("pred", "layout")
    })
  )

  /** q246 zone-map block size (rows per block under both layouts). */
  private val ZmBlock = 4096

  /** q261 Z-order geometry: each of the two cluster columns scales to
    * ZBits-bit rank space before bit interleaving (32-bit z-value);
    * days count from ZEpoch in BOTH engines (Spark datediff vs DuckDB
    * date subtraction — same integer). */
  private val ZBits = 16
  private val ZEpoch = "1992-01-01"
  private def zDays(d: String): Long =
    java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(ZEpoch), java.time.LocalDate.parse(d))

  /** The interleave expression over scaled columns `zx`/`zy` — ONE
    * generated text, run through expr() and spliced into the oracle. */
  private def zExpr: String =
    (0 until ZBits).map(k =>
      s"(((zx >> $k) & 1) << ${2 * k}) + (((zy >> $k) & 1) << ${2 * k + 1})")
      .mkString(" + ")

  /** q252 partitioned-Bloom geometry: BfK affine hash rows, each
    * owning a BfBits-bucket bit partition (total state 4·4096 bits =
    * 2 KiB per block — parquet-bloom scale; at ~3600 distinct keys
    * per 4096-row block the per-partition fill is ~58%, so a
    * key-absent block passes all four partitions with p ≈ 0.11 and
    * ~89% of non-matching blocks prune); BfSeed offsets the MinHash
    * constant family so the rows share no structure with the CMS
    * (2000) or signature (0..63) slots. */
  private val BfBits = 4096
  private val BfK = 4
  private val BfSeed = 3000

  /** q207's pruned partition — one of the fixture's order years. */
  private val PruneYear = 1997

  /** Malformed lines planted by q131 — mirrored as a literal in its
    * oracle. */
  private val CorruptLines = 7

  // The oracles read the ORIGINAL parquet tables — the round-trip must
  // be lossless for the hashes to match.
  val oracle: Map[String, String] = Map(
    "q129_csv_copy" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal,
        |  COUNT(DISTINCT c_nationkey) AS n_nations
        |FROM customer GROUP BY 1
        |ORDER BY segment ASC NULLS FIRST""".stripMargin,

    "q155_tsv_copy" ->
      """SELECT s_nationkey, COUNT(*) AS n_supp,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
        |FROM supplier GROUP BY 1
        |ORDER BY s_nationkey ASC NULLS FIRST""".stripMargin,

    "q130_json_copy" ->
      """SELECT o_orderstatus AS status,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1, 2
        |ORDER BY status ASC NULLS FIRST, yr ASC NULLS FIRST""".stripMargin,

    "q157_orc_copy" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
        |    AS sum_price,
        |  ROUND(CAST(SUM(CAST(p_size AS DECIMAL(38,6))) AS DOUBLE)
        |        / COUNT(*), 4) AS avg_size
        |FROM part GROUP BY 1
        |ORDER BY p_brand ASC NULLS FIRST""".stripMargin,

    "q172_compaction" ->
      """SELECT COUNT(*) AS n_rows,
        |       COUNT(DISTINCT o_orderkey) AS n_keys,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |         AS sum_price,
        |       COUNT(o_orderdate) AS n_dates
        |FROM orders""".stripMargin,

    "q166_schema_evolution" ->
      """WITH m AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |         CAST(NULL AS VARCHAR) AS o_orderstatus,
        |         CAST(NULL AS TIMESTAMP) AS o_orderdate
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |         o_orderstatus, o_orderdate
        |  FROM orders)
        |SELECT COUNT(*) AS n_rows,
        |       COUNT(o_custkey) AS n_with_cust,
        |       COUNT(o_orderstatus) AS n_with_status,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |         AS sum_price,
        |       COUNT(DISTINCT o_orderkey) AS n_keys
        |FROM m""".stripMargin,

    "q131_json_quarantine" ->
      s"""SELECT COUNT(*) AS n_good,
         |  CAST($CorruptLines AS BIGINT) AS n_corrupt,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
         |FROM orders""".stripMargin,

    "q207_partition_prune" ->
      s"""SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         |    AS sum_price,
         |  COUNT(DISTINCT o_custkey) AS n_cust
         |FROM orders WHERE year(o_orderdate) = $PruneYear
         |GROUP BY 1 ORDER BY status ASC NULLS FIRST""".stripMargin,

    "q208_csv_quoting" -> {
      val h = graft.functions.TextFunctions.Sql.charHash("s")
      """WITH src AS (
        |  SELECT c_custkey, c_name || ',"|\' || c_mktsegment AS s
        |  FROM customer)
        |SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(length(s)) AS BIGINT) AS sum_len,
        |       CAST(SUM(HSUM_EXPR) AS BIGINT) AS hsum
        |FROM src""".stripMargin.replace("HSUM_EXPR", h)
    },

    "q224_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
        |    AS sum_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,

    // the zone-map replay: identical global block ids (ROW_NUMBER over
    // the same unique total orders), identical min/max/cnt maps and
    // prune predicate
    "q246_zonemap_prune" ->
      s"""WITH base AS (
         |  SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem),
         |bl AS (
         |  SELECT 'natural' AS layout,
         |         (ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber)
         |          - 1) // $ZmBlock AS blk,
         |         l_shipdate
         |  FROM base
         |  UNION ALL
         |  SELECT 'shipdate_sorted',
         |         (ROW_NUMBER() OVER (
         |            ORDER BY l_shipdate, l_orderkey, l_linenumber)
         |          - 1) // $ZmBlock,
         |         l_shipdate
         |  FROM base),
         |zm AS (
         |  SELECT layout, blk, MIN(l_shipdate) AS mn,
         |         MAX(l_shipdate) AS mx, COUNT(*) AS cnt
         |  FROM bl GROUP BY 1, 2),
         |wins(win, lo, hi) AS (VALUES
         |  ('1995Q1', DATE '1995-01-01', DATE '1995-04-01'),
         |  ('1995Q2', DATE '1995-04-01', DATE '1995-07-01'),
         |  ('1995Q3', DATE '1995-07-01', DATE '1995-10-01'),
         |  ('1995Q4', DATE '1995-10-01', DATE '1996-01-01')),
         |audit AS (
         |  SELECT layout, win, COUNT(*) AS n_blocks,
         |         CAST(SUM(CASE WHEN mx < lo OR mn >= hi
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
         |         CAST(SUM(CASE WHEN mx < lo OR mn >= hi
         |                       THEN 0 ELSE cnt END) AS BIGINT)
         |           AS rows_scanned
         |  FROM zm CROSS JOIN wins GROUP BY 1, 2),
         |mt AS (
         |  SELECT win, COUNT(*) AS rows_match
         |  FROM base CROSS JOIN wins
         |  WHERE l_shipdate >= lo AND l_shipdate < hi
         |  GROUP BY 1)
         |SELECT a.layout, a.win, a.n_blocks, a.n_pruned,
         |       a.rows_scanned, m.rows_match
         |FROM audit a JOIN mt m USING (win)
         |ORDER BY a.layout ASC NULLS FIRST, a.win ASC NULLS FIRST""".stripMargin,

    // the block-Bloom replay: identical global block ids, identical
    // polyMix + affine bit arithmetic, the same DISTINCT set-bit
    // relation and all-rows-hit membership rule
    "q252_block_bloom" -> {
      val hashM = graft.functions.TextFunctions.HashMod
      s"""WITH base AS (
         |  SELECT (ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber)
         |          - 1) // $ZmBlock AS blk,
         |         l_partkey,
         |         ${GraphQueries.polyMixSql(
              GraphQueries.pmodSql("l_partkey"))} AS h
         |  FROM lineitem),
         |ks(r, mul, addc) AS (
         |  VALUES ${(0 until BfK).map(r =>
              s"($r, ${graft.functions.TextFunctions.mhMul(BfSeed + r)}, " +
                s"${graft.functions.TextFunctions.mhAdd(BfSeed + r)})")
              .mkString(", ")}),
         |bloom AS (
         |  SELECT DISTINCT blk, r,
         |         ((h * mul + addc) % $hashM) % $BfBits AS bit
         |  FROM base CROSS JOIN ks),
         |stats AS (
         |  SELECT blk, MIN(l_partkey) AS mn, MAX(l_partkey) AS mx,
         |         COUNT(*) AS cnt
         |  FROM base GROUP BY 1),
         |keystats AS (
         |  SELECT l_partkey AS probe_key, h, COUNT(*) AS rows_match,
         |         COUNT(DISTINCT blk) AS n_true_blocks
         |  FROM base GROUP BY 1, 2),
         |probes AS (
         |  (SELECT * FROM keystats
         |   ORDER BY rows_match DESC, probe_key ASC LIMIT 2)
         |  UNION ALL
         |  (SELECT * FROM keystats
         |   ORDER BY rows_match ASC, probe_key ASC LIMIT 2)),
         |hits AS (
         |  SELECT p.probe_key, b.blk
         |  FROM probes p CROSS JOIN ks k
         |  JOIN bloom b ON b.r = k.r
         |   AND b.bit = ((p.h * k.mul + k.addc) % $hashM) % $BfBits
         |  GROUP BY 1, 2
         |  HAVING COUNT(*) = $BfK),
         |grid AS (
         |  SELECT p.probe_key, p.rows_match, p.n_true_blocks,
         |         s.blk, s.mn, s.mx, s.cnt,
         |         CASE WHEN h.blk IS NULL THEN 0 ELSE 1 END AS bf_pass
         |  FROM stats s CROSS JOIN probes p
         |  LEFT JOIN hits h ON h.probe_key = p.probe_key
         |              AND h.blk = s.blk)
         |SELECT probe_key, COUNT(*) AS n_blocks,
         |       CAST(SUM(CASE WHEN probe_key BETWEEN mn AND mx
         |                     THEN 0 ELSE 1 END) AS BIGINT) AS n_zm_pruned,
         |       CAST(SUM(1 - bf_pass) AS BIGINT) AS n_bf_pruned,
         |       CAST(SUM(bf_pass * cnt) AS BIGINT) AS rows_scanned_bf,
         |       CAST(SUM(bf_pass) - n_true_blocks AS BIGINT) AS n_fp_blocks,
         |       CAST(n_true_blocks AS BIGINT) AS n_true_blocks,
         |       rows_match
         |FROM grid
         |GROUP BY probe_key, rows_match, n_true_blocks
         |ORDER BY probe_key ASC NULLS FIRST""".stripMargin
    },

    // the Z-order replay: identical day/scale/interleave arithmetic
    // (zExpr is the SAME generated text), identical block ids and
    // two-predicate prune audit
    "q261_zorder_prune" -> {
      val (dLo, dHi) = (zDays("1995-04-01"), zDays("1995-07-01"))
      val layouts = Seq(
        "1_natural" -> "l_orderkey, l_linenumber",
        "2_shipdate_sorted" -> "sd, l_orderkey, l_linenumber",
        "3_partkey_sorted" -> "l_partkey, l_orderkey, l_linenumber",
        "4_zorder" -> "z, l_orderkey, l_linenumber").map {
        case (name, ord) =>
          s"""SELECT '$name' AS layout,
             |       (ROW_NUMBER() OVER (ORDER BY $ord) - 1) // $ZmBlock
             |         AS blk,
             |       sd, l_partkey, pk_lo, pk_hi
             |FROM z""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH li AS (
         |  SELECT l_orderkey, l_linenumber, l_partkey,
         |         CAST(datediff('day', DATE '$ZEpoch', l_shipdate)
         |              AS BIGINT) AS sd
         |  FROM lineitem),
         |b AS (
         |  SELECT MIN(sd) AS sdmn, MAX(sd) AS sdmx,
         |         MIN(l_partkey) AS pkmn, MAX(l_partkey) AS pkmx
         |  FROM li),
         |scaled AS (
         |  SELECT li.*,
         |         CASE WHEN b.sdmx > b.sdmn THEN
         |           ((sd - b.sdmn) * ${(1 << ZBits) - 1})
         |             // (b.sdmx - b.sdmn) ELSE 0 END AS zx,
         |         CASE WHEN b.pkmx > b.pkmn THEN
         |           ((l_partkey - b.pkmn) * ${(1 << ZBits) - 1})
         |             // (b.pkmx - b.pkmn) ELSE 0 END AS zy,
         |         b.pkmn + ((b.pkmx - b.pkmn) * 2) // 5 AS pk_lo,
         |         b.pkmn + ((b.pkmx - b.pkmn) * 9) // 20 AS pk_hi
         |  FROM li CROSS JOIN b),
         |z AS (SELECT *, $zExpr AS z FROM scaled),
         |bl AS (
         |  $layouts),
         |zm AS (
         |  SELECT layout, blk,
         |         MIN(sd) AS mn_sd, MAX(sd) AS mx_sd,
         |         MIN(l_partkey) AS mn_pk, MAX(l_partkey) AS mx_pk,
         |         MAX(pk_lo) AS pk_lo, MAX(pk_hi) AS pk_hi,
         |         COUNT(*) AS cnt
         |  FROM bl GROUP BY 1, 2),
         |a AS (
         |  SELECT 'date_1995Q2' AS pred, layout, COUNT(*) AS n_blocks,
         |         CAST(SUM(CASE WHEN mx_sd < $dLo OR mn_sd >= $dHi
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
         |         CAST(SUM(CASE WHEN mx_sd < $dLo OR mn_sd >= $dHi
         |                       THEN 0 ELSE cnt END) AS BIGINT)
         |           AS rows_scanned
         |  FROM zm GROUP BY 2
         |  UNION ALL
         |  SELECT 'part_band', layout, COUNT(*),
         |         CAST(SUM(CASE WHEN mx_pk < pk_lo OR mn_pk > pk_hi
         |                       THEN 1 ELSE 0 END) AS BIGINT),
         |         CAST(SUM(CASE WHEN mx_pk < pk_lo OR mn_pk > pk_hi
         |                       THEN 0 ELSE cnt END) AS BIGINT)
         |  FROM zm GROUP BY 2),
         |m AS (
         |  SELECT 'date_1995Q2' AS pred, COUNT(*) AS rows_match
         |  FROM z WHERE sd >= $dLo AND sd < $dHi
         |  UNION ALL
         |  SELECT 'part_band', COUNT(*)
         |  FROM z WHERE l_partkey BETWEEN pk_lo AND pk_hi)
         |SELECT a.pred, a.layout, a.n_blocks, a.n_pruned,
         |       a.rows_scanned, m.rows_match
         |FROM a JOIN m USING (pred)
         |ORDER BY a.pred ASC NULLS FIRST, a.layout ASC NULLS FIRST"""
        .stripMargin
    }
  )
}
