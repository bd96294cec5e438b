package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded scale-fixture generator (r13 verdict item 1): produces the ten
  * FIXTURES.md tables at an arbitrary scale factor, entirely as column
  * expressions over `spark.range` — no driver-side loops, no RDDs — so
  * the generation itself is the distributed-writer shape and a 100 GB
  * fixture is the same program as a 100 MB one.
  *
  * Usage: `runMain graft.tools.ScaleGen <sf> <outDir>`
  *
  * Determinism: every random draw is `xxhash64(SEED, <row key>, <salt>)`
  * reduced to the needed range — a pure function of the row identity, so
  * the same (sf, table, row) produces the same value on any partition
  * count, executor count, or rerun (the [D1] convention applied to data
  * generation). Row counts scale linearly per FIXTURES.md's observed
  * ratios: customer 150k/sf1, supplier 10k, part 200k, orders 1.5M,
  * lineitem ~6M (1..7 lines/order, mean 4), events 1M (user pool
  * 15k·sf), documents 50k, embeddings 20k.
  *
  * Distribution fidelity follows FIXTURES.md's documented domains
  * (mktsegments, priorities, statuses, price/discount/tax ranges,
  * timestamp windows, 64-dim unit embeddings in 10 label clusters,
  * lang mix ≈ en .44 / zh .15 / es .145 / de .14 / fr .125) with ONE
  * deliberate divergence, documented for the growth study it feeds:
  * the driver fixture's documents table uses a 31-word vocabulary
  * shared across langs, which makes every token SET near-identical —
  * the near-dup relation is degenerate-dense (candidate pairs grow
  * ~quadratically in N by fixture design, regardless of plan). The
  * scale corpus instead draws from a `VocabSize`-word vocabulary
  * (default 1000) with explicit near-dup clusters of 3 (members share
  * ~90% of base tokens), so banded-dedup growth measurements see the
  * PLAN's scaling, not the fixture's saturation. BENCH_NOTES carries
  * the numbers for both regimes.
  */
object ScaleGen {

  private val Seed = 42L

  private def h(cols: Column*): Column =
    abs(xxhash64((lit(Seed) +: cols): _*))

  /** Uniform [0, 1) from the row-keyed hash. */
  private def u01(cols: Column*): Column =
    (h(cols: _*) % 1000000L).cast("double") / 1e6

  private def pick(values: Seq[String], k: Column): Column =
    element_at(array(values.map(lit): _*), (k % values.size).cast("int") + 1)

  /** Threshold-weighted pick: weights must sum to 1. */
  private def pickW(values: Seq[(String, Double)], u: Column): Column = {
    val cum = values.scanLeft(0.0)(_ + _._2).tail
    values.zip(cum).init.foldRight(lit(values.last._1): Column) {
      case (((v, _), c), acc) => when(u < c, v).otherwise(acc)
    }
  }

  def main(args: Array[String]): Unit = {
    val sf = args(0).toDouble
    val out = args(1)
    // optional vocab-size override (growth-study density experiments:
    // containment/prefix candidate counts scale with per-token df,
    // so the vocabulary size IS the density knob for that family)
    if (args.length > 2) vocabOverride = Some(args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, sf, out)
    spark.stop()
  }

  def write(spark: SparkSession, sf: Double, out: String): Unit =
    tables(spark, sf).foreach { case (name, df) =>
      // one output file per table, matching the driver fixture layout
      // (FIXTURES.md: "one parquet file per table per scale factor")
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name.parquet")
    }

  /** Number of near-dup cluster members per documents cluster. */
  private val DocClusterSize = 3
  /** Scale-corpus vocabulary size (see class doc for why ≫ 31). */
  private var vocabOverride: Option[Int] = None
  private def VocabSize: Int = vocabOverride.getOrElse(1000)

  def tables(spark: SparkSession, sf: Double): Seq[(String, DataFrame)] = {
    import spark.implicits._
    def n(base: Long): Long = math.max(1L, math.round(base * sf))
    val nCust = n(150000)
    val nSupp = n(10000)
    val nPart = n(200000)
    val nOrd = n(1500000)
    val nEvt = n(1000000)
    val nDoc = n(50000)
    val nEmb = n(20000)
    val nUser = math.max(15L, n(15000))

    val region = Seq(
      (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name")

    val nation = (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")

    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val customer = spark.range(nCust)
      .select(col("id").as("c_custkey"),
        format_string("Customer#%09d", col("id")).as("c_name"),
        (h(col("id"), lit("cnat")) % 25).cast("int").as("c_nationkey"),
        round(lit(-999.99) + u01(col("id"), lit("cbal")) * 10999.98, 2)
          .as("c_acctbal"),
        pick(segs, h(col("id"), lit("cseg"))).as("c_mktsegment"))

    val supplier = spark.range(nSupp)
      .select(col("id").as("s_suppkey"),
        format_string("Supplier#%09d", col("id")).as("s_name"),
        (h(col("id"), lit("snat")) % 25).cast("int").as("s_nationkey"),
        round(u01(col("id"), lit("sbal")) * 9999.99, 2).as("s_acctbal"))

    val adjs = Seq("small", "large", "red", "blue", "hot", "cold",
      "green", "dim")
    val nouns = Seq("ring", "widget", "bolt", "gear", "gizmo", "plate",
      "cap", "valve")
    val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
      "STANDARD")
    val part = spark.range(nPart)
      .select(col("id").as("p_partkey"),
        concat(pick(adjs, h(col("id"), lit("padj"))), lit(" "),
          pick(nouns, h(col("id"), lit("pnoun")))).as("p_name"),
        concat(lit("Brand#"),
          (h(col("id"), lit("pbr")) % 5 + 1).cast("string"))
          .as("p_brand"),
        pick(types, h(col("id"), lit("ptyp"))).as("p_type"),
        (h(col("id"), lit("psz")) % 50 + 1).cast("int").as("p_size"),
        round(lit(900.0) + col("id").cast("double") / 10.0, 2)
          .as("p_retailprice"))

    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    // o_orderdate: midnight-aligned days over [1995-01-01, 2001-08-01]
    val ordDays = 2404
    val ordersBase = spark.range(nOrd)
      .select(col("id").as("o_orderkey"),
        (h(col("id"), lit("ocust")) % nCust).as("o_custkey"),
        pickW(Seq("F" -> 0.48, "O" -> 0.48, "P" -> 0.04),
          u01(col("id"), lit("ost"))).as("o_orderstatus"),
        round(lit(1000.0) + u01(col("id"), lit("otp")) * 499000.0, 2)
          .as("o_totalprice"),
        date_add(lit(java.sql.Date.valueOf("1995-01-01")),
          (h(col("id"), lit("odt")) % ordDays).cast("int"))
          .cast("timestamp").as("o_orderdate"),
        pick(prios, h(col("id"), lit("opr"))).as("o_orderpriority"))

    // 1..7 lines per order (mean 4) via sequence-explode — stays a
    // narrow per-row transform, no shuffle, any scale
    val li0 = ordersBase
      .select(col("o_orderkey"), col("o_orderdate"),
        explode(sequence(lit(1),
          (h(col("o_orderkey"), lit("nl")) % 7 + 1).cast("int")))
          .as("l_linenumber"))
    val lk = h(col("o_orderkey"), col("l_linenumber"), lit("lpk")) % nPart
    val lineitem = li0.select(
      col("o_orderkey").as("l_orderkey"),
      lk.as("l_partkey"),
      (h(col("o_orderkey"), col("l_linenumber"), lit("lsk")) % nSupp)
        .as("l_suppkey"),
      col("l_linenumber"),
      (h(col("o_orderkey"), col("l_linenumber"), lit("lq")) % 50 + 1)
        .cast("double").as("l_quantity"),
      round((h(col("o_orderkey"), col("l_linenumber"), lit("lq")) % 50 + 1)
        .cast("double")
        * (lit(900.0) + lk.cast("double") / 10.0), 2).as("l_extendedprice"),
      ((h(col("o_orderkey"), col("l_linenumber"), lit("ld")) % 11)
        .cast("double") / 100.0).as("l_discount"),
      ((h(col("o_orderkey"), col("l_linenumber"), lit("lt")) % 9)
        .cast("double") / 100.0).as("l_tax"),
      pick(Seq("A", "N", "R"),
        h(col("o_orderkey"), col("l_linenumber"), lit("lrf")))
        .as("l_returnflag"),
      pick(Seq("F", "O"),
        h(col("o_orderkey"), col("l_linenumber"), lit("lls")))
        .as("l_linestatus"),
      date_add(col("o_orderdate").cast("date"),
        (h(col("o_orderkey"), col("l_linenumber"), lit("lsd")) % 95 + 1)
          .cast("int")).cast("timestamp").as("l_shipdate"))

    // events: insertion order ≈ ts order (FIXTURES) — monotone base step
    // over Jan 2024 plus a sub-step jitter
    val evTypes = Seq("view" -> 0.35, "click" -> 0.30, "purchase" -> 0.15,
      "signup" -> 0.10, "error" -> 0.10)
    val spanUs = 30L * 24 * 3600 * 1000000
    val stepUs = spanUs / math.max(1L, nEvt)
    val t0Us = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val events = spark.range(nEvt)
      .select(col("id").as("event_id"),
        timestamp_micros(lit(t0Us) + col("id") * stepUs
          + h(col("id"), lit("ej")) % math.max(1L, stepUs)).as("ts"),
        (h(col("id"), lit("eu")) % nUser).as("user_id"),
        pickW(evTypes, u01(col("id"), lit("et"))).as("event_type"),
        round(lit(0.01) + u01(col("id"), lit("ev")) * 490.0, 2)
          .as("value"),
        format_string("{\"k\": %d}", (h(col("id"), lit("ek")) % 100))
          .as("props"))

    // documents: near-dup clusters of DocClusterSize; ~10% of a
    // member's tokens mutate away from the cluster base draw. Token
    // arrays are built with transform (narrow, order-preserving) —
    // NOT explode + collect_list, whose post-shuffle order is
    // nondeterministic and would break [D1] for the generated text.
    val langs = Seq("en" -> 0.44, "zh" -> 0.15, "es" -> 0.145,
      "de" -> 0.14, "fr" -> 0.125)
    val cid = (col("doc_id") / lit(DocClusterSize)).cast("long")
    val nTok = (h(cid, lit("ntok")) % 90 + 10).cast("int")
    def word(j: Column): Column = {
      val baseTok = h(cid, j, lit("tok")) % VocabSize
      val altTok = h(col("doc_id"), j, lit("alt")) % VocabSize
      val tok = when(h(col("doc_id"), j, lit("mut")) % 10 === 0, altTok)
        .otherwise(baseTok)
      // pad width follows the vocab size — Spark's lpad TRUNCATES
      // overlong input, which would alias tokens above 10^width
      concat(lit("w"), lpad(tok.cast("string"),
        math.max(4, (VocabSize - 1).toString.length), "0"))
    }
    val documents = spark.range(nDoc)
      .select(col("id").as("doc_id"),
        pickW(langs, u01(col("id"), lit("dl"))).as("lang"),
        concat(lit("src"),
          (h(col("id"), lit("dsrc")) % 20).cast("string")).as("source"))
      .withColumn("text", array_join(
        transform(sequence(lit(0), nTok - 1), j => word(j)), " "))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))

    // embeddings: 10 deterministic cluster centers in [-1,1]^64, member
    // = normalize(center + 0.35·noise) → unit vectors as the driver
    // fixture ships (FIXTURES: list<float> dim 64, label clusters)
    val lbl = (h(col("id"), lit("el")) % 10).cast("int")
    def signed(c: Column, d: Column, salt: String): Column =
      ((h(c, d, lit(salt)) % 2001).cast("double") - 1000.0) / 1000.0
    val embeddings = spark.range(nEmb)
      .select(col("id"), lbl.as("label"))
      .withColumn("raw", transform(sequence(lit(0), lit(63)),
        d => signed(col("label").cast("long"), d, "ec") +
          signed(col("id"), d, "en") * 0.35))
      .select(col("id").as("vec_id"), col("label"), col("raw"))
      .withColumn("nrm", sqrt(aggregate(col("raw"), lit(0.0),
        (a, x) => a + x * x)))
      .select(col("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast("float"))
          .as("embedding"),
        col("label"))

    Seq("region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> ordersBase,
      "lineitem" -> lineitem, "events" -> events,
      "documents" -> documents, "embeddings" -> embeddings)
  }
}
