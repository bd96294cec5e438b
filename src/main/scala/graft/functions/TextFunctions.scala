package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / hashing primitives for the LLM-pipeline operators, built purely
  * from Spark's higher-order functions so everything stays inside
  * whole-stage codegen (no Scala UDFs on the hot path) AND is
  * reproducible in ANSI SQL by the DuckDB oracle.
  *
  * The polynomial rolling hash (x31 mod 1e9+7) is deliberately engine
  * -portable: only 64-bit integer ops, no overflow (max intermediate
  * ~3.2e10), identical in any SQL engine with BIGINT arithmetic.
  */
object TextFunctions {

  val HashMod = 1000000007L

  /** Whitespace tokens with empties dropped. array_remove (a native
    * codegen expression) drops the empty strings that consecutive /
    * leading / trailing spaces produce — same result as a filter lambda,
    * but HOF lambdas evaluate interpreted per element. */
  def tokens(text: Column): Column =
    array_remove(split(text, " "), "")

  /** Distinct token set (order irrelevant downstream). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Polynomial rolling hash of a string column:
    * fold(chars, 7, (acc, c) -> (acc*31 + ascii(c)) % 1e9+7).
    * Empty strings must short-circuit to the seed: Spark's
    * sequence(1, 0) yields the DESCENDING [1, 0] (the fold would run
    * twice), while DuckDB's range(1, 1) is empty — the guard pins both
    * engines to fp=7 (pinned in NullSafetySpec). */
  def charHash(s: String): String =
    s"CASE WHEN length($s) = 0 THEN CAST(7 AS BIGINT) " +
      s"ELSE aggregate(sequence(1, length($s)), CAST(7 AS BIGINT), " +
      s"(acc, i) -> (acc * 31 + ascii(substring($s, i, 1))) % $HashMod) END"

  /** Rolling hash of every element of a string-array column `arr`. */
  def tokenHashes(arr: String): String =
    s"transform($arr, t -> ${charHash("t")})"

  /** Per-slot affine constants for the MinHash family
    * mh_k = min((h · mhMul(k) + mhAdd(k)) mod 1e9+7).
    *
    * The slot permutations must be mutually INDEPENDENT, not just
    * individually wrapping: the previous a_k = C·(k+1) mod p family made
    * every slot a scalar multiple of slot 0's permutation, which
    * correlated the per-slot argmins — a jac-0.78 pair agreed on only
    * 6/16 slots (expected ~12.4) and LSH recall collapsed (16% of
    * high-sim pairs missed at 16/4 banding). splitmix64 of the slot
    * index gives constants with no shared structure; the measured slot
    * agreement matches the Jaccard similarity as MinHash theory requires.
    *
    * mhMul ∈ [1, p-1] and h < p keep the product under 2^60 (no int64
    * overflow, engine-portable). The constants are pure functions of k:
    * the oracle SQL embeds them as literals (SketchQueries builds its
    * VALUES list from these same methods). */
  def mhMul(k: Int): Long =
    java.lang.Long.remainderUnsigned(mix64(k + 1L), HashMod - 1) + 1

  def mhAdd(k: Int): Long =
    java.lang.Long.remainderUnsigned(mix64(k + 1001L), HashMod)

  /** splitmix64 finalizer — the standard public-domain mixer. Also the
    * seed stream for VectorOps' deterministic LSH hyperplanes. */
  private[graft] def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** nHashes MinHash signatures over a BIGINT-array column `hs`:
    * mh_k = min((h · mhMul(k) + mhAdd(k)) mod 1e9+7). The constants are
    * unrolled as literals (one array element per slot) so no mixing
    * arithmetic runs per row. */
  def minHashes(hs: String, nHashes: Int): String =
    (0 until nHashes).map { k =>
      s"array_min(transform($hs, h -> " +
        s"(h * ${mhMul(k)}L + ${mhAdd(k)}L) % $HashMod))"
    }.mkString("array(", ", ", ")")

  /** Band-key fold modulus: keys stay < 1e15 so a*31+x never overflows
    * int64. Collisions only ADD candidate pairs (later exact-verified),
    * and the oracle folds identically, so results are unaffected. */
  val BandMod = 1000000000000000L

  /** LSH band (band-index, band-key) structs from a minhash array `mh`.
    * Keys are arithmetic folds (x31 mod 1e15) of each band's minhashes —
    * longs join/shuffle far cheaper than concatenated strings. */
  def bandKeys(mh: String, bands: Int, rows: Int): String =
    s"transform(sequence(0, ${bands - 1}), b -> struct(b AS band, " +
      s"aggregate(slice($mh, b * $rows + 1, $rows), CAST(0 AS BIGINT), " +
      s"(a, x) -> (a * 31 + x) % $BandMod) AS bkey))"

  /** HOF formulation of the contiguous n-gram window hashes over a
    * BIGINT-array column: one (a*31 + h) % BandMod fold per window
    * position, seed 0 — the semantics of record for the codegen
    * `graft_ngram_hashes` kernel (PropertySpec pins kernel == HOF).
    * Interpreted lambdas: tests and oracle mirrors only, never the
    * corpus hot path. */
  def ngramHashes(hs: String, n: Int): String =
    s"CASE WHEN size($hs) < $n THEN CAST(array() AS array<bigint>) " +
      s"ELSE transform(sequence(1, size($hs) - ${n - 1}), " +
      s"i -> aggregate(slice($hs, i, $n), CAST(0 AS BIGINT), " +
      s"(a, h) -> (a * 31 + h) % $BandMod)) END"

  /** Deterministic double-precision cosine similarity of two float-array
    * columns: explicit left-fold dot product and norms, identical
    * association order to the oracle's range-indexed formulation. */
  def cosine(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  /** The same primitives for the DuckDB oracle side. */
  object Sql {
    def tokens(text: String): String =
      s"list_filter(string_split($text, ' '), t -> t != '')"

    def tokenSet(text: String): String = s"list_distinct(${tokens(text)})"

    def charHash(s: String): String =
      s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
        s"list_transform(range(1, len($s) + 1), " +
        s"i -> CAST(ascii(substring($s, i, 1)) AS BIGINT))), " +
        s"(a, b) -> (a * 31 + b) % $HashMod)"

    def cosine(a: String, b: String): String = {
      def dot(x: String, y: String) =
        s"list_sum(list_transform(range(1, len($x) + 1), " +
          s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    }

    def tokenHashes(arr: String): String =
      s"list_transform($arr, t -> ${charHash("t")})"

    /** Mirror of [[TextFunctions.ngramHashes]]: DuckDB range(1, k) is
      * empty for k <= 1, so short arrays yield an empty gram list with
      * no CASE guard needed. */
    def ngramHashes(hs: String, n: Int): String =
      s"list_transform(range(1, greatest(len($hs) - ${n - 1}, 0) + 1), " +
        s"i -> list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"$hs[i : i + ${n - 1}]), (a, h) -> (a * 31 + h) % $BandMod))"
  }
}
