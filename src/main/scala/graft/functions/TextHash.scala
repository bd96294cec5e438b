package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the graft_* text-hash expressions.
  *
  * Each method is the compiled equivalent of a higher-order-function
  * formulation in [[TextFunctions]] (which remains the documentation of
  * record and the source of the DuckDB oracle SQL). Spark evaluates HOF
  * lambdas interpreted — one virtual call per element — which dominates
  * the runtime of every corpus pipeline; these kernels run the same folds
  * as tight JVM loops and are called from generated code as a single
  * static invocation per row (the expressions stay inside whole-stage
  * codegen). PropertySpec asserts kernel == HOF on randomized inputs.
  *
  * Numeric semantics are IDENTICAL to the HOF/oracle forms: same fold
  * seeds, same left-to-right order, same moduli, and Unicode code points
  * (Spark's `ascii`/`length`/`substring` are code-point based — verified
  * against `ascii(substring(s, i, 1))` this session).
  */
object TextHash {

  val Mod: Long = TextFunctions.HashMod
  val BandMod: Long = TextFunctions.BandMod

  /** fold over code points: acc = (acc*31 + cp) % Mod, seed 7.
    * Empty string → 7 (the guarded-CASE semantics in
    * TextFunctions.charHash). Decodes UTF-8 in place — no allocation. */
  def charHash(s: UTF8String): Long = foldFrom(7L, s)

  /** charHash of the two-token bigram "a b" without materializing the
    * concatenated string: the poly hash is a sequential fold, so
    * hash("a b") = fold(fold(fold(7, a), ' '), b). */
  private def bigramHash(a: UTF8String, b: UTF8String): Long = {
    var acc = foldFrom(7L, a)
    acc = (acc * 31 + ' '.toInt) % Mod
    foldFrom(acc, b)
  }

  private def foldFrom(seed: Long, s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = seed
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < bytes.length) {
        cp = (cp << 6) | (bytes(i + j) & 0x3F)
        j += 1
      }
      acc = (acc * 31 + cp) % Mod
      i += len
    }
    acc
  }

  /** transform(arr, t -> charHash(t)): null elements stay null. */
  def tokenHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = charHash(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hashes of the n-1 word bigrams "tk[i] tk[i+1]" (order preserved,
    * not distinct). A null token nulls the bigrams it touches — same as
    * concat-then-hash null propagation in the HOF form. */
  def bigramHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1))
        out(i) = bigramHash(arr.getUTF8String(i), arr.getUTF8String(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** nHashes MinHash signatures: mh_k = min over h of
    * (h * mhMul(k) + mhAdd(k)) % Mod — the splitmix64-derived affine
    * family from [[TextFunctions.mhMul]]. The per-slot constants must be
    * mutually independent (see that scaladoc for how the earlier
    * structured families collapsed LSH recall). mhMul < Mod and h < Mod
    * keep the product under 2^60 (no int64 overflow, engine-portable).
    * Null elements are skipped (array_min semantics); an empty/all-null
    * input yields all-null signatures. */
  // mhMul/mhAdd are pure functions of the slot index but cost two full
  // splitmix64 mixes each — memoize per signature width so the per-row
  // loop reads plain array slots instead of re-mixing constants on the
  // hottest dedup path (the design intent stated in
  // TextFunctions.minHashes)
  private val mhConsts =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def mhTables(n: Int): (Array[Long], Array[Long]) =
    mhConsts.computeIfAbsent(n, k =>
      (Array.tabulate(k)(TextFunctions.mhMul),
        Array.tabulate(k)(TextFunctions.mhAdd)))

  def minHash(hs: ArrayData, nHashes: Int): ArrayData = {
    val n = hs.numElements()
    val (muls, adds) = mhTables(nHashes)
    val out = new Array[Any](nHashes)
    var k = 0
    while (k < nHashes) {
      val mul = muls(k)
      val add = adds(k)
      var best = Long.MaxValue
      var seen = false
      var i = 0
      while (i < n) {
        if (!hs.isNullAt(i)) {
          val v = (hs.getLong(i) * mul + add) % Mod
          if (v < best) best = v
          seen = true
        }
        i += 1
      }
      if (seen) out(k) = best
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Band keys: fold each rows-sized slice of the signature with
    * (a*31 + x) % BandMod, seed 0. A null signature element nulls its
    * band's key (the HOF aggregate's null propagation). A signature
    * SHORTER than bands×rows is a caller bug (mis-sized banding would
    * silently null the tail bands and drop candidates while the HOF
    * formulation folds the short slice — a divergence, not a
    * semantics); fail loudly instead. */
  def bandKeys(mh: ArrayData, bands: Int, rows: Int): ArrayData = {
    if (mh.numElements() < bands.toLong * rows)
      throw new IllegalArgumentException(
        s"graft_band_keys: signature has ${mh.numElements()} slots, " +
          s"need bands*rows = ${bands.toLong * rows}")
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var ok = true
      var r = 0
      while (r < rows && ok) {
        val idx = b * rows + r
        if (idx >= mh.numElements() || mh.isNullAt(idx)) ok = false
        else acc = (acc * 31 + mh.getLong(idx)) % BandMod
        r += 1
      }
      if (ok) out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash of a token-hash array: spread each hash, vote ±1 per bit,
    * set bit k iff the vote is strictly positive. Identical to the q67
    * explode/group formulation (a null element votes −1 on every bit —
    * the CASE's ELSE arm under a NULL condition). */
  def simHash(hs: ArrayData, bits: Int, spread: Long): Long = {
    val votes = new Array[Int](bits)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) {
        var k = 0
        while (k < bits) { votes(k) -= 1; k += 1 }
      } else {
        val h2 = hs.getLong(i) * spread
        var k = 0
        while (k < bits) {
          if (((h2 >> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < bits) {
      if (votes(k) > 0) out |= 1L << k
      k += 1
    }
    out
  }

  /** Σ length(t) over a token array (code-point lengths, int result) —
    * the q72 aggregate. Null element → null total (boxed). */
  def sumCharLengths(arr: ArrayData): Integer = {
    val n = arr.numElements()
    var s = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      s += arr.getUTF8String(i).numChars()
      i += 1
    }
    Integer.valueOf(s)
  }

  /** Hashes of the len−n+1 contiguous n-gram windows of a bigint hash
    * array (token hashes in, one rolling fold (a*31 + h) % BandMod,
    * seed 0, per window position). A null element nulls every gram
    * whose window covers it; len < n → empty array. O(len·n) — n is a
    * small constant (2, 3, 8), so no modular-inverse rolling update. */
  def ngramHashes(hs: ArrayData, n: Int): ArrayData = {
    val len = hs.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var acc = 0L
      var ok = true
      var j = i
      while (ok && j < i + n) {
        if (hs.isNullAt(j)) ok = false
        else acc = (acc * 31 + hs.getLong(j)) % BandMod
        j += 1
      }
      if (ok) out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Rolling fingerprint of a token array: fold charHash(t) with
    * (a*31 + h) % BandMod, seed 0 — the q83 chunk fingerprint. Null
    * element → null (boxed); empty → 0. */
  def chunkFingerprint(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc = (acc * 31 + charHash(arr.getUTF8String(i))) % BandMod
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Jaro–Winkler similarity — the record-linkage scorer Spark lacks as
    * a built-in. Classic definition, pinned empirically (this session)
    * to DuckDB `jaro_winkler_similarity`'s conventions so the oracle
    * gate can hash-compare:
    *  - either side empty → 0.0 (including both empty);
    *  - match window = max(|a|,|b|)/2 − 1 (floor, ≥ 0), each char of b
    *    matchable once, greedy left-to-right;
    *  - transpositions t = (mismatched matched-pairs) / 2, INTEGER
    *    division ('abcdef' vs 'bcadef' → 0.9444…, not the fractional
    *    0.9166…);
    *  - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, double ops in exactly
    *    that order;
    *  - Winkler boost only when jaro > 0.7: jw = j + 0.1·ℓ·(1−j) with
    *    ℓ = common prefix capped at 4.
    * Operates on the raw UTF-8 BYTES (like DuckDB, whose strings are
    * UTF-8 — so the gate compares like with like; part names and
    * fixture text are ASCII where bytes = chars = code points).
    * Allocation-free for inputs ≤ 64 bytes (the blocked-pair hot
    * path: two Long bitmasks replace the match-flag arrays and no
    * String is ever decoded — the previous toString + 2-array form
    * cost ~3 allocations per call, the dominant cost of q205's ~7 M
    * kernel calls); longer inputs take the array fallback. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val n = a.numBytes
    val m = b.numBytes
    if (n == 0 || m == 0) return 0.0
    if (n <= 64 && m <= 64) jwBitmask(a, b, n, m) else jwArrays(a, b, n, m)
  }

  // thread-local stamped histograms for the jaroWinklerGte prefilter:
  // hist counts the left side's bytes, stamp marks which entries belong
  // to the CURRENT call (generation tag — no 256-slot clear per call),
  // gen is the per-thread call counter. Zero steady-state allocation.
  private val tlHist = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }
  private val tlStamp = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }
  private val tlGen = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](1)
  }

  /** Multiset common-byte count |bag(a) ∩ bag(b)| via the thread-local
    * stamped histograms — zero steady-state allocation, O(|a|+|b|).
    * The "counting filter" primitive of the similarity-join
    * literature: edit distance ≥ max(chars(a), chars(b)) − common
    * (each edit fixes at most one character, and common BYTES ≥
    * common chars, so the byte form is a conservative bound for any
    * UTF-8 input), and Jaro matches ≤ common. */
  def commonBytes(a: UTF8String, b: UTF8String): Int = {
    val n = a.numBytes
    val m = b.numBytes
    if (n == 0 || m == 0) return 0
    val hist = tlHist.get()
    val stamp = tlStamp.get()
    val gen = tlGen.get()
    gen(0) += 1
    if (gen(0) == 0) { // wrapped: stale stamps could equal the tag
      java.util.Arrays.fill(stamp, 0); gen(0) = 1
    }
    val g = gen(0)
    var i = 0
    while (i < n) {
      val x = a.getByte(i) & 0xff
      if (stamp(x) != g) { stamp(x) = g; hist(x) = 1 } else hist(x) += 1
      i += 1
    }
    var c = 0
    i = 0
    while (i < m) {
      val x = b.getByte(i) & 0xff
      if (stamp(x) == g && hist(x) > 0) { hist(x) -= 1; c += 1 }
      i += 1
    }
    c
  }

  /** [[jaroWinkler]] with a caller-supplied score floor — the blocked
    * fuzzy-join kernel (q205/q215): when a cheap O(|a|+|b|) common-byte
    * bound proves the score cannot reach `cutoff`, returns 0.0 without
    * running the O(|a|·window) match loop, else returns the exact
    * [[jaroWinkler]]. Sound because every JW match consumes one equal
    * byte on each side, so matches ≤ Σ_byte min(cntA, cntB) = c, and
    * jw ≤ boost((c/|a| + c/|b| + 1)/3) is monotone in the match count;
    * callers must only rely on values ≥ cutoff (everything below maps
    * to 0.0). On the q205 candidate distribution the bound prunes
    * ~98% of pairs (measured at sf0.1). */
  def jaroWinklerGte(a: UTF8String, b: UTF8String, cutoff: Double): Double = {
    val n = a.numBytes
    val m = b.numBytes
    if (n == 0 || m == 0) return 0.0
    val c = commonBytes(a, b)
    val jub = (c.toDouble / n + c.toDouble / m + 1.0) / 3.0
    val ub = if (jub > 0.7) jub + 0.4 * (1.0 - jub) else jub
    if (ub < cutoff) 0.0 else jaroWinkler(a, b)
  }

  private def jwBitmask(a: UTF8String, b: UTF8String, n: Int, m: Int)
  : Double = {
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    var sBits = 0L
    var tBits = 0L
    var matches = 0
    var i = 0
    while (i < n) {
      val ci = a.getByte(i)
      var j = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var found = false
      while (j <= hi && !found) {
        if ((tBits >>> j & 1L) == 0L && b.getByte(j) == ci) {
          sBits |= 1L << i; tBits |= 1L << j; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var half = 0
    var k = 0
    i = 0
    while (i < n) {
      if ((sBits >>> i & 1L) != 0L) {
        while ((tBits >>> k & 1L) == 0L) k += 1
        if (a.getByte(i) != b.getByte(k)) half += 1
        k += 1
      }
      i += 1
    }
    finishJw(a, b, n, m, matches, half)
  }

  private def jwArrays(a: UTF8String, b: UTF8String, n: Int, m: Int)
  : Double = {
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sM = new Array[Boolean](n)
    val tM = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val ci = a.getByte(i)
      var j = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && b.getByte(j) == ci) {
          sM(i) = true; tM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var half = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) half += 1
        k += 1
      }
      i += 1
    }
    finishJw(a, b, n, m, matches, half)
  }

  private def finishJw(a: UTF8String, b: UTF8String, n: Int, m: Int,
    matches: Int, half: Int): Double = {
    val md = matches.toDouble
    val j = (md / n + md / m + (md - half / 2) / md) / 3.0
    if (j <= 0.7) return j
    var l = 0
    val lMax = math.min(4, math.min(n, m))
    while (l < lMax && a.getByte(l) == b.getByte(l)) l += 1
    j + 0.1 * l * (1.0 - j)
  }
}
