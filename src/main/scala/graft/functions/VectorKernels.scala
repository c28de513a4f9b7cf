package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels shared by the interpreted (`nullSafeEval`) and
  * generated (`doGenCode`) paths of the custom expressions. A standalone
  * Scala object gets static forwarders, so generated Java calls these
  * directly.
  *
  * Arithmetic order is the SEQUENTIAL LEFT FOLD the DuckDB oracles use
  * (`list_reduce`), so results stay bitwise cross-engine-deterministic —
  * do not reorder or vectorize the accumulation.
  */
object VectorKernels {

  /** dot(a, b) over float arrays, accumulated in double, index order. */
  def dotF32(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Σ x_i² over a float array, accumulated in double, index order. */
  def normSqF32(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    acc
  }

  /** dot(a, b) over double arrays (k-means centroids), index order. */
  def dotF64(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Σ x_i² over a double array, index order. */
  def normSqF64(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      acc += x * x
      i += 1
    }
    acc
  }

  /** L1 (Manhattan) distance over two ALIGNED long arrays — the byte-
    * histogram distance kernel. Integer arithmetic: exact under any
    * evaluation order, but kept index-ordered like the rest. */
  def l1I64(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += (if (d < 0) -d else d)
      i += 1
    }
    acc
  }

  /** Squared L2 distance over two aligned long arrays — the int8-code
    * distance kernel (PQ encode/LUT). Integer arithmetic: exact. */
  def distSqI64(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** 31-polynomial rolling hash mod 1e9+7 over the string's UTF-16 chars
    * (≡ code points for BMP text; matches ascii(substr(s, i, 1)) folding). */
  def rollingHash31(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = (acc * 31 + str.charAt(i)) % 1000000007L
      i += 1
    }
    acc
  }

  /** 2-D Hilbert curve index of (x, y) on a 2^bits × 2^bits grid — the
    * masked form of the classic xy2d loop: each step consumes the top
    * remaining bit of both coordinates, adds the quadrant's s² offset
    * ((3·rx) XOR ry under the Hilbert quadrant orientation), masks to the
    * lower bits and rotates the sub-quadrant (the mask keeps the flip
    * s−1−x in range, which the textbook unmasked loop silently relies on
    * sign bits for). Bijective on the grid; consecutive indices are
    * grid-adjacent (|Δx|+|Δy| = 1) — the locality property
    * VectorExpressionsSpec proves exhaustively on the 8×8 grid. */
  def hilbertD2(xIn: Long, yIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      x &= s - 1
      y &= s - 1
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** True Damerau-Levenshtein distance (unrestricted adjacent
    * transpositions, NOT the OSA restriction) over the strings' UTF-8
    * BYTES. Both choices match DuckDB's `damerau_levenshtein` exactly —
    * probed: d("CA","ABC")=2 (OSA would say 3) and d("héllo","hello")=2
    * (code-point distance would say 1) — so the oracle compare is
    * byte-for-byte meaningful on any input, not just ASCII. Classic
    * Lowrance-Wagner DP with a 256-entry last-occurrence table; O(|a|·|b|)
    * time and space per pair, which is why callers must block candidates
    * first (this runs per in-block pair, never all-pairs). */
  def damerauLevenshtein(aStr: UTF8String, bStr: UTF8String): Long = {
    val a = aStr.getBytes
    val b = bStr.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    // (la+2)·(lb+2) Int cells: beyond ~46 KB × 46 KB the flattened index
    // wraps Int (and the matrix would be ≥8 GiB anyway) — fail loudly
    // instead of returning a garbage distance. Callers compare short
    // fields (edit-1 neighbors, entity resolution); document-length
    // inputs belong in the shingle/MinHash family, not an O(n²) DP.
    require((la + 2).toLong * (lb + 2).toLong <= Int.MaxValue.toLong,
      s"damerau_levenshtein inputs too long for the O(|a|·|b|) DP: |a|=$la, |b|=$lb bytes")
    val w = lb + 2
    val inf = la + lb
    // (la+2) x (lb+2) DP matrix, flattened; row 0 is the "minus infinity"
    // sentinel row the transposition case indexes into.
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val da = new Array[Int](256) // last row in which each byte value occurred in a
    i = 1
    while (i <= la) {
      var db = 0 // last column in THIS row where a(i-1) matched b
      val ai = a(i - 1) & 0xff
      j = 1
      while (j <= lb) {
        val bj = b(j - 1) & 0xff
        val k = da(bj)
        val l = db
        val cost = if (ai == bj) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (trans < m) m = trans
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da(ai) = i
      i += 1
    }
    d((la + 1) * w + lb + 1).toLong
  }

  /** All w-char window hashes of s in ONE pass: entry j (0-based) equals
    * [[rollingHash31]] of chars [j, j+w) — the TRUE rolling form
    * (subtract the outgoing char's 31^w term), where per-position
    * substring+hash is O(len·pos). Empty array when len < w. */
  def windowHash31(s: UTF8String, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val p = 1000000007L
    if (n < w || w <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    var powW = 1L
    var k = 0
    while (k < w) { powW = powW * 31 % p; k += 1 }
    val out = new Array[Long](n - w + 1)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * 31 + str.charAt(i)) % p
      if (i >= w) {
        acc = (acc - str.charAt(i - w) * powW) % p
        if (acc < 0) acc += p
      }
      if (i >= w - 1) out(i - w + 1) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
