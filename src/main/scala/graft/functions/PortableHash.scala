package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The portable hash primitives shared by the native minhash/simhash
  * expressions ([[MinhashBandsExpr]], [[SimhashPackExpr]]) and — as SQL
  * fragments — by their HOF specifications and the DuckDB oracles
  * ([[Text.portableMixSql]] / [[Text.portableStrHashSql]] and their `o*`
  * spellings).
  *
  * Everything here is pure integer arithmetic with every intermediate
  * below 2^63, so Spark (ANSI mode) and DuckDB evaluate it identically —
  * unlike xxhash64, which only Spark has. That is what makes the l07/l08
  * near-dedup candidate sets oracle-checkable end to end instead of
  * rows-only.
  */
object PortableHash {
  /** Modulus of the character fold — the same prime the (l06,
    * oracle-proven) rolling fingerprint uses. */
  val StrMod = 1000000007L
  /** Modulus of the two-round mixer: the Mersenne prime 2^31-1. */
  val MixMod = 2147483647L

  /** Two multiply-mod-Mersenne-prime rounds with an xor-shift between
    * them (see [[Text.portableMixSql]] for why one LCG round is not
    * enough). Callers must keep `seed` in [0, ~3.4e9] so the first
    * multiply stays below 2^63; every seed built here is
    * strHash (< 1e9+7) plus a stride below 2^31. Result in
    * [0, 2^31-1). */
  def mix(seed: Long): Long = {
    val h1 = (seed * 2654435761L) % MixMod
    ((h1 ^ (h1 >> 15)) * 1597334677L) % MixMod
  }

  /** Per-character polynomial fold of a string: (h*131 + ascii) mod
    * 1e9+7, bit-equal to the HOF spelling
    * `aggregate(split(s, ''), 0L, (h, ch) -> pmod(h*131 + ascii(ch), M))`
    * ([[Text.portableStrHashSql]]). Spark's `split(s, '')` yields one
    * piece per code point with no empty pieces (verified against Spark
    * 4), and `ascii(piece)` returns the piece's full Unicode CODE
    * POINT — 233 for 'é', 26085 for '日', NOT the first UTF-8 byte
    * (probed empirically; DuckDB's ascii agrees) — so the fold decodes
    * UTF-8 and folds code points. The byte-folding first version of
    * this method silently diverged from the HOF spec (and hence the
    * oracle) on any non-ASCII token; PropertySpec's kgram edge-case
    * sweep now pins the multi-byte path. Overflow-safe: h < 1e9+7 so
    * h·131 + cp < 1.4e11 ≪ 2^63.
    *
    * Base 131, NOT the rolling fingerprint's 31: printable-ASCII byte
    * diffs are at most 94, so with base > 94+36 no short-string diff
    * pattern can telescope to zero (a base-b collision needs
    * Σ dᵢ·bⁱ ≡ 0 with |dᵢ| < b ⇒ all dᵢ = 0 while the sum is below the
    * modulus) — the base-31 variant admits ("ab","bC")-style structural
    * collisions and measured 75× the birthday rate on random tokens
    * (PropertySpec pins the collision law). l06's fingerprint keeps its
    * own base-31 fold; it is an order-sensitivity DEMO, not a hash
    * uniqueness primitive. */
  def strHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else { cp = b0 & 0x07; len = 4 }
        var j = 1
        while (j < len && i + j < bytes.length) {
          cp = (cp << 6) | (bytes(i + j) & 0x3F)
          j += 1
        }
      }
      h = (h * 131L + cp) % StrMod
      i += len
    }
    h
  }

  /** Per-permutation MinHash rehash of a shingle hash: permutations are
    * stride-8192 seed offsets through the mixer (the same stride the
    * hyperplane components use — consecutive seeds through a single LCG
    * round correlate; the two-round mix measured clean). */
  def minhashPerm(h: Long, p: Int): Long = mix(h + p * 8192L + 1L)

  /** 62-bit portable token hash: two independent 31-bit mixes packed
    * side by side. 62 (not 64) bits keeps the packed value — and every
    * band key sliced from it — non-negative in both engines, so no
    * sign-bit special cases anywhere in the SQL replay. */
  def tokenHash62(h0: Long): Long =
    mix(h0 + 1L) | (mix(h0 + 1073741824L) << 31)
}
