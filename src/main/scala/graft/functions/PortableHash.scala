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
    * 4), and `ascii` reads the piece's first byte — so the fold walks
    * UTF-8 bytes and folds exactly the non-continuation ones. The
    * corpus is ASCII; for multi-byte input this matches Spark's
    * first-byte semantics, and pmod keeps the fold non-negative either
    * way.
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
      // continuation bytes are 10xxxxxx; every other byte starts a char
      if ((bytes(i) & 0xC0) != 0x80) {
        val v = (h * 131L + bytes(i).toInt) % StrMod
        h = if (v < 0) v + StrMod else v
      }
      i += 1
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
