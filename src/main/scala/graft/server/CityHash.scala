package graft.server

/** CityHash128 v1.0.2 (Google, public domain / MIT) — the exact historical
  * revision the ClickHouse wire protocol pinned for compressed-frame
  * checksums and that the reference links through
  * `clickhouse-rs-cityhash-sys` (crates/runtime/src/ch/blocks.rs:5,289).
  * Later CityHash revisions (≥1.1) changed the mixing and are NOT
  * wire-compatible; this file deliberately follows the 1.0.2 algorithm.
  *
  * Validated against the reference's golden frame
  * `COMPRESSED_EMPTY_CLIENT_BLK_BYTES` (blocks.rs:146-150), whose first 16
  * bytes are CityHash128 of the 20-byte compressed-empty-block body,
  * serialized as two little-endian u64s (lo, hi) — the same layout the
  * reference writes at blocks.rs:289-294.
  *
  * All arithmetic is on Long with wrapping semantics (Scala's Long
  * arithmetic wraps like C uint64 for +, *, ^, shifts with >>> for
  * logical right shift).
  */
object CityHash {

  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL
  private val k3 = 0xc949d7c7509e6557L // removed in CityHash 1.1; alive in 1.0.2
  private val kMul = 0x9ddfea08eb382d69L

  final case class U128(lo: Long, hi: Long)

  @inline private def fetch64(s: Array[Byte], off: Int): Long = {
    ((s(off) & 0xffL)) |
      ((s(off + 1) & 0xffL) << 8) |
      ((s(off + 2) & 0xffL) << 16) |
      ((s(off + 3) & 0xffL) << 24) |
      ((s(off + 4) & 0xffL) << 32) |
      ((s(off + 5) & 0xffL) << 40) |
      ((s(off + 6) & 0xffL) << 48) |
      ((s(off + 7) & 0xffL) << 56)
  }

  @inline private def fetch32(s: Array[Byte], off: Int): Long =
    ((s(off) & 0xffL)) |
      ((s(off + 1) & 0xffL) << 8) |
      ((s(off + 2) & 0xffL) << 16) |
      ((s(off + 3) & 0xffL) << 24)

  // rotate right; v1.0.2's Rotate is a no-op for shift == 0
  @inline private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))

  @inline private def rotateByAtLeast1(v: Long, shift: Int): Long =
    (v >>> shift) | (v << (64 - shift))

  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  // Hash128to64 — Murmur-inspired 128→64 fold
  @inline private def hashLen16(u: Long, v: Long): Long = {
    var a = (u ^ v) * kMul
    a ^= (a >>> 47)
    var b = (v ^ a) * kMul
    b ^= (b >>> 47)
    b * kMul
  }

  private def hashLen0to16(s: Array[Byte], off: Int, len: Int): Long = {
    if (len > 8) {
      val a = fetch64(s, off)
      val b = fetch64(s, off + len - 8)
      hashLen16(a, rotateByAtLeast1(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, off)
      hashLen16(len + (a << 3), fetch32(s, off + len - 4))
    } else if (len > 0) {
      val a = s(off) & 0xff
      val b = s(off + (len >> 1)) & 0xff
      val c = s(off + len - 1) & 0xff
      val y = a.toLong + (b.toLong << 8)
      val z = len.toLong + (c.toLong << 2)
      shiftMix(y * k2 ^ z * k3) * k2
    } else k2
  }

  /** CityMurmur — the <128-byte path of CityHash128WithSeed. */
  private def cityMurmur(s: Array[Byte], off: Int, len: Int, seed: U128): U128 = {
    var a = seed.lo
    var b = seed.hi
    var c = 0L
    var d = 0L
    var l = len - 16
    if (l <= 0) { // len <= 16
      a = shiftMix(a * k1) * k1
      c = b * k1 + hashLen0to16(s, off, len)
      d = shiftMix(a + (if (len >= 8) fetch64(s, off) else c))
    } else { // len > 16
      c = hashLen16(fetch64(s, off + len - 8) + k1, a)
      d = hashLen16(b + len, c + fetch64(s, off + len - 16))
      a += d
      var p = off
      while (l > 0) {
        a ^= shiftMix(fetch64(s, p) * k1) * k1
        a *= k1
        b ^= a
        c ^= shiftMix(fetch64(s, p + 8) * k1) * k1
        c *= k1
        d ^= c
        p += 16
        l -= 16
      }
    }
    a = hashLen16(a, c)
    b = hashLen16(d, b)
    U128(a ^ b, hashLen16(b, a))
  }

  // (a+w, b+c) accumulator over a 32-byte chunk
  @inline private def weakHashLen32WithSeeds(w: Long, x: Long, y: Long, z: Long,
                                             a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }

  @inline private def weakHashLen32WithSeeds(s: Array[Byte], off: Int,
                                             a: Long, b: Long): (Long, Long) =
    weakHashLen32WithSeeds(fetch64(s, off), fetch64(s, off + 8),
      fetch64(s, off + 16), fetch64(s, off + 24), a, b)

  def cityHash128WithSeed(s: Array[Byte], off0: Int, len0: Int, seed: U128): U128 = {
    if (len0 < 128) return cityMurmur(s, off0, len0, seed)
    var off = off0
    var len = len0
    // 56 bytes of state: v, w, x, y, z
    var x = seed.lo
    var y = seed.hi
    var z = len * k1
    var vFirst = rotate(y ^ k1, 49) * k1 + fetch64(s, off)
    var vSecond = rotate(vFirst, 42) * k1 + fetch64(s, off + 8)
    var wFirst = rotate(y + z, 35) * k1 + x
    var wSecond = rotate(x + fetch64(s, off + 88), 53) * k1

    // same inner loop as CityHash64, manually unrolled twice per iteration
    while (len >= 128) {
      var i = 0
      while (i < 2) {
        x = rotate(x + y + vFirst + fetch64(s, off + 16), 37) * k1
        y = rotate(y + vSecond + fetch64(s, off + 48), 42) * k1
        x ^= wSecond
        y ^= vFirst
        z = rotate(z ^ wFirst, 33)
        val v = weakHashLen32WithSeeds(s, off, vSecond * k1, x + wFirst)
        vFirst = v._1; vSecond = v._2
        val w = weakHashLen32WithSeeds(s, off + 32, z + wSecond, y)
        wFirst = w._1; wSecond = w._2
        val t = z; z = x; x = t
        off += 64
        i += 1
      }
      len -= 128
    }
    y += rotate(wFirst, 37) * k0 + z
    x += rotate(vFirst + z, 49) * k0
    // hash up to 4 chunks of 32 bytes each from the END of the remainder
    var tailDone = 0
    while (tailDone < len) {
      tailDone += 32
      y = rotate(y - x, 42) * k0 + vSecond
      wFirst += fetch64(s, off + len - tailDone + 16)
      x = rotate(x, 49) * k0 + wFirst
      wFirst += vFirst
      val v = weakHashLen32WithSeeds(s, off + len - tailDone, vFirst, vSecond)
      vFirst = v._1; vSecond = v._2
    }
    x = hashLen16(x, vFirst)
    y = hashLen16(y, wSecond)
    U128(hashLen16(x + vSecond, wFirst) + y, hashLen16(x + wSecond, y + vSecond))
  }

  def cityHash128(s: Array[Byte], off: Int, len: Int): U128 = {
    if (len >= 16)
      cityHash128WithSeed(s, off + 16, len - 16,
        U128(fetch64(s, off) ^ k3, fetch64(s, off + 8)))
    else if (len >= 8)
      cityHash128WithSeed(Array.emptyByteArray, 0, 0,
        U128(fetch64(s, off) ^ (len * k0), fetch64(s, off + len - 8) ^ k1))
    else
      cityHash128WithSeed(s, off, len, U128(k0, k1))
  }

  def cityHash128(s: Array[Byte]): U128 = cityHash128(s, 0, s.length)
}
