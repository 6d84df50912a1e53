package graft.server

import java.io.{EOFException, InputStream, OutputStream}

import net.jpountz.lz4.LZ4Factory

/** ClickHouse compressed-frame codec (crates/runtime/src/ch/blocks.rs:62-70,
  * 246-310; client side crates/client/src/compression/mod.rs:38-74):
  *
  * {{{
  *   CTH ALG CSZ DSZ LZ4-BLK
  *  |---|-|---|---|--------|
  * }}}
  *
  *  - CTH: 16-byte CityHash128 (v1.0.2) of [ALG..LZ4-BLK], serialized as
  *    two little-endian u64s (lo, hi);
  *  - ALG: 0x82 = LZ4 (protocol.rs LZ4_COMPRESSION_METHOD);
  *  - CSZ: u32 LE length of [ALG..LZ4-BLK] (i.e. 9 + compressed size);
  *  - DSZ: u32 LE decompressed length;
  *  - LZ4-BLK: raw LZ4 block (no LZ4 frame header — the bare block format,
  *    what LZ4_compress_default emits).
  *
  * The frame wraps the BLOCK BODY only; the packet code and temporary
  * table name ride uncompressed before it (blocks.rs:251-253).
  */
object Lz4Frames {

  val Lz4Method: Int = 0x82
  private val HeaderLen = 9 // ALG + CSZ + DSZ

  private val factory = LZ4Factory.fastestInstance()

  /** Compress `raw` into one CH frame and write it. */
  def writeFrame(out: OutputStream, raw: Array[Byte]): Unit = {
    val compressor = factory.fastCompressor()
    val maxLen = compressor.maxCompressedLength(raw.length)
    val body = new Array[Byte](HeaderLen + maxLen)
    val n = compressor.compress(raw, 0, raw.length, body, HeaderLen, maxLen)
    body(0) = Lz4Method.toByte
    putIntLe(body, 1, HeaderLen + n)
    putIntLe(body, 5, raw.length)
    val hash = CityHash.cityHash128(body, 0, HeaderLen + n)
    val hdr = new Array[Byte](16)
    putLongLe(hdr, 0, hash.lo)
    putLongLe(hdr, 8, hash.hi)
    out.write(hdr)
    out.write(body, 0, HeaderLen + n)
  }

  /** Read one CH frame, verify its checksum, return the decompressed body. */
  def readFrame(in: InputStream): Array[Byte] = {
    val hdr = readN(in, 16 + HeaderLen)
    val expectedLo = getLongLe(hdr, 0)
    val expectedHi = getLongLe(hdr, 8)
    val method = hdr(16) & 0xff
    if (method != Lz4Method)
      throw new IllegalStateException(f"unsupported compression method 0x$method%02x")
    val csz = getIntLe(hdr, 17)
    val dsz = getIntLe(hdr, 21)
    if (csz < HeaderLen)
      throw new IllegalStateException(s"bad compressed frame size $csz")
    val compressed = readN(in, csz - HeaderLen)
    // checksum covers [ALG CSZ DSZ LZ4-BLK]
    val body = new Array[Byte](csz)
    System.arraycopy(hdr, 16, body, 0, HeaderLen)
    System.arraycopy(compressed, 0, body, HeaderLen, compressed.length)
    val actual = CityHash.cityHash128(body)
    if (actual.lo != expectedLo || actual.hi != expectedHi)
      throw new IllegalStateException("compressed frame checksum mismatch")
    val raw = new Array[Byte](dsz)
    factory.fastDecompressor().decompress(compressed, 0, raw, 0, dsz)
    raw
  }

  @inline private def putIntLe(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  @inline private def getIntLe(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  @inline private def putLongLe(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  @inline private def getLongLe(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"expected $n frame bytes")
      off += r
    }
    buf
  }
}
