package graft.codec

/** Lossy 1-byte field-length code (SURVEY.md §2.2 A5, decision D2).
  *
  * The reference stores per-doc field lengths byte-compressed with a
  * log-ish 1-byte code and feeds the *decoded* value into BM25
  * ([W] whoosh/util/numbers.py `length_to_byte`/`byte_to_length`). With the
  * reference tree absent, D2 pins an equivalent code of our own, chosen to
  * be **pure integer arithmetic** so the DuckDB oracle can reproduce it
  * bit-exactly (no float log boundaries):
  *
  *  - b in [0,127]   : exact, length == b
  *  - b in [128,255] : e = (b-128)/16, m = (b-128)%16,
  *                     decoded = (128 + 8*m) << e     (a 4-bit-mantissa float)
  *  - lengths >= 31744 saturate to b = 255 (decoded 31744)
  *
  * encode(l) = largest b with decode(b) <= l (floor semantics).
  */
object LengthByte {
  final val MaxDecoded = 31744 // decode(255)

  /** decoded length for a code byte (0..255) */
  def decode(b: Int): Int = {
    require(b >= 0 && b <= 255, s"byte out of range: $b")
    if (b < 128) b
    else {
      val x = b - 128
      (128 + 8 * (x & 15)) << (x >> 4)
    }
  }

  /** code byte for a raw token count (>= 0) */
  def encode(l: Int): Int = {
    require(l >= 0, s"length must be >= 0: $l")
    if (l < 128) l
    else if (l >= MaxDecoded) 255
    else {
      // e = msb(l) - 7; for l in [128, 31744) msb in [7, 14]
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(l.toLong)
      val e = msb - 7
      val m = (l >> (e + 3)) - 16
      128 + e * 16 + m
    }
  }

  /** encode-then-decode: the value BM25 actually uses as fl(d). */
  @inline def roundtrip(l: Int): Int = decode(encode(l))
}
