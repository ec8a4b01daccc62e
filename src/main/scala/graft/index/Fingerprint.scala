package graft.index

/** 64-bit FNV-1a content fingerprint over a float array's
  * little-endian IEEE-754 bytes, rendered as fixed-width hex.
  *
  * Replaces the 32-bit `java.util.Arrays.hashCode` fingerprints that
  * keyed artifact identity and vacuum staleness: artifact directories
  * are keyed per (segment, model) over the lifetime of a store, and a
  * 32-bit key reaches ~50% collision odds after only ~77k distinct
  * models ever fit — a collision makes a stale code dir
  * indistinguishable from the current model's, silently serving wrong
  * codes. At 64 bits the same odds need ~5 billion models. The hex
  * width is fixed (16 chars) so directory-suffix parsing stays
  * regular.
  */
object Fingerprint {

  /** Same FNV-1a stream over a string's UTF-8 bytes — used to derive
    * collision-safe catalog/directory names from paths and segment
    * sets. */
  def ofString(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    f"$h%016x"
  }

  def ofFloats(xs: Array[Float]): String = {
    var h = 0xcbf29ce484222325L // FNV-1a offset basis
    var i = 0
    while (i < xs.length) {
      val bits = java.lang.Float.floatToIntBits(xs(i))
      var b = 0
      while (b < 4) {
        h ^= (bits >>> (8 * b)) & 0xffL
        h *= 0x100000001b3L // FNV-1a prime
        b += 1
      }
      i += 1
    }
    f"$h%016x"
  }

  /** Same FNV-1a stream over little-endian IEEE-754 double bytes. */
  def ofDoubles(xs: Array[Double]): String = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < xs.length) {
      val bits = java.lang.Double.doubleToLongBits(xs(i))
      var b = 0
      while (b < 8) {
        h ^= (bits >>> (8 * b)) & 0xffL
        h *= 0x100000001b3L
        b += 1
      }
      i += 1
    }
    f"$h%016x"
  }
}
