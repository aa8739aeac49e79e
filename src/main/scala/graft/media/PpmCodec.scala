package graft.media

/** A REAL image codec, dependency-free: binary PPM (P6), the fixed
  * header + raw-pixel format every image toolchain can read
  * (`man ppm`; netpbm's spec is public). The container ships no
  * image/audio libraries, so this is the smallest codec that makes the
  * multimodal stages exercise true byte→pixel semantics instead of a
  * deterministic fake: [[decode]] genuinely parses a header and pulls
  * pixel bytes out of a payload, [[encode]] genuinely lays them back
  * down, and a malformed payload throws instead of hashing quietly.
  *
  * Format: `P6` <ws> width <ws> height <ws> maxval(255) <single ws>
  * then exactly width*height*3 raw RGB bytes. `#` comments after any
  * whitespace gap are honored on decode (netpbm allows them); encode
  * emits the canonical single-`\n` form so bytes are reproducible.
  */
object PpmCodec {

  /** Canonical P6 bytes for a w×h RGB raster (row-major, 3 bytes per
    * pixel): header `P6\n<w> <h>\n255\n` + pixels, verbatim. */
  def encode(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(pixels.length == w * h * 3,
      s"pixel buffer ${pixels.length} != $w*$h*3")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Parse a P6 payload → (width, height, rgb bytes). Accepts any
    * conformant whitespace/comment layout; throws IllegalArgumentException
    * on anything else (wrong magic, maxval ≠ 255, truncated raster). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var i = 0
    def fail(msg: String) = throw new IllegalArgumentException(s"bad PPM: $msg")
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') fail("magic != P6")
    i = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWs(): Unit = {
      var progressed = false
      while (i < bytes.length &&
             (isWs(bytes(i)) || bytes(i) == '#')) {
        if (bytes(i) == '#') { // comment runs to end of line
          if (!progressed) fail("comment not preceded by whitespace")
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else { progressed = true; i += 1 }
      }
      if (!progressed) fail("missing whitespace separator")
    }
    def readInt(): Int = {
      skipWs()
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
        if (v > Int.MaxValue) fail("header int overflow")
      }
      if (i == start) fail("expected integer in header")
      v.toInt
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    // exactly ONE whitespace byte between maxval and raster (spec)
    if (i >= bytes.length || !isWs(bytes(i))) fail("missing raster separator")
    i += 1
    val need = w.toLong * h * 3
    if (bytes.length - i < need) fail(s"truncated raster: ${bytes.length - i} < $need")
    (w, h, java.util.Arrays.copyOfRange(bytes, i, i + need.toInt))
  }

  /** Nearest-neighbor resample of a decoded raster to `w2`×`h2` — the
    * real pixel arithmetic (source index = floor(dst * src / dst_dim)
    * per axis, 3-byte pixel copies), not a payload truncation. */
  def resizePixels(w: Int, h: Int, pixels: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    require(w2 > 0 && h2 > 0, s"bad target ${w2}x$h2")
    require(pixels.length == w * h * 3, "pixel buffer mismatch")
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * h / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * w / w2).toInt
        val s = (sy * w + sx) * 3
        val d = (y * w2 + x) * 3
        out(d) = pixels(s); out(d + 1) = pixels(s + 1); out(d + 2) = pixels(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}
