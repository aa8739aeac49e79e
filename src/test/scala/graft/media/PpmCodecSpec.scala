package graft.media

import org.scalatest.funsuite.AnyFunSuite

class PpmCodecSpec extends AnyFunSuite {

  private def px(n: Int): Array[Byte] = Array.tabulate(n * 3)(i => (i * 7 + 3).toByte)

  test("encode → decode round-trips dimensions and pixels byte-exactly") {
    val pixels = px(6 * 4)
    val bytes = PpmCodec.encode(6, 4, pixels)
    assert(new String(bytes.take(11), "US-ASCII") == "P6\n6 4\n255\n")
    val (w, h, out) = PpmCodec.decode(bytes)
    assert(w == 6 && h == 4)
    assert(java.util.Arrays.equals(out, pixels))
  }

  test("decode accepts conformant foreign layouts: extra whitespace and comments") {
    val pixels = px(2 * 2)
    val foreign = "P6 # netpbm allows comments\n 2\t2 \n#another\n255\n".getBytes("US-ASCII") ++ pixels
    val (w, h, out) = PpmCodec.decode(foreign)
    assert(w == 2 && h == 2 && java.util.Arrays.equals(out, pixels))
  }

  test("decode throws on malformed payloads instead of hashing quietly") {
    val good = PpmCodec.encode(2, 2, px(4))
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode("Hello, not an image".getBytes)).getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode(good.dropRight(1))).getMessage.contains("truncated"))
    val maxval128 = "P6\n2 2\n128\n".getBytes("US-ASCII") ++ px(4)
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode(maxval128)).getMessage.contains("maxval"))
    assert(intercept[IllegalArgumentException](
      PpmCodec.decode("P6\n0 2\n255\n".getBytes)).getMessage.contains("dimensions"))
  }

  test("nearest-neighbor resize: identity at same size, exact picks when halving") {
    val pixels = px(4 * 2)
    assert(java.util.Arrays.equals(PpmCodec.resizePixels(4, 2, pixels, 4, 2), pixels))
    // 4x2 → 2x1: dst(x,y) = src(2x, 2y) — pixels (0,0) and (2,0)
    val half = PpmCodec.resizePixels(4, 2, pixels, 2, 1)
    assert(half.length == 2 * 1 * 3)
    assert(java.util.Arrays.equals(half.slice(0, 3), pixels.slice(0, 3)))
    assert(java.util.Arrays.equals(half.slice(3, 6), pixels.slice(6, 9)))
    // upscale 1x1 → 3x3 replicates the single pixel
    val one = px(1)
    val up = PpmCodec.resizePixels(1, 1, one, 3, 3)
    assert(up.grouped(3).forall(g => java.util.Arrays.equals(g.toArray, one)))
  }
}
