package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The bench/verify emitters hand-roll JSON (no JSON library on the
  * classpath by design); one unescaped control char silently zeroes a
  * round's parsed results, so the escaper gets its own property. */
class JsonSpec extends AnyFunSuite {
  test("quote emits no raw control chars, quotes, or backslashes for arbitrary input") {
    val gen = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('"', '\\', '\n', '\r', '\t', '', ' '),
      1 -> Gen.asciiPrintableChar)).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withInitialSeed(Seed(3L)),
      Prop.forAllNoShrink(gen) { s =>
        val q = Json.quote(s)
        val body = q.substring(1, q.length - 1)
        q.head == '"' && q.last == '"' &&
          body.forall(c => c >= ' ') &&
          // every interior quote/backslash is escaped: strip valid escape
          // pairs, then neither char may remain
          !body.replaceAll("""\\[\\"/nrtu]""", "").exists(c => c == '"' || c == '\\')
      })
    assert(res.passed, res.status.toString)
  }
}
