package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative equivalence proofs for the native sketch helpers: each
  * codegen'd loop ([[SketchOps]], [[WinnowOps]]) must agree with a
  * direct, obviously-correct Scala statement of the algorithm on
  * arbitrary inputs — the native rewrites replaced oracle-verified SQL
  * folds, so any divergence here is a silent correctness regression the
  * corpus queries might not exercise. Pure JVM tests (no SparkSession). */
class NativeSketchSpec extends AnyFunSuite {
  private val P = SketchOps.P
  private val hashesGen: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, (1L << 28) - 1))

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100).withInitialSeed(Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("minhash_sig equals the reference fold for arbitrary hash arrays") {
    checkProp(Prop.forAllNoShrink(hashesGen) { hs =>
      val native = SketchOps.minhash(new GenericArrayData(hs.toArray), 16).toLongArray().toSeq
      val ref = (0 until 16).map { j =>
        hs.foldLeft(P)((m, h) => math.min(m, ((2L * j + 1) * h + 104729L * j + 7919L) % P))
      }
      native == ref
    })
  }

  test("simhash32 equals the majority-vote reference for arbitrary hash arrays") {
    val h60Gen = Gen.listOf(Gen.choose(0L, (1L << 60) - 1))
    checkProp(Prop.forAllNoShrink(h60Gen) { hs =>
      val native = SketchOps.simhash32(new GenericArrayData(hs.toArray))
      val ref = (0 until 32).map { i =>
        if (hs.count(h => ((h >> i) & 1L) == 1L) * 2 > hs.size) 1L << i else 0L
      }.sum
      native == ref
    })
  }

  test("string-input sketches equal hash-then-sketch composition") {
    val shinglesGen = Gen.listOf(Gen.alphaStr.map(_.take(12)))
    checkProp(Prop.forAllNoShrink(shinglesGen) { ss =>
      val arr = new GenericArrayData(ss.map(UTF8String.fromString).toArray[Any])
      val h28 = new GenericArrayData(ss.map(s => Md5Hash.eval(UTF8String.fromString(s), 7)).toArray)
      val h60 = new GenericArrayData(ss.map(s => Md5Hash.eval(UTF8String.fromString(s), 15)).toArray)
      SketchOps.minhashStr(arr, 16).toLongArray().toSeq ==
        SketchOps.minhash(h28, 16).toLongArray().toSeq &&
        SketchOps.simhash32Str(arr) == SketchOps.simhash32(h60)
    })
  }

  test("word_shingles equals the split/slide/distinct reference (empty tokens kept)") {
    val textGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(3 -> Gen.oneOf('a', 'b', 'c'), 2 -> Gen.const(' '))))
    checkProp(Prop.forAllNoShrink(textGen) { s =>
      val native = ShingleOps.eval(UTF8String.fromString(s), 3)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val words = s.split(" ", -1).toSeq
      val ref =
        if (words.length < 3) Seq.empty
        else (0 to words.length - 3).map(i => words.slice(i, i + 3).mkString(" ")).distinct
      native == ref
    })
  }

  test("winnow_fps equals the naive per-window-minimum reference for arbitrary texts") {
    val textGen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('a' to 'e') ++ Seq(' ', 'ß', '中'))))
    val (k, w) = (4, 3)
    checkProp(Prop.forAllNoShrink(textGen) { s =>
      val native = WinnowOps.eval(UTF8String.fromString(s), k, w).toLongArray().toSeq
      val cps = s.toSeq // BMP chars only in the generator → 1 char = 1 codepoint
      val grams = (0 to cps.length - k)
        .map(i => Md5Hash.eval(UTF8String.fromString(cps.slice(i, i + k).mkString), 7))
      val ref = (0 to grams.length - w).map(i => grams.slice(i, i + w).min)
        .distinct.sorted
      native == ref
    })
  }
}
