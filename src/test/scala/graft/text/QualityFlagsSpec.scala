package graft.text

import graft.SparkSpec

class QualityFlagsSpec extends SparkSpec {
  import spark.implicits._

  private def flags(text: String): (Int, Int, Int, Int) = {
    val r = TextAnalysis.qualityFlags(Seq((1L, text)).toDF("doc_id", "text")).collect().head
    (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  test("repetition flag fires at max-term-share >= 1/5") {
    assert(flags("spam spam spam spam one two three four five six")._1 == 1) // 4/10
    assert(flags("a1 b2 c3 d4 e5 f6 g7 h8 i9 j10")._1 == 0) // all distinct, 1/10 < 1/5
  }

  test("word-length flags: degenerate short, and long technical strings") {
    assert(flags("aa bb cc dd")._2 == 1) // mean 2 < 3
    assert(flags("abcdefghijklmnop qrstuvwxyzabcdef")._3 == 1) // mean 16 > 10
    assert(flags("hello world again")._2 == 0)
    assert(flags("hello world again")._3 == 0)
  }

  test("symbol flag: >=10% non-alphanumeric-space characters") {
    assert(flags("$$$ %%% @@@ !!!")._4 == 1)
    assert(flags("plain words only here")._4 == 0)
  }

  test("empty and null-ish docs flag short_words only") {
    assert(flags("") == ((0, 1, 0, 0)))
    assert(flags("   ") == ((0, 1, 0, 0)))
  }
}
