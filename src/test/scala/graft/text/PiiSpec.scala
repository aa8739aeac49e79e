package graft.text

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    Pii.scrub(texts.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ids"), r.getAs[Long]("n_emails"), r.getAs[Long]("n_ips"),
          r.getAs[Long]("n_phones"), r.getAs[String]("redacted")))).toMap

  test("each PII shape is counted and redacted to its placeholder") {
    val got = run(
      1L -> "mail me at jane.doe+x@sub.example.org today",
      2L -> "call 555-123-4567 or 555-987-6543",
      3L -> "ssn 123-45-6789 host 192.168.0.1",
      4L -> "clean text with numbers 123 456 7890 and dots a.b.c")
    assert(got(1L) == ((0L, 1L, 0L, 0L, "mail me at <EMAIL> today")))
    assert(got(2L) == ((0L, 0L, 0L, 2L, "call <PHONE> or <PHONE>")))
    assert(got(3L) == ((1L, 0L, 1L, 0L, "ssn <ID> host <IP>")))
    assert(got(4L) == ((0L, 0L, 0L, 0L, "clean text with numbers 123 456 7890 and dots a.b.c")))
  }

  test("id (3-2-4) and phone (3-3-4) digit grammars never cross-match") {
    val got = run(1L -> "id 123-45-6789 phone 123-456-7890")
    assert(got(1L) == ((1L, 0L, 0L, 1L, "id <ID> phone <PHONE>")))
  }

  test("null text is scrubbed as empty, not null") {
    val df = Seq((1L, null: String)).toDF("doc_id", "text")
    val r = Pii.scrub(df).collect().head
    assert(r.getAs[String]("redacted") == "")
    assert(r.getAs[Long]("n_emails") == 0L)
  }

  test("counts are measured on the original text (an IP inside a mail domain still counts)") {
    val got = run(1L -> "x@1.2.3.4.co end and bare 5.6.7.8")
    val (ids, emails, ips, phones, red) = got(1L)
    assert((ids, emails, ips, phones) == ((0L, 1L, 2L, 0L)))
    assert(red == "<EMAIL> end and bare <IP>") // email fires first; its inner IP is gone
  }

  test("property: scrubbing is idempotent and leaves zero residual matches") {
    val rnd = new scala.util.Random(23)
    val bits = Seq("plain words here", "a@b.co", "999-123-4567", "321-54-9876",
      "8.8.8.8", "x_1%y@sub.domain.org", "text 42 and 7.5 remain", "12-34-56")
    val docs = (1L to 60L).map(i =>
      (i, Seq.fill(5)(bits(rnd.nextInt(bits.length))).mkString(" ")))
    val once = run(docs: _*)
    // no residual: re-scrubbing the redacted text changes nothing and
    // every pattern count on it is zero
    val again = Pii.scrub(once.toSeq.map { case (id, (_, _, _, _, r)) => (id, r) }
        .toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ids"), r.getAs[Long]("n_emails"), r.getAs[Long]("n_ips"),
          r.getAs[Long]("n_phones"), r.getAs[String]("redacted")))).toMap
    again.foreach { case (id, (ids, emails, ips, phones, red)) =>
      assert((ids, emails, ips, phones) == ((0L, 0L, 0L, 0L)), s"residual PII in doc $id: $red")
      assert(red == once(id)._5, s"scrub not idempotent for doc $id")
    }
  }
}
