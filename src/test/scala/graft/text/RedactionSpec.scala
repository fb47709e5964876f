package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class RedactionSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("redact replaces every PII kind with its placeholder") {
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.org or call 555-123-4567, ssn 123-45-6789, host 192.168.0.1"),
      (2L, "clean text, nothing to redact here"),
      (3L, "two mails x@y.io and z@w.co plus +1 555 123 4567")
    ).toDF("id", "text")
    val got = df.select($"id", Redaction.redact($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "mail [EMAIL] or call [PHONE], ssn [SSN], host [IP]")
    assert(got(2L) == "clean text, nothing to redact here")
    assert(got(3L) == "two mails [EMAIL] and [EMAIL] plus +1 [PHONE]")
  }

  test("report counts per kind on the staged text (no double counting)") {
    val df = Seq(
      // the SSN must count as ssn, not phone; the IP inside no email
      (1L, "a@b.co 111-22-3333 444-555-6666 7.8.9.10")
    ).toDF("id", "text")
    val r = Redaction.report(df, "id", "text").head
    assert(r.getAs[Int]("n_email") == 1)
    assert(r.getAs[Int]("n_ssn") == 1)
    assert(r.getAs[Int]("n_phone") == 1)
    assert(r.getAs[Int]("n_ip") == 1)
    assert(r.getAs[String]("redacted") == "[EMAIL] [SSN] [PHONE] [IP]")
  }
}
