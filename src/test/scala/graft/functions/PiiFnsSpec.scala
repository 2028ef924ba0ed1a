package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiFnsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "mail me at jane.doe+spam@corp-mail.example.org today"),
    (2L, "server at 192.168.001.4 and 10.0.0.255 rebooted"),
    (3L, "call 555-0134 or 555-9999 now"),
    (4L, "mixed: a@b.io on 127.0.0.1 ext 555-1234"),
    (5L, "nothing to scrub here 1234-56 not-a-phone 1.2.3 not-an-ip")
  ).toDF("id", "text")

  test("piiCount counts each class independently") {
    val got = rows.select($"id",
      PiiFns.piiCount($"text", PiiFns.EmailRe).as("e"),
      PiiFns.piiCount($"text", PiiFns.Ipv4Re).as("i"),
      PiiFns.piiCount($"text", PiiFns.PhoneRe).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((1L, 0L, 0L)))
    assert(got(2L) == ((0L, 2L, 0L)))
    assert(got(3L) == ((0L, 0L, 2L)))
    assert(got(4L) == ((1L, 1L, 1L)))
    assert(got(5L) == ((0L, 0L, 0L)))
  }

  test("redact replaces every span with its typed placeholder") {
    val got = rows.select($"id", PiiFns.redact($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "mail me at <EMAIL> today")
    assert(got(2L) == "server at <IP> and <IP> rebooted")
    assert(got(3L) == "call <PHONE> or <PHONE> now")
    assert(got(4L) == "mixed: <EMAIL> on <IP> ext <PHONE>")
    assert(got(5L) == "nothing to scrub here 1234-56 not-a-phone 1.2.3 not-an-ip")
  }

  test("redaction is complete: no pattern matches any scrubbed text (seeded random corpus)") {
    // pure-JVM property over randomized text with injected PII — the
    // same java.util.regex semantics Spark's codegen'd regexp_replace
    // compiles, so completeness here is completeness in the engine
    val rng = new scala.util.Random(11)
    val words = Seq("alpha", "b2", "x-y", "3.4", "a@", ".com", "555-", "1234", "z")
    def randText(): String = Seq.fill(rng.nextInt(12) + 1)(words(rng.nextInt(words.size)))
      .mkString(" ")
    val pii = Seq("u.1@ex-1.org", "10.0.255.3", "555-0100", "a+b_c%d@e.f.gh")
    val res = (0 until 300).map { _ =>
      val base = randText()
      val withPii = if (rng.nextBoolean()) s"$base ${pii(rng.nextInt(pii.size))} $base" else base
      withPii
    }.toDF("text").select(PiiFns.redact($"text").as("r")).as[String].collect()
    val patterns = Seq(PiiFns.EmailRe, PiiFns.Ipv4Re, PiiFns.PhoneRe).map(_.r)
    res.foreach { r =>
      patterns.foreach(p => assert(p.findFirstIn(r).isEmpty, s"unredacted PII in: $r"))
    }
  }

  test("redaction is idempotent: a scrubbed corpus re-scrubs to itself") {
    val once = rows.select(PiiFns.redact($"text").as("text"))
    val twice = once.select(PiiFns.redact($"text").as("text"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }
}
