package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class PiiScrubSpec extends AnyFunSuite {

  private implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("piiscrub")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("scrub: emails, IPv4s, phones redacted; counts are as-redacted") {
    val docs = Seq(
      (1L, "Mail a.b+c@sub.example.org or x@y.io, host 10.0.0.1, call +4912345678."),
      (2L, "No pii here at all."),
      (3L, "user@192.168.0.1 mixes an email with an IP-shaped domain"),
      (4L, "edge 999.1.2.3 still matches the 1-3-digit octet shape")
    ).toDF("doc_id", "text")
    val out = PiiScrub.scrub(docs).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getString(1) ===
      "Mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>.")
    assert(r1.getInt(2) === 2 && r1.getInt(3) === 1 && r1.getInt(4) === 1)
    val r2 = out(1)
    assert(r2.getString(1) === "No pii here at all." && r2.getInt(2) === 0)
    // an IP-shaped domain is NOT an email (the pattern requires an
    // alphabetic TLD), so the IP inside it still gets redacted
    val r3 = out(2)
    assert(r3.getString(1).startsWith("user@<IP> mixes"))
    assert(r3.getInt(2) === 0 && r3.getInt(3) === 1)
    // \b-delimited 1-3 digit octets accept 999 (documented shape, not
    // range-validated — same class as published scrubbers)
    assert(out(3).getString(1).contains("<IP>"))

    // scrub is idempotent: no matches left in redacted text
    val again = PiiScrub.scrub(
      PiiScrub.scrub(docs).select(col("doc_id"), col("clean_text").as("text")))
    assert(again.agg(sum(col("n_emails") + col("n_ips") + col("n_phones")))
      .collect()(0).getLong(0) === 0L)

    // pure codegen: no UDF, no shuffle
    val plan = PiiScrub.scrub(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("Exchange"), plan)
  }

  test("scrub counts equal redactions performed: a phone-shaped run inside " +
       "an email never double-counts") {
    val docs = Seq(
      // the +12345678 run is part of the email local part: the email pass
      // removes it, so the phone count must be 0 (and ip count 0)
      (1L, "write to a+12345678@x.io please"),
      // an IP next to a phone: each counted by its own pass
      (2L, "host 10.0.0.1 phone +123456789")
    ).toDF("doc_id", "text")
    val out = PiiScrub.scrub(docs).orderBy("doc_id").collect()
    assert(out(0).getString(1) === "write to <EMAIL> please")
    assert(out(0).getInt(2) === 1 && out(0).getInt(3) === 0 &&
      out(0).getInt(4) === 0)
    assert(out(1).getString(1) === "host <IP> phone <PHONE>")
    assert(out(1).getInt(2) === 0 && out(1).getInt(3) === 1 &&
      out(1).getInt(4) === 1)
    // per-family counts sum to the total replacement tokens in clean_text
    out.foreach { r =>
      val tokens = Seq("<EMAIL>", "<IP>", "<PHONE>").map(t =>
        r.getString(1).sliding(t.length).count(_ == t)).sum
      assert(tokens === r.getInt(2) + r.getInt(3) + r.getInt(4))
    }
  }
}
