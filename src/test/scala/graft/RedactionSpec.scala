package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Redaction

/** piiScrub semantics beyond the oracle query's one-of-each docs:
  * multiple matches, no matches, adjacency, and idempotence.
  */
class RedactionSpec extends AnyFunSuite {
  import TestSpark._

  private def scrub(texts: String*): Seq[(String, Int, Int, Int)] = {
    import spark.implicits._
    Redaction.piiScrub(texts.toDF("t"), "t")
      .select("redacted", "n_emails", "n_phones", "n_ips")
      .collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
  }

  test("replaces every occurrence, not just the first") {
    val Seq((red, ne, np, ni)) =
      scrub("a@b.com then c.d@e.org and +1-555-0000 or +44-123-999 at 192.168.0.1")
    assert(red == "<EMAIL> then <EMAIL> and <PHONE> or <PHONE> at <IP>")
    assert((ne, np, ni) == (2, 2, 1))
  }

  test("clean text passes through untouched") {
    val Seq((red, ne, np, ni)) = scrub("no personal data in here 10.5 degrees")
    assert(red == "no personal data in here 10.5 degrees")
    assert((ne, np, ni) == (0, 0, 0))
  }

  test("redaction is idempotent") {
    val once = scrub("mail me: x@y.io from 8.8.8.8")
    val again = scrub(once.head._1)
    assert(again.head._1 == once.head._1)
    assert(again.head._2 == 0 && again.head._4 == 0)
  }

  test("email is consumed before the IP pattern can see its dots") {
    // a domain with digit labels would otherwise leave an IP-shaped
    // remnant; the email pass must win
    val Seq((red, _, _, ni)) = scrub("ping 1a@b2.cc now")
    assert(red == "ping <EMAIL> now")
    assert(ni == 0)
  }
}
