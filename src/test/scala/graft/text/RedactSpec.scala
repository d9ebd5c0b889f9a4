package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Unit contract for [[Redact]] — the rule ORDER and the classes'
  * non-interference, on adversarial strings the battery's planted
  * corpus doesn't exercise. */
class RedactSpec extends SparkSuite {

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Redact.redactPii(col("t"))).as[String].head()
  }

  test("each class redacts to its own token") {
    assert(redact("mail a.b+c@ex-ample.org now") == "mail <EMAIL> now")
    assert(redact("host 192.168.0.254 down") == "host <IP> down")
    assert(redact("call +32 (0)2 555-0199 ok") == "call <PHONE> ok")
  }

  test("emails with digit runs are not phone-mangled (order contract)") {
    // digits+dots inside the local part must leave as ONE email token,
    // not a phone/IP fragment salad
    assert(redact("x 0123456789@example.com y") == "x <EMAIL> y")
  }

  test("dotted quads are not phone-matched (dot not in phone class)") {
    assert(redact("ip 10.20.30.40 tel 020 555 0199")
      == "ip <IP> tel <PHONE>")
  }

  test("counts report per class on the raw text") {
    import spark.implicits._
    val df = Seq("a@b.co c@d.org 1.2.3.4 +32 2 555 0199").toDF("t")
    val row = df.select(Redact.piiCounts(col("t"))
      .map { case (n, c) => c.as(n) }: _*).head()
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) == ((2, 1, 1)))
  }

  test("short digit runs survive (phone needs 8+ chars)") {
    assert(redact("room 4021 floor 3") == "room 4021 floor 3")
  }
}
