package graft.text

import scala.util.Random

import graft.SparkSuite

/** Property-style invariants for [[Redact]] on generated PII-dense
  * corpora (seeded — failures reproduce exactly).
  *
  * The load-bearing one is IDEMPOTENCE: production scrub jobs re-run
  * over partially-scrubbed corpora (backfills, resumed syncs), so a
  * second pass must be a no-op — the replacement tokens contain no
  * digits, and none of the three patterns can match a token or spill
  * across one. Checked here on 2,000 random documents rather than
  * argued. */
class RedactPropertySpec extends SparkSuite {

  private val rnd = new Random(0x9e3779b9L)

  private def word(): String =
    Iterator.fill(2 + rnd.nextInt(7))(('a' + rnd.nextInt(26)).toChar).mkString
  private def email(): String = {
    val locals = Seq(word(), word() + rnd.nextInt(1000), s"${word()}.${word()}",
      s"${word()}+tag", s"${word()}_%")
    val tld = Seq("com", "org", "be", "dev")(rnd.nextInt(4))
    s"${locals(rnd.nextInt(locals.size))}@${word()}-${word()}.$tld"
  }
  private def ip(): String =
    Seq.fill(4)(rnd.nextInt(256)).mkString(".")
  private def phone(): String = {
    val plus = if (rnd.nextBoolean()) "+" else ""
    val sep = Seq("", " ", "-", ") ")(rnd.nextInt(4))
    val open = if (sep == ") ") "(" else ""
    s"$plus$open${100 + rnd.nextInt(900)}$sep${1000000 + rnd.nextInt(9000000)}"
  }
  private def doc(): String =
    Iterator.fill(1 + rnd.nextInt(25))(rnd.nextInt(9) match {
      case 0 => email()
      case 1 => ip()
      case 2 => phone()
      case _ => word()
    }).mkString(" ")

  private def redactAll(docs: Seq[String]): Seq[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    docs.toDF("t").select(Redact.redactPii(col("t"))).as[String].collect().toSeq
  }

  private lazy val corpus = Seq.fill(2000)(doc())
  private lazy val scrubbed = redactAll(corpus)

  test("redaction is idempotent on PII-dense generated text") {
    assert(redactAll(scrubbed) == scrubbed)
  }

  test("redacted text never retains a raw email or dotted quad") {
    val email = s".*${Redact.EmailPattern}.*"
    val quad = s".*${Redact.Ipv4Pattern}.*"
    val bad = scrubbed.filter(r => r.matches(email) || r.matches(quad))
    assert(bad.isEmpty, s"unscrubbed PII survived in ${bad.take(3)}")
  }
}
