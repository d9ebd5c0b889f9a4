package graft.source

import graft.SparkSuite

/** N-Triples/N-Quads line parser (SURVEY.md §2.1 #3). */
class QuadSourceSpec extends SparkSuite {

  private def parse(lines: String*) = {
    val s = spark
    import s.implicits._
    QuadSource.fromNtLines(lines.toDF("value")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)), Option(r.getString(5))))
  }

  test("IRI object triple") {
    val out = parse("""<urn:s> <urn:p> <urn:o> .""")
    assert(out.toSeq == Seq(("urn:s", "urn:p", "urn:o", None, None, None)))
  }

  test("plain, lang-tagged and typed literals") {
    val out = parse(
      """<urn:s> <urn:p> "plain" .""",
      """<urn:s> <urn:p> "Journaal"@nl .""",
      """<urn:s> <urn:p> "PT1H"^^<http://www.w3.org/2001/XMLSchema#duration> .""")
    assert(out(0)._3 == "plain" && out(0)._4.isEmpty)
    assert(out(1)._3 == "Journaal" && out(1)._4.contains("nl"))
    assert(out(2)._3 == "PT1H" &&
      out(2)._5.contains("http://www.w3.org/2001/XMLSchema#duration"))
  }

  test("escapes in literals") {
    val out = parse("""<urn:s> <urn:p> "a \"quoted\" line\nnext" .""")
    assert(out(0)._3 == "a \"quoted\" line\nnext")
  }

  test("N-Quads 4th term becomes graph; malformed lines dropped") {
    val out = parse(
      """<urn:s> <urn:p> "v" <urn:g/or-1> .""",
      """# comment line""",
      """not a triple at all""")
    assert(out.length == 1)
    assert(out(0)._6.contains("urn:g/or-1"))
  }

  test("blank node subject and object pass through as tokens") {
    val out = parse("""_:b0 <urn:p> _:b1 .""")
    assert(out(0)._1 == "_:b0" && out(0)._3 == "_:b1")
  }

  test("ntEscapeLiteral round-trips hostile literals through fromNtLines") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val nasty = Seq(
      """plain text""",
      """with "double quotes" inside""",
      // the adjacent-escape corruption case: backslash followed by n
      // serializes as \\n, which a naive unescape order turns into
      // backslash + LF instead of backslash + 'n'
      """back\slash, \n-as-two-chars, trailing \""",
      "real\nnewline and\ttab and\rcr",
      """the full mix: \" \\ "q" and\na newline""",
      "unicode: 😀 é ñ 中",
      // raw private-use char must pass through untouched (a sentinel-
      // based unescape would corrupt it into a backslash)
      "private use  char")
    val lines = nasty.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(concat(
        lit("<urn:s/"), col("id"), lit("> <urn:p> \""),
        graft.functions.Functions.ntEscapeLiteral(col("v")),
        lit("\" .")).as("value"))
    val parsed = QuadSource.fromNtLines(lines).collect().map(_.getAs[String]("obj"))
    assert(parsed.toSeq.sorted == nasty.sorted,
      s"NT round-trip mismatch: ${parsed.toSeq.sorted.zip(nasty.sorted).filter(p => p._1 != p._2)}")
  }
}
