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

  test("native one-pass parse is behaviorally identical to the composed form") {
    val s = spark
    import s.implicits._
    // Every grammar branch plus the hostile cases: IRI/blank/literal
    // objects, lang and datatype suffixes, quads, comments, malformed
    // lines, whitespace slack, every escape the chain handles, unknown
    // escapes, internal quotes, adjacent backslash runs.
    val fixture = Seq(
      """<urn:s> <urn:p> <urn:o> .""",
      """  <urn:s>   <urn:p>   "padded"   .  """,
      """<urn:s> <urn:p> "Journaal"@nl .""",
      """<urn:s> <urn:p> "PT1H"^^<http://www.w3.org/2001/XMLSchema#duration> .""",
      """<urn:s> <urn:p> "v" <urn:g/or-1> .""",
      """_:b0 <urn:p> _:b1 .""",
      """_:b0 <urn:p> "blank-subject literal" .""",
      """<urn:s> <urn:p> "a \"quoted\" line\nnext" .""",
      """<urn:s> <urn:p> "tabs\tand\rcr and \\ backslash" .""",
      """<urn:s> <urn:p> "adjacent \\n run and unknown \q escape" .""",
      """<urn:s> <urn:p> "trailing backslash \\" .""",
      """<urn:s> <urn:p> "" .""",
      """<urn:s> <urn:p> ""@en .""",
      """# comment line""",
      """""",
      """not a triple at all""",
      """<urn:s> <missing-object> .""")
    val lines = fixture.toDF("value")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until 6).map(i => Option(r.getString(i))).toList).toList
    assert(rows(QuadSource.fromNtLines(lines)) ===
      rows(QuadSource.fromNtLinesComposed(lines)))
  }

  test("generated escape-heavy literals round-trip through BOTH parsers") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // Seeded generator biased toward the characters the escape chain
    // must handle: backslashes, quotes, control chars, multi-byte.
    // Tokens (not chars), so surrogate pairs stay intact.
    val alphabet = IndexedSeq(
      "\\", "\"", "n", "t", "r", " ", "\n", "\r", "\t", "a", "b",
      "\ud83d\ude00", "\u00e9")
    val rnd = new scala.util.Random(20260813L)
    val values = (0 until 200).map { _ =>
      val len = 1 + rnd.nextInt(20)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    // NT expression-parser path
    val ntLines = df.select(concat(
      lit("<urn:s/"), col("id"), lit("> <urn:p> \""),
      graft.functions.Functions.ntEscapeLiteral(col("v")), lit("\" .")).as("value"))
    val ntBack = QuadSource.fromNtLines(ntLines).collect()
      .map(r => r.getAs[String]("subject") -> r.getAs[String]("obj")).toMap
    // Turtle character-parser path (one doc with all statements)
    val ttlDoc = df.select(concat(
      lit("<urn:s/"), col("id"), lit("> <urn:p> \""),
      graft.functions.Functions.ntEscapeLiteral(col("v")), lit("\" .")).as("stmt"))
      .agg(concat_ws("\n", collect_list(col("stmt"))).as("doc"))
      .as[String].collect().head
    val ttlBack = TurtleParser.parse(ttlDoc)
      .map(q => q.subject -> q.obj).toMap
    values.zipWithIndex.foreach { case (v, i) =>
      assert(ntBack(s"urn:s/$i") == v,
        s"NT path corrupted ${v.map(_.toInt.toHexString)}")
      assert(ttlBack(s"urn:s/$i") == v,
        s"Turtle path corrupted ${v.map(_.toInt.toHexString)}")
    }
  }
}
