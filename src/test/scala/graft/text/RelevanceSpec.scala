package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RelevanceSpec extends SparkSuite {
  import spark.implicits._

  // 3 docs: "cat" everywhere (idf=ln(1)=0), "dog" in two, "emu" in one.
  private def docs = Seq(
    (1L, "cat dog emu emu"),
    (2L, "cat dog"),
    (3L, "cat")
  ).toDF("doc_id", "text")

  test("tfIdf computes tf, df and tf*ln(N/df)") {
    val got = Relevance.tfIdf(docs, "doc_id", "text")
      .select($"doc_id", $"term", $"tf", $"df", $"score")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got((1L, "cat")) === ((1L, 3L, 0.0)))
    assert(got((1L, "emu"))._1 === 2L)
    assert(math.abs(got((1L, "emu"))._3 - 2.0 * math.log(3.0)) < 1e-12)
    assert(math.abs(got((2L, "dog"))._3 - math.log(3.0 / 2.0)) < 1e-12)
    assert(got.size === 6) // (1:cat,dog,emu)(2:cat,dog)(3:cat)
  }

  test("topTerms ranks score desc with term tie-break and keeps k rows") {
    val top = Relevance.topTerms(Relevance.tfIdf(docs, "doc_id", "text"), "doc_id", 1)
      .select($"doc_id", $"term").as[(Long, String)].collect().toMap
    assert(top(1L) === "emu") // highest score in doc 1
    assert(top(2L) === "dog") // dog idf > cat idf=0
    assert(top(3L) === "cat") // only term, score 0, still emitted
  }

  test("bm25 saturates tf and rewards rare terms") {
    val scored = Relevance.bm25(docs, "doc_id", "text")
      .select($"doc_id", $"term", $"score")
      .as[(Long, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // rare "emu" outranks ubiquitous "cat" in doc 1
    assert(scored((1L, "emu")) > scored((1L, "cat")))
    // same term+tf in a shorter doc scores higher (length normalization)
    assert(scored((2L, "dog")) > scored((1L, "dog")) ||
      math.abs(scored((2L, "dog")) - scored((1L, "dog"))) < 1e-9)
    // every score is finite and non-negative under the smoothed idf
    assert(scored.values.forall(s => !s.isNaN && s >= 0))
  }

  test("unigramNll: closed form on the fixture; rare tokens score higher") {
    // Corpus occurrences: cat 3, dog 2, emu 2 → T = 7.
    val got = Relevance.unigramNll(docs, "doc_id", "text")
      .select($"doc_id", $"n_tok", $"nll")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def p(c: Double) = -math.log(c / 7.0)
    assert(got(1L)._1 === 4L)
    assert(math.abs(got(1L)._2 - (p(3) + p(2) + 2 * p(2)) / 4.0) < 1e-12)
    assert(math.abs(got(2L)._2 - (p(3) + p(2)) / 2.0) < 1e-12)
    assert(math.abs(got(3L)._2 - p(3)) < 1e-12)
    // the all-common doc (cat only) is the most "likely" = lowest NLL
    assert(got(3L)._2 < got(2L)._2 && got(2L)._2 < got(1L)._2)
  }
}
