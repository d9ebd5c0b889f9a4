package graft.text

import graft.SparkSuite

class CorpusPrepSpec extends SparkSuite {

  private val good =
    "this is a reasonably long document with plenty of ordinary words " +
      "that passes every quality threshold easily and then some"

  test("quality filter drops short, token-poor and punct-heavy docs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, good),
      (2L, "too short"),
      (3L, "!!!! ???? ;;;; ::: @@@@ #### %%%% ^^^^ &&&& **** (((( )))) {{{{"),
      (4L, "a b c d e f g h i j k l m n o p q r s t u v w x y z a b c d e f g h")
    ).toDF("doc_id", "text")
    val kept = CorpusPrep.prepare(df, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.contains(1L))
    assert(!kept.contains(2L)) // minChars
    assert(!kept.contains(3L)) // punct ratio
    assert(kept.contains(4L))  // many tokens, long enough, no punct
  }

  test("exact dedup keeps min id; near-dup stage drops the higher twin") {
    val s = spark
    import s.implicits._
    val near = good.replace("some", "more")
    val df = Seq(
      (10L, good), (11L, good), // exact pair
      (12L, near),              // near-dup of 10
      (13L, "a completely different long document about distributed engines " +
        "with shuffle partitioning and adaptive execution at large scale")
    ).toDF("doc_id", "text")
    val exactOnly = CorpusPrep.prepare(df, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(exactOnly == Set(10L, 12L, 13L)) // 11 collapsed into 10
    val withNear = CorpusPrep.prepare(df, "doc_id", "text",
      nearDup = true, minJaccard = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(withNear == Set(10L, 13L)) // 12 removed as near-dup of 10
  }
}
