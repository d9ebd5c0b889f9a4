package graft.text

import graft.SparkSuite

/** Window arithmetic of [[Chunker.chunk]]: chunk counts, overlap,
  * tail shortening, full token coverage, and the degenerate inputs.
  */
class ChunkerSpec extends SparkSuite {
  import spark.implicits._

  private def words(n: Int, from: Int = 0): String =
    (from until from + n).map(i => s"w$i").mkString(" ")

  private def rows(text: String, size: Int, stride: Int) =
    Chunker.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, stride)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getAs[Int]("chunk_idx"), r.getAs[Int]("token_start"),
        r.getAs[String]("chunk_text"), r.getAs[Int]("n_tokens")))

  test("short document yields a single whole chunk") {
    val r = rows(words(5), size = 8, stride = 4)
    assert(r === Seq((0, 0, words(5), 5)))
  }

  test("exact-size document yields exactly one chunk") {
    val r = rows(words(8), size = 8, stride = 4)
    assert(r.length === 1 && r.head._4 === 8)
  }

  test("overlapping windows stride correctly and the tail runs short") {
    // 10 tokens, size 4, stride 3 -> ceil((10-4)/3)+1 = 3 chunks, starts 0,3,6
    val r = rows(words(10), size = 4, stride = 3)
    assert(r.map(_._2) === Seq(0, 3, 6))
    assert(r.map(_._4) === Seq(4, 4, 4))
    assert(r(1)._3 === "w3 w4 w5 w6")
  }

  test("tail chunk is shorter when stride does not divide the overhang") {
    // 9 tokens, size 4, stride 3 -> ceil(5/3)+1 = 3 chunks; last = tokens 6..8 (3 tokens)
    val r = rows(words(9), size = 4, stride = 3)
    assert(r.map(_._4) === Seq(4, 4, 3))
    assert(r.last._3 === "w6 w7 w8")
  }

  test("every token appears in some chunk (stride <= size covers all)") {
    val r = rows(words(23), size = 7, stride = 5)
    val covered = r.flatMap(_._3.split(" ")).toSet
    assert(covered === (0 until 23).map(i => s"w$i").toSet)
  }

  test("non-overlapping stride == size partitions the tokens") {
    val r = rows(words(12), size = 4, stride = 4)
    assert(r.map(_._3) === Seq(
      "w0 w1 w2 w3", "w4 w5 w6 w7", "w8 w9 w10 w11"))
  }

  test("invalid stride is rejected at call time") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunker.chunk(df, "doc_id", "text", chunkSize = 4, stride = 5)
    }
    intercept[IllegalArgumentException] {
      Chunker.chunk(df, "doc_id", "text", chunkSize = 4, stride = 0)
    }
  }
}
