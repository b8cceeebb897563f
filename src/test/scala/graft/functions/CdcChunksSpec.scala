package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Content-defined chunking (d27's primitive): lossless reassembly,
  * agreement with a direct per-position reference (the rolling update
  * vs the polynomial the oracle states), boundary LOCALITY under a
  * prefix edit (the property fixed-width blocks lack), and edge cases.
  */
class CdcChunksSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  private val W = 8
  private val D = 31

  private def chunksOf(rows: Seq[String]): Seq[Seq[String]] =
    rows.toDF("s")
      .select(TextHashExpressions.cdc_chunks(col("s"), W, D).as("c"))
      .collect().map(r => r.getSeq[String](0).toList).toList

  /** Direct (non-rolling) reference: hash of the w-gram ending at each
    * 0-based i ≥ w−1 as the plain polynomial — the oracle's statement.
    */
  private def referenceChunks(s: String): Seq[String] = {
    val bounds = (W - 1 until s.length).filter { i =>
      val h = (i - W + 1 to i).foldLeft(0L)((a, j) => (a * 31 + s.charAt(j)) & 0xFFFFFFFFL)
      h % D == 0
    }
    val ends = if (bounds.lastOption.contains(s.length - 1)) bounds.map(_ + 1)
      else bounds.map(_ + 1) :+ s.length
    val starts = 0 +: ends.dropRight(1)
    if (s.isEmpty) Nil else starts.zip(ends).map { case (a, b) => s.substring(a, b) }
  }

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog " * 20,
    (0 until 1000).map(i => ('a' + i % 26).toChar).mkString,
    "short", "", "exactly8",
    "a" * 500 // degenerate: identical windows everywhere
  )

  test("chunks concatenate back to the input (lossless), match the direct reference") {
    val got = chunksOf(corpus)
    corpus.zip(got).foreach { case (s, cs) =>
      assert(cs.mkString === s, s"reassembly broke for ${s.take(20)}...")
      assert(cs === referenceChunks(s), s"rolling != direct for ${s.take(20)}...")
      assert(cs.forall(_.nonEmpty))
    }
  }

  test("boundaries are content-defined: a prefix insertion leaves the tail chunks intact") {
    val base = "the quick brown fox jumps over the lazy dog. " * 40
    val edited = "INSERTED PREAMBLE >>> " + base
    val Seq(a, b) = chunksOf(Seq(base, edited))
    // all boundaries at offset >= w-1 past the edit re-align: the two
    // chunk streams share a long common suffix (fixed blocks share none)
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    assert(common >= a.length - 2,
      s"expected all but the first chunk(s) to survive the edit; common suffix = $common of ${a.length}")
    assert(a.length >= 10, "corpus too short to make the locality claim non-vacuous")
  }

  test("null-safe and SQL-registered") {
    val out = Seq[String](null).toDF("s")
      .select(TextHashExpressions.cdc_chunks(col("s"), W, D)).collect()
    assert(out(0).isNullAt(0))
    TextHashExpressions.register(spark)
    val viaSql = spark.sql("SELECT cdc_chunks('abcdefghijklmnop', 8, 31)")
      .head().getSeq[String](0)
    assert(viaSql.mkString === "abcdefghijklmnop")
  }

  test("interpreted eval and codegen agree") {
    val df = corpus.toDF("s")
    val expr = TextHashExpressions.cdc_chunks(col("s"), W, D)
    val gen = df.select(expr).collect().map(_.getSeq[String](0).toList)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(expr).collect().map(_.getSeq[String](0).toList)
      assert(gen.toSeq === interp.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
