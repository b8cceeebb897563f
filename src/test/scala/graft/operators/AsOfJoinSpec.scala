package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  test("attaches latest right payload at or before left ts, per key") {
    import spark.implicits._
    val quotes = Seq((1L, 10L, "q10"), (1L, 20L, "q20"), (2L, 5L, "p5"))
      .toDF("qk", "qts", "quote")
    val trades = Seq((1L, 9L), (1L, 10L), (1L, 25L), (2L, 4L), (3L, 100L))
      .toDF("tk", "tts")
    val out = AsOfJoin.joinAsOf(trades, quotes, "tk", "qk", "tts", "qts", Seq("quote"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == Set(
      (1L, 9L, None),          // before first quote
      (1L, 10L, Some("q10")),  // inclusive at equal ts
      (1L, 25L, Some("q20")),  // latest preceding
      (2L, 4L, None),
      (3L, 100L, None)))       // key with no right rows
  }

  test("a matched right row whose payload is NULL attaches NULL, not an older value") {
    import spark.implicits._
    // quote at ts 20 is legitimately NULL; true as-of (DuckDB ASOF)
    // attaches that NULL to a trade at ts 25 — not q10 from ts 10
    val quotes = Seq((1L, 10L, Option("q10")), (1L, 20L, Option.empty[String]))
      .toDF("qk", "qts", "quote")
    val trades = Seq((1L, 15L), (1L, 25L)).toDF("tk", "tts")
    val out = AsOfJoin.joinAsOf(trades, quotes, "tk", "qk", "tts", "qts", Seq("quote"))
      .collect().map(r => (r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == Set(15L -> Some("q10"), 25L -> None))
  }
}
