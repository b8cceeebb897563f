package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class Scd2Spec extends AnyFunSuite with SparkSpec {

  test("fromChangeLog tiles each key's timeline with half-open versions") {
    import spark.implicits._
    val chg = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 15L, "x")).toDF("k", "eff", "v")
    val dim = Scd2.fromChangeLog(chg, "k", "eff", horizon = 100L)
      .select("k", "v", "valid_from", "valid_to").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(dim == Set(
      (1L, "a", 10L, 20L), (1L, "b", 20L, 30L), (1L, "c", 30L, 100L),
      (2L, "x", 15L, 100L)))
  }

  test("a change at/after the horizon fails loudly instead of vanishing from the join") {
    import spark.implicits._
    val chg = Seq((1L, 10L, "ok"), (1L, 120L, "late")).toDF("k", "eff", "v")
    val e = intercept[Exception] {
      Scd2.fromChangeLog(chg, "k", "eff", horizon = 100L).collect()
    }
    assert(e.getMessage.contains("horizon") ||
      Option(e.getCause).exists(_.getMessage.contains("horizon")))
  }

  test("pointInTimeJoin matches only the fact's own key and valid version") {
    import spark.implicits._
    val chg = Seq(
      (1L, 0L, "one_v1"), (1L, 50L, "one_v2"),
      (2L, 0L, "two_v1"), (2L, 50L, "two_v2")).toDF("k", "eff", "v")
    val dim = Scd2.fromChangeLog(chg, "k", "eff", horizon = 100L)
    // both keys share the same change times — without the equi-key,
    // every fact would bucket-match BOTH keys' versions
    val facts = Seq((1L, 25L, "f1"), (1L, 75L, "f2"), (2L, 25L, "f3"))
      .toDF("k", "pt", "tag")
    val out = Scd2.pointInTimeJoin(facts, "pt", dim, "k", bucketWidth = 10L)
      .select("tag", "v").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("f1" -> "one_v1", "f2" -> "one_v2", "f3" -> "two_v1"))
  }

  test("property: keyed bucketized join equals the naive key+range join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val chg = (1L to 20L).flatMap { k =>
      val times = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(1000).toLong)
        .distinct.sorted
      times.map(t => (k, t, s"k${k}_v$t"))
    }
    val chgDf = chg.toDF("k", "eff", "v")
    val dim = Scd2.fromChangeLog(chgDf, "k", "eff", horizon = 1000L)
    val facts = (1 to 300).map { i =>
      (1L + rnd.nextInt(20), rnd.nextInt(1000).toLong, i.toLong)
    }.toDF("k", "pt", "fid")
    val fast = Scd2.pointInTimeJoin(facts, "pt", dim, "k", bucketWidth = 37L)
      .select("fid", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = facts.as("f").join(dim.as("d"),
        col("f.k") === col("d.k") && col("f.pt") >= col("d.valid_from") &&
          col("f.pt") < col("d.valid_to"))
      .select("fid", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fast == naive)
    // tiling: every fact at/after its key's first change matched exactly once
    val firsts = chg.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    val expected = facts.collect().count { r =>
      r.getLong(1) >= firsts(r.getLong(0))
    }
    assert(fast.size == expected)
  }
}
