package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QualityChecksSpec extends AnyFunSuite with SparkSpec {

  test("an empty input reports (0 violations, 0 total) — never NULL — on every check") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Double)].toDF("k", "s", "v")
    val parent = Seq((1L, "x")).toDF("pk", "p")
    val suite = QualityChecks.suite(Seq(
      QualityChecks.notNull(empty, Seq("k", "s")),
      QualityChecks.unique(empty, Seq("k")),
      QualityChecks.foreignKey(empty, "k", parent, "pk"),
      QualityChecks.accepted(empty, "s", Seq("a")),
      QualityChecks.inRange(empty, "v", 0.0, 1.0))).collect()
    assert(suite.length === 6)
    suite.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("violations")),
        s"NULL violations for ${r.getString(0)}/${r.getString(1)} — " +
          "an empty-load regression would slip a violations===0 gate")
      assert(r.getAs[Long]("violations") === 0L)
      assert(r.getAs[Long]("total") === 0L)
    }
  }

  test("violations are actually counted: dup keys, orphans, domain and range breaches") {
    import spark.implicits._
    val child = Seq((1L, "a", 0.5), (1L, "a", 0.5), (2L, "z", 9.9), (99L, "a", -1.0))
      .toDF("k", "s", "v")
    val parent = Seq((1L, "p"), (2L, "p")).toDF("pk", "p")
    def viol(df: org.apache.spark.sql.DataFrame): Long =
      df.head().getAs[Long]("violations")
    assert(viol(QualityChecks.unique(child, Seq("k"))) === 1L) // one extra copy of k=1
    assert(viol(QualityChecks.foreignKey(child, "k", parent, "pk")) === 1L) // 99
    assert(viol(QualityChecks.accepted(child, "s", Seq("a"))) === 1L) // z
    assert(viol(QualityChecks.inRange(child, "v", 0.0, 1.0)) === 2L) // 9.9, -1.0
  }
}
