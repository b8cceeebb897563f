package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** t23's drift statistic and d18's estimator-accuracy relation on
  * hand-checkable corpora.
  */
class DriftEstimateSpec extends AnyFunSuite with SparkSpec {

  test("tokenDrift surfaces the divergent tokens first; identical-rate tokens score exactly 0") {
    import spark.implicits._
    // corpus A says 'alpha' constantly, B says 'beta'; 'shared' is
    // common to both at the same rate
    val a = Seq.fill(20)("alpha shared").toDF("text")
    val b = Seq.fill(20)("beta shared").toDF("text")
    val out = TextAnalysis.tokenDrift(a, b, "text", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[String]("w")).take(2).toSet === Set("alpha", "beta"))
    assert(out.last.getAs[String]("w") === "shared")
    // equal pooled rates -> observed == expected -> chi2 exactly 0
    assert(out.last.getAs[Double]("chi2") === 0.0)
    // alpha and beta are mirror images: identical chi2
    assert(out(0).getAs[Double]("chi2") === out(1).getAs[Double]("chi2"))
  }

  test("minhashEstimateVsExact: identical docs estimate 1.0 with exact 1.0 and error 0") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text),
      (3L, text + " tail")).toDF("doc_id", "text")
    val out = Dedup.minhashEstimateVsExact(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Double]("est_jaccard"), r.getAs[Double]("exact_jaccard"),
          r.getAs[Double]("est_error")))).toMap
    // the exact-copy pair: every signature position matches, sets equal
    val (est12, jac12, err12) = out((1L, 2L))
    assert(est12 === 1.0 && jac12 === 1.0 && err12 === 0.0)
    // the near-dup pair is a candidate with high (not 1) exact jaccard
    out.get((1L, 3L)).foreach { case (_, jac13, _) =>
      assert(jac13 > 0.5 && jac13 < 1.0)
    }
    // estimator is bounded by construction
    out.values.foreach { case (est, jac, err) =>
      assert(est >= 0.0 && est <= 1.0 && jac >= 0.0 && jac <= 1.0)
      assert(err === math.abs(est - jac))
    }
  }
}
