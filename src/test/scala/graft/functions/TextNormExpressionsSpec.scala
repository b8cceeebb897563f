package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Native NFC normalization: canonical equivalence collapses, ASCII is
  * untouched (the isNormalized fast path), idempotence, nulls, SQL
  * registration, and a codegen/eval agreement sweep.
  */
class TextNormExpressionsSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  private val composed = "caf\u00e9"
  private val decomposed = "cafe\u0301"

  private def nfc(rows: Seq[String]) =
    rows.toDF("s")
      .select(TextNormExpressions.nfc_normalize(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))

  test("composed and decomposed forms normalize to identical strings") {
    val Array(a, b) = nfc(Seq(composed, decomposed))
    assert(a === b)
    assert(a === composed) // NFC prefers the composed form
  }

  test("ASCII and already-normalized text pass through unchanged; idempotent; null-safe") {
    val in = Seq("plain ascii", composed, "", null)
    val out = nfc(in)
    assert(out(0) === "plain ascii" && out(1) === composed && out(2) === "")
    assert(out(3) === null)
    assert(nfc(out.filter(_ != null).toSeq).toSeq === out.filter(_ != null).toSeq)
  }

  test("registered in SQL; arity and type errors are typed analysis failures") {
    TextNormExpressions.register(spark)
    val r = spark.sql(s"SELECT nfc_normalize('$decomposed')").head().getString(0)
    assert(r === composed)
    val e = intercept[Exception] {
      spark.sql("SELECT nfc_normalize('a', 'b')").collect()
    }
    assert(e.getMessage.contains("nfc_normalize"))
    val t = intercept[Exception] {
      spark.sql("SELECT nfc_normalize(42)").collect()
    }
    assert(t.getMessage.toLowerCase.contains("string"))
  }

  test("codegen and interpreted eval agree on a mixed sweep") {
    val rows = Seq("plain", composed, decomposed, decomposed + " " + composed,
      "\u00c5", "\u212b", "x\u0327y\u0301")
    val df = rows.toDF("s")
    val viaExpr = df.select(TextNormExpressions.nfc_normalize(col("s")))
      .collect().map(_.getString(0))
    val expected = rows.map(java.text.Normalizer.normalize(_,
      java.text.Normalizer.Form.NFC))
    assert(viaExpr.toSeq === expected)
  }
}
