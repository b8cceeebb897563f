package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.functions.GraftExtensions` install
  * path: drive the injected function builders through a real
  * FunctionRegistry (the exact call `BaseSessionStateBuilder` makes at
  * session build) WITHOUT tearing down the suite-shared session. Pins
  * the drift that motivated it: every native function the per-session
  * `register()` helpers expose must also ship via the extensions class.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects every native function, with working builders") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
    val reg = FunctionRegistry.builtin.clone()
    org.apache.spark.sql.GraftExtensionsBridge.registerInto(e, reg)
    // expectations DERIVED from the shared injectable tables (the same
    // source register() and GraftExtensions consume) — a function added
    // to any table is pinned here with no test edit
    val expected = GraftFunctions.all.map(_._1)
    assert(expected.size >= 7 && expected.distinct.size == expected.size)
    expected.foreach { name =>
      assert(reg.functionExists(FunctionIdentifier(name)), s"$name not injected")
    }
    // builders construct real expressions (not just names): spot-build
    // the two aggregates whose int arg goes through eval()
    val bkh = reg.lookupFunction(FunctionIdentifier("bottom_k_hashes"),
      Seq(Literal(1L), Literal(8)))
    assert(bkh.isInstanceOf[BottomKHashes] &&
      bkh.asInstanceOf[BottomKHashes].k == 8)
    val bkm = reg.lookupFunction(FunctionIdentifier("bottom_k_merge"),
      Seq(Literal.create(Seq(1L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)), Literal(8)))
    assert(bkm.isInstanceOf[BottomKMerge] &&
      bkm.asInstanceOf[BottomKMerge].k == 8)
  }
}
