package graft.etl

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class FileLifecycleSpec extends AnyFunSuite with SparkSpec {

  test("archive moves and overwrites; quarantine timestamps collisions") {
    val src = Files.createTempDirectory("graft_files")
    val archive = src.resolve("archive").toString
    val errors = src.resolve("errors").toString

    val f1 = src.resolve("a.xml"); Files.writeString(f1, "one")
    val moved = FileLifecycle.archive(spark, f1.toString, archive)
    assert(Files.exists(Paths.get(archive, "a.xml")))
    assert(!Files.exists(f1))

    // archiving a same-named file overwrites (reference warns+overwrites)
    val f2 = src.resolve("a.xml"); Files.writeString(f2, "two")
    FileLifecycle.archive(spark, f2.toString, archive)
    assert(Files.readString(Paths.get(archive, "a.xml")) == "two")

    // quarantine: collision gets a timestamp suffix, both kept
    val b1 = src.resolve("b.xml"); Files.writeString(b1, "x")
    FileLifecycle.quarantine(spark, b1.toString, errors, nowMillis = 111)
    val b2 = src.resolve("b.xml"); Files.writeString(b2, "y")
    val q2 = FileLifecycle.quarantine(spark, b2.toString, errors, nowMillis = 222)
    assert(Files.exists(Paths.get(errors, "b.xml")))
    assert(q2.endsWith("b_222.xml"))
    assert(Files.exists(Paths.get(errors, "b_222.xml")))
  }

  test("dictionary full refresh overwrites prior content") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_dict_out").resolve("defs").toString
    graft.sources.DictionaryLoader.fullRefresh(Seq(("a", "1")).toDF("k", "v"), out)
    graft.sources.DictionaryLoader.fullRefresh(Seq(("b", "2"), ("c", "3")).toDF("k", "v"), out)
    val rows = spark.read.parquet(out).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("b", "2"), ("c", "3")))
  }
}
