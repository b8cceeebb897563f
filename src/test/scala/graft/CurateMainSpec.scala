package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** CurateMain end-to-end: JSONL in (with a corrupt line and a planted
  * exact duplicate), shards + manifest + quarantine out.
  */
class CurateMainSpec extends AnyFunSuite with SparkSpec {

  test("curates a JSONL corpus end to end: quarantine, dedup, shards, manifest") {
    val dir = Files.createTempDirectory("graft_curate_cli").toString
    // texts must PASS TextAnalysis.qualityRules or stage 4 empties the
    // output (first draft used 3-char tokens — mean word length 3.2 sat
    // below the [4.3, 4.7] band and every doc died): 7 stopwords + 25
    // five-char tokens gives 32 words, mean len 4.375, stop ratio 22%
    val good = (1 to 40).map { i =>
      val words = Seq.tabulate(25)(j => s"w${(i * 5 + j * 3) % 9}xyz").mkString(" ")
      s"""{"doc_id": $i, "text": "the and is to of a in $words", "source": "s${i % 2}"}"""
    }
    // doc 41 duplicates doc 1's text exactly (stage 1 must collapse);
    // last line is corrupt JSON (must quarantine, not crash or drop)
    val dup = good.head.replace("\"doc_id\": 1", "\"doc_id\": 41")
    Files.createDirectories(Paths.get(s"$dir/in"))
    Files.writeString(Paths.get(s"$dir/in/part0.jsonl"),
      (good :+ dup :+ """{"doc_id": broken""").mkString("\n"))

    CurateMain.run(spark, s"$dir/in", s"$dir/out", "jsonl",
      benchmarkPath = None, tau = 0.5, budget = 256L,
      idCol = "doc_id", textCol = "text", sourceCol = "source")

    val shards = spark.read.parquet(s"$dir/out/shards")
    // the exact duplicate is gone; every surviving doc is one of the inputs
    assert(shards.count() <= 40)
    assert(shards.select("doc_id").distinct().count() === shards.count())
    assert(!shards.select("doc_id").collect().map(_.getLong(0)).contains(41L))
    // partitioned layout: split=... directories exist
    assert(Files.list(Paths.get(s"$dir/out/shards")).toArray
      .exists(_.toString.contains("split=")))
    val manifest = spark.read.parquet(s"$dir/out/manifest")
    assert(manifest.columns.toSet ===
      Set("split", "source", "shard", "n_docs", "shard_tokens", "min_doc_id"))
    // manifest totals match the shard rows
    val mDocs = manifest.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head().getLong(0)
    assert(mDocs === shards.count())
    // the corrupt line landed in the corpus quarantine
    val q = spark.read.text(s"$dir/out/_quarantine/corpus")
    assert(q.count() === 1)
  }

  test("benchmark quarantine does not clobber the corpus quarantine") {
    val dir = Files.createTempDirectory("graft_curate_bench").toString
    val good = (1 to 40).map { i =>
      val words = Seq.tabulate(25)(j => s"w${(i * 5 + j * 3) % 9}xyz").mkString(" ")
      s"""{"doc_id": $i, "text": "the and is to of a in $words", "source": "s${i % 2}"}"""
    }
    Files.createDirectories(Paths.get(s"$dir/in"))
    Files.writeString(Paths.get(s"$dir/in/part0.jsonl"),
      (good :+ """{"doc_id": broken corpus line""").mkString("\n"))
    // a benchmark with its OWN corrupt line — before the per-role split
    // this overwrite erased the corpus's quarantine record entirely
    Files.createDirectories(Paths.get(s"$dir/bench"))
    Files.writeString(Paths.get(s"$dir/bench/part0.jsonl"),
      Seq("""{"doc_id": 9001, "text": "benchmark probe text", "source": "b"}""",
        """{"doc_id": broken bench line""").mkString("\n"))

    CurateMain.run(spark, s"$dir/in", s"$dir/out", "jsonl",
      benchmarkPath = Some(s"$dir/bench"), tau = 0.5, budget = 256L,
      idCol = "doc_id", textCol = "text", sourceCol = "source")

    // BOTH quarantines survive, each with its own corrupt line
    assert(spark.read.text(s"$dir/out/_quarantine/corpus").count() === 1)
    assert(spark.read.text(s"$dir/out/_quarantine/benchmark").count() === 1)
  }

  test("parquet corpus: null id/text rows are filtered before the pipeline") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = Files.createTempDirectory("graft_curate_pq").toString
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType).add("source", StringType)
    val rows = (1 to 40).map { i =>
      val words = Seq.tabulate(25)(j => s"w${(i * 5 + j * 3) % 9}xyz").mkString(" ")
      Row(i.toLong, s"the and is to of a in $words", s"s${i % 2}")
    } ++ Seq(Row(null, "the and is to of a null id row", "s0"),
      Row(99L, null, "s1"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$dir/in")

    CurateMain.run(spark, s"$dir/in", s"$dir/out", "parquet",
      benchmarkPath = None, tau = 0.5, budget = 256L,
      idCol = "doc_id", textCol = "text", sourceCol = "source")

    val shards = spark.read.parquet(s"$dir/out/shards")
    // the null rows never entered the pipeline: no null ids, no doc 99
    val ids = shards.select("doc_id").collect().map(_.getLong(0))
    assert(!ids.contains(99L))
    assert(shards.where(org.apache.spark.sql.functions.col("doc_id").isNull)
      .count() === 0)
  }
}
