package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** e16: per-user activity streaks (gaps-and-islands on the date axis). */
class StreaksSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  test("e16: islands split on gaps; multiple same-day events collapse") {
    // user 1: days 1,2,3 then 5,6 -> streaks 3 and 2; user 2: one day,
    // twice (must count once); a null-user row is ignored
    val ev = Seq(
      (Option(1L), "2024-03-01 10:00:00"), (Option(1L), "2024-03-02 09:00:00"),
      (Option(1L), "2024-03-03 23:59:59"), (Option(1L), "2024-03-05 00:00:00"),
      (Option(1L), "2024-03-06 12:00:00"),
      (Option(2L), "2024-03-10 01:00:00"), (Option(2L), "2024-03-10 02:00:00"),
      (Option.empty[Long], "2024-03-01 00:00:00")
    ).map { case (u, t) => (u, Timestamp.valueOf(t), "click", 0L, "{}", 1L) }
      .toDF("user_id", "ts", "event_type", "value", "props", "event_id")
    val dir = Files.createTempDirectory("graft-streaks-").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventsQueries.queries("e16_activity_streaks")(spark, dir)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === Map(
      1L -> (5L, 3L, 2L),
      2L -> (1L, 1L, 1L)))
  }
}
