package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: latest right at-or-before each left; nulls when none; equal-time matches") {
    val clicks = Seq(
      (1L, 7L, ts("2024-01-01 00:05:00")),  // after p10
      (2L, 7L, ts("2024-01-01 00:20:00")),  // after p11 (latest of p10,p11)
      (3L, 7L, ts("2024-01-01 00:10:00")),  // exactly at p11 → <= matches
      (4L, 8L, ts("2024-01-01 00:01:00")))  // user with no purchases
      .toDF("event_id", "user_id", "ts")
    val purch = Seq(
      (10L, 7L, ts("2024-01-01 00:00:00")),
      (11L, 7L, ts("2024-01-01 00:10:00")))
      .toDF("p_id", "user_id", "p_ts")
    val out = TemporalJoins.asOfJoin(clicks, "ts", purch, "p_ts", Seq("user_id"))
      .select("event_id", "p_id").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(1L -> Some(10L), 2L -> Some(11L), 3L -> Some(11L), 4L -> None))
  }

  test("rangeJoinBinned matches the naive inequality join, including cross-bin pairs") {
    val a = (0 until 50).map(i => (i.toLong, i.toLong % 3, ts(f"2024-01-01 00:${i % 60}%02d:00")))
      .toDF("a_id", "user_id", "a_ts")
    val b = (100 until 150).map(i => (i.toLong, i.toLong % 3, ts(f"2024-01-01 00:${(i * 7) % 60}%02d:30")))
      .toDF("b_id", "user_id", "b_ts")
    val win = 600000000L // 10 min
    val binned = TemporalJoins.rangeJoinBinned(a, b, Seq("user_id"), "a_ts", "b_ts", win)
      .select("a_id", "b_id")
    val naive = a.join(b, Seq("user_id"))
      .filter(org.apache.spark.sql.functions.unix_micros($"b_ts") > org.apache.spark.sql.functions.unix_micros($"a_ts")
        && org.apache.spark.sql.functions.unix_micros($"b_ts") <= org.apache.spark.sql.functions.unix_micros($"a_ts") + win)
      .select("a_id", "b_id")
    assert(binned.count() === naive.count())
    assert(binned.except(naive).count() === 0)
    assert(naive.except(binned).count() === 0)
  }

  test("rangeJoinBinned bins pre-1970 timestamps consistently (floor, not truncate)") {
    // negative micros: double-divide truncation toward zero would misalign
    // left/right bins across the epoch boundary and drop valid pairs
    val a = Seq(
      (1L, 1L, ts("1969-12-31 23:55:00")),   // pair spans the epoch
      (2L, 1L, ts("1969-12-31 23:40:00")))
      .toDF("a_id", "user_id", "a_ts")
    val b = Seq(
      (10L, 1L, ts("1970-01-01 00:03:00")),  // 8 min after a_id=1
      (11L, 1L, ts("1969-12-31 23:49:00")))  // 9 min after a_id=2
      .toDF("b_id", "user_id", "b_ts")
    val win = 600000000L // 10 min
    val out = TemporalJoins.rangeJoinBinned(a, b, Seq("user_id"), "a_ts", "b_ts", win)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 11L)))
  }
}
