package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SessionizeSpec extends AnyFunSuite {

  private implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sessionize")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("assign: 30-min gap splits sessions, numbered from 1 in time order") {
    val events = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(60)),          // session 1
      (3L, 10L, ts(60 + 1801)),                      // gap 1801s > 1800 -> session 2
      (4L, 10L, ts(60 + 1801 + 1800)),               // gap exactly 1800 -> same session
      (5L, 20L, ts(5))                               // other user -> own session 1
    ).toDF("event_id", "user_id", "ts")
    val out = Sessionize.assign(events).orderBy("event_id").collect()
    val byId = out.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionStats: counts and integer-microsecond durations per session") {
    val events = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(100)), (3L, 10L, ts(10000)),
      (4L, 20L, ts(7))
    ).toDF("event_id", "user_id", "ts")
    val out = Sessionize.sessionStats(events)
      .orderBy("user_id", "session_idx").collect()
    assert(out.length === 3)
    val s1 = out(0) // user 10 session 1: events 1,2
    assert(s1.getLong(2) === 2L && s1.getLong(5) === 100L * 1000000L)
    val s2 = out(1) // user 10 session 2: event 3 alone
    assert(s2.getLong(2) === 1L && s2.getLong(5) === 0L)
    val s3 = out(2) // user 20
    assert(s3.getLong(1) === 1L && s3.getLong(2) === 1L)
  }

  test("sessionStats: exactly one exchange (window partitioning reused by the rollup)") {
    val events = Seq((1L, 10L, ts(0)), (2L, 10L, ts(1)))
      .toDF("event_id", "user_id", "ts")
    val plan = Sessionize.sessionStats(events).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n$plan")
  }
}
