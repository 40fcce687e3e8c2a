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

  test("sessionStatsSkewAware == sessionStats row-for-row on a randomized " +
       "corpus (boundary sessions merge exactly)") {
    val rnd = new scala.util.Random(99)
    // random walks with gaps straddling the 30-min rule AND the 6-hour
    // bucket width: plenty of sessions severed mid-bucket, at boundaries,
    // and spanning several buckets (continuous sub-30-min steps)
    val rows = (0 until 12).flatMap { u =>
      var t = rnd.nextInt(100000).toLong
      (0 until 400).map { i =>
        t += (rnd.nextInt(4) match {
          case 0 => rnd.nextInt(1700) + 1          // same session
          case 1 => 1800                            // exactly the gap: same
          case 2 => 1801 + rnd.nextInt(3600)        // new session
          case 3 => 20000 + rnd.nextInt(30000)      // multi-bucket jumps
        }).toLong
        ((u * 1000 + i).toLong, u.toLong, ts(t))
      }
    }
    val events = rows.toDF("event_id", "user_id", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_idx", "n_events", "start_us", "end_us",
        "duration_us").orderBy("user_id", "session_idx")
        .collect().map(_.toSeq).toSeq
    // a small bucket (15 min < the 30-min gap) severs aggressively — the
    // merge must still reproduce the plain output exactly
    for (bucketUs <- Seq(900L * 1000000L, 3600L * 1000000L, 6L * 3600L * 1000000L)) {
      val skew = canon(Sessionize.sessionStatsSkewAware(events, bucketUs = bucketUs))
      val plain = canon(Sessionize.sessionStats(events))
      assert(skew === plain, s"bucketUs=$bucketUs diverged")
    }
  }

  test("sessionStatsSkewAware: one dominant user fans out across partitions " +
       "instead of serializing one task") {
    // 50k events of ONE user in a tight stream (plus two bystanders):
    // sessionStats would put all 50k in a single window partition;
    // the skew-aware stage-1 key (user, bucket) must spread them
    val hot = (0 until 50000).map(i => (i.toLong, 1L, ts(i.toLong * 700)))
    val cold = Seq((100001L, 2L, ts(3)), (100002L, 3L, ts(9)))
    val events = (hot ++ cold).toDF("event_id", "user_id", "ts")
    val bucketUs = 3600L * 1000000L
    // histogram of the exact stage-1 shuffle key, at the spec's partition
    // count: the hot user's rows land in many partitions, none dominant
    val nPart = 32
    val hist = events
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("bucket", expr(s"ts_us DIV ${bucketUs}L"))
      .repartition(nPart, col("user_id"), col("bucket"))
      .mapPartitions(it => Iterator.single(it.length))
      .collect()
    assert(hist.sum === 50002)
    assert(hist.max < 50002 / 4,
      s"hot user still serialized: max partition ${hist.max} of ${hist.sum}")
    // and the equivalence holds on the skewed corpus too
    val skew = Sessionize.sessionStatsSkewAware(events, bucketUs = bucketUs)
      .orderBy("user_id", "session_idx").collect().map(_.toSeq).toSeq
    val plain = Sessionize.sessionStats(events)
      .orderBy("user_id", "session_idx").collect().map(_.toSeq).toSeq
    assert(skew === plain)
  }
}
