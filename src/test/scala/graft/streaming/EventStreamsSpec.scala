package graft.streaming
// (retention cohort test appended at the bottom of the spec)

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("events fixture loads with microsecond timestamps (nanos handled)") {
    val ev = load("events")
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    assert(ev.count() > 0)
  }

  test("tumbling windows partition all events exactly once") {
    val ev = load("events")
    val w = EventStreams.tumbling(ev)
    assert(w.agg(sum("n_events")).as[Long].head() == ev.count())
  }

  test("session windows close after the gap") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 1.0), (1L, ts(20), 1.0), // session 1
      (1L, ts(60), 1.0), // session 2 (40 min gap)
      (2L, ts(0), 1.0)) // other user
      .toDF("user_id", "ts", "value")
    val s = EventStreams.sessions(ev, "30 minutes").orderBy("user_id", "session_start").collect()
    assert(s.length == 3)
    assert(s(0).getAs[Long]("n_events") == 3)
    assert(s(1).getAs[Long]("n_events") == 1)
    assert(s(2).getAs[Long]("n_events") == 1)
  }

  test("funnel: stages count users in strict event order") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      // user 2: click BEFORE the first view — stalls at view
      (2L, ts(5), "click"), (2L, ts(8), "view"),
      // user 3: purchase skips click — reaches click stage never
      (3L, ts(0), "view"), (3L, ts(2), "purchase"),
      // user 4: click at the SAME instant as view — strict > excludes it
      (4L, ts(0), "view"), (4L, ts(0), "click"),
      // user 5: never views
      (5L, ts(1), "click"), (5L, ts(2), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventStreams.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 4L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("stateful running totals (flatMapGroupsWithState) match batch aggregation") {
    val streamed = EventStreams.runToMemorySink(
      EventStreams.runningUserTotals(spark, sf, idleTimeout = None), "stateful_totals")
    // one microbatch → one emitted row per user, equal to the batch agg
    val batch = load("events").groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("value").as("sum_value"))
    assert(streamed.count() == batch.count())
    val s = streamed.orderBy("user_id").collect()
    val b = batch.orderBy("user_id").collect()
    s.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getLong(1) == y.getLong(1))
      assert(math.abs(x.getDouble(2) - y.getDouble(2)) < 1e-6)
    }
  }

  test("asofJoin picks the latest right event at or before each left event") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      (1L, 100L, "signup", ts(0)),
      (1L, 101L, "error", ts(5)), // → 100
      (1L, 102L, "signup", ts(10)),
      (1L, 103L, "error", ts(10)), // same minute: signup sorts first → 102
      (2L, 200L, "error", ts(1))) // no signup → -1
      .toDF("user_id", "event_id", "event_type", "ts")
    val r = EventStreams.asofJoin(ev, "error", "signup")
      .orderBy("left_id").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq ==
      Seq((101L, 100L), (103L, 102L), (200L, -1L)))
  }

  test("stream-stream interval join matches the batch interval join") {
    val batch = EventStreams.intervalJoin(load("events"), "click", "purchase")
    val streamed = EventStreams.runToMemorySink(
      EventStreams.streamingIntervalJoin(spark, sf, "click", "purchase"),
      "stream_ij")
    // inner stream-stream join emits matched pairs; with one microbatch
    // covering all data, results equal the batch join
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty)
  }

  test("streamingDedup (dropDuplicatesWithinWatermark) keeps one event per key; " +
    "batch dedupEvents keeps the earliest") {
    val batch = EventStreams.dedupEvents(load("events"), Seq("user_id", "event_type"))
    // exactly one survivor per (user, type)
    val keyCounts = batch.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(keyCounts == 0)
    // survivor is the earliest: its ts equals the per-key min
    val mins = load("events").groupBy("user_id", "event_type")
      .agg(min("ts").as("min_ts"))
    val bad = batch.join(mins, Seq("user_id", "event_type"))
      .filter(col("ts") =!= col("min_ts")).count()
    assert(bad == 0)
    // streaming form: one row per key too (one microbatch covers all
    // data, so within-watermark dedup sees every duplicate)
    val streamed = EventStreams.runToMemorySink(
      EventStreams.streamingDedup(spark, sf, Seq("user_id", "event_type")),
      "stream_dedup")
    assert(streamed.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
    assert(streamed.count() == batch.count())
  }

  test("stream-static enrich decorates every event, matching the batch join") {
    val ev = load("events")
    val dim = ev.select($"event_type").distinct()
      .withColumn("category", upper($"event_type"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = EventStreams.withEventTime(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf))
    val streamed = EventStreams.runToMemorySink(
      EventStreams.enrich(stream, dim, Seq("event_type")), "stream_enrich")
      .select("event_type", "category", "user_id", "ts")
    val batch = EventStreams.enrich(ev, dim, Seq("event_type"))
      .select("event_type", "category", "user_id", "ts")
    assert(streamed.count() == ev.count()) // left_outer: nothing dropped
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming session windows emit watermark-closed sessions matching batch") {
    val batch = EventStreams.sessions(load("events"))
      .select("user_id", "session_start", "n_events", "sum_value")
    val streamed = EventStreams.runToMemorySink(
      EventStreams.streamingSessions(spark, sf), "stream_sessions")
      .select("user_id", "session_start", "n_events", "sum_value")
    // append mode emits only sessions closed by the watermark: all
    // emitted rows must match batch; anything withheld must still be
    // open at end-of-stream (session start past maxTs - gap - lateness)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty)
    val maxTs = load("events").agg(max("ts")).head().getTimestamp(0).getTime
    val missing = batch.exceptAll(streamed).collect()
    assert(missing.forall(_.getTimestamp(1).getTime >= maxTs - 40 * 60 * 1000))
  }

  test("streaming tumbling (AvailableNow + memory sink) matches batch result") {
    val batch = EventStreams.tumbling(load("events"))
      .select("win_start", "event_type", "n_events")
    val streamed = EventStreams.runToMemorySink(
      EventStreams.streamingTumbling(spark, sf), "stream_tumbling")
    // append mode emits only watermark-closed windows: everything emitted
    // must match batch, and anything withheld must be a still-open window
    // (win_start past maxTs - width - lateness)
    assert(streamed.exceptAll(batch).isEmpty)
    val maxTs = load("events").agg(max("ts")).head().getTimestamp(0).getTime
    val missing = batch.exceptAll(streamed).collect()
    assert(missing.forall(_.getTimestamp(0).getTime >= maxTs - 20 * 60 * 1000))
  }

  test("windowZscore: z-scores have zero mean per type and match a direct computation") {
    val ev = load("events")
    val z = EventStreams.windowZscore(ev)
      .select("event_type", "n_events", "zscore")
      .as[(String, Long, Double)].collect()
    assert(z.nonEmpty)
    // per type: mean of z ≈ 0, population variance of z ≈ 1 (or all-0 when flat)
    z.groupBy(_._1).foreach { case (_, rows) =>
      val zs = rows.map(_._3)
      assert(math.abs(zs.sum / zs.length) < 1e-9)
      val varZ = zs.map(v => v * v).sum / zs.length
      assert(math.abs(varZ - 1.0) < 1e-9 || zs.forall(_ == 0.0))
    }
    // direct recomputation for one type
    val (ty, rows) = z.groupBy(_._1).head
    val cs = rows.map(_._2.toDouble)
    val mean = cs.sum / cs.length
    val v = cs.map(c => c * c).sum / cs.length - mean * mean
    rows.foreach { case (_, c, zz) =>
      val expect = if (v > 0) (c - mean) / math.sqrt(v) else 0.0
      assert(math.abs(zz - expect) < 1e-9, s"type $ty count $c")
    }
  }

  test("windowZscore minAbsZ keeps only anomalous windows") {
    val ev = load("events")
    val all = EventStreams.windowZscore(ev)
    val flagged = EventStreams.windowZscore(ev, minAbsZ = 1.5)
    assert(flagged.count() == all.filter(abs(col("zscore")) >= 1.5).count())
  }

  test("streamingZscore scores watermark-closed windows exactly like batch") {
    val ev = load("events")
    val moments = EventStreams.zscoreMoments(
      ev.groupBy(window($"ts", "10 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n_events"))
        .select($"w.start".as("win_start"), $"event_type", $"n_events"))
    val streamed = EventStreams.runToMemorySink(
      EventStreams.streamingZscore(spark, sf, moments), "stream_zscore")
      .select("win_start", "event_type", "n_events", "zscore")
    val batch = EventStreams.windowZscore(ev)
      .select("win_start", "event_type", "n_events", "zscore")
    // append mode: emitted = watermark-closed subset, values identical
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty)
    val maxTs = ev.agg(max("ts")).head().getTimestamp(0).getTime
    val missing = batch.exceptAll(streamed).collect()
    assert(missing.forall(_.getTimestamp(0).getTime >= maxTs - 20 * 60 * 1000))
  }

  test("rfmSegments: three separable users land in their terciles; users conserved") {
    def ts(day: Int) = new Timestamp(1700006400000L + day * 86400000L)
    val ev = Seq(
      (1L, ts(9), 50.0), (1L, ts(9), 50.0), (1L, ts(8), 50.0), // u1: recent, busy, rich
      (2L, ts(5), 10.0), (2L, ts(4), 10.0),                    // u2: middle
      (3L, ts(0), 1.0))                                        // u3: stale, light
      .toDF("user_id", "ts", "value")
    val got = EventStreams.rfmSegments(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got.values.sum == 3L)
    // n=3: terciles are the 1st and 2nd order statistics, so each user
    // is its own bucket per dimension. u1: recency 0 (bucket 0, most
    // recent), frequency 3 (bucket 2), monetary 150 (bucket 2)
    assert(got((0L, 2L, 2L)) == 1L)
    assert(got((1L, 1L, 1L)) == 1L) // u2 middle everywhere
    assert(got((2L, 0L, 0L)) == 1L) // u3 stale, light, cheap
  }

  test("retentionCohorts: offsets from first-activity day; offset 0 = cohort size") {
    // base at midnight UTC (1700006400 = 2023-11-15 00:00:00Z) so the
    // hour offsets stay inside their intended day
    def ts(day: Int, hour: Int) =
      new Timestamp(1700006400000L + (day * 24L + hour) * 3600000L)
    val ev = Seq(
      (1L, ts(0, 1), 1.0), (1L, ts(0, 5), 1.0), // u1 day0 twice (counts once)
      (1L, ts(2, 1), 1.0),                      // u1 returns day2
      (2L, ts(0, 3), 1.0),                      // u2 day0 only
      (3L, ts(1, 2), 1.0), (3L, ts(2, 2), 1.0)) // u3 cohort day1, returns day2
      .toDF("user_id", "ts", "value")
    val rows = EventStreams.retentionCohorts(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val cohorts = rows.keys.map(_._1).toSeq.distinct.sorted
    assert(cohorts.size == 2)
    val (d0, d1) = (cohorts(0), cohorts(1))
    assert(rows((d0, 0L)) == 2L) // u1 + u2
    assert(rows((d0, 2L)) == 1L) // u1 back on day 2
    assert(rows((d1, 0L)) == 1L && rows((d1, 1L)) == 1L) // u3
    assert(rows.values.sum == 5L) // one row per distinct (user, day)
  }

  test("withEventTime refuses the NTZ cast in a non-UTC session instead of " +
    "silently shifting event times") {
    val ntz = spark.sql("SELECT TIMESTAMP_NTZ'2020-01-01 12:00:00' AS ts")
    // UTC session (every session in this repo): cast proceeds
    assert(EventStreams.withEventTime(ntz).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val orig = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException] {
        EventStreams.withEventTime(ntz)
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", orig)
  }
}
