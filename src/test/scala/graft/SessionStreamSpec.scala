package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SessionStream
import graft.streaming.SessionStream.{ClosedSession, Event}

/** Stateful streaming sessionization (flatMapGroupsWithState):
  * sessions close on gap or event-time timeout; results match the
  * batch operator's grouping.
  */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions close on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = SessionStream.sessionize(input.toDS(), gapMinutes = 60)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()

    // user 1: two events 30m apart (one session), then one 2h later
    input.addData(
      Event(1L, ts("2024-01-01 10:00:00"), 1.0),
      Event(1L, ts("2024-01-01 10:30:00"), 2.0))
    q.processAllAvailable()
    input.addData(Event(1L, ts("2024-01-01 12:30:00"), 5.0)) // gap > 60m
    q.processAllAvailable()
    // first session emitted by the gap path
    val afterGap = spark.table("sessions_out").as[ClosedSession].collect()
    assert(afterGap.length == 1)
    assert(afterGap(0).n_events == 2 && afterGap(0).total == 3.0)
    assert(afterGap(0).start == ts("2024-01-01 10:00:00"))
    assert(afterGap(0).end == ts("2024-01-01 10:30:00"))

    // advance the watermark far past 12:30 + 60m via another user
    input.addData(Event(2L, ts("2024-01-01 16:00:00"), 9.0))
    q.processAllAvailable()
    input.addData(Event(2L, ts("2024-01-01 16:01:00"), 1.0))
    q.processAllAvailable()
    val afterTimeout = spark.table("sessions_out").as[ClosedSession].collect()
    // user 1's 12:30 session must have closed via EventTimeTimeout
    val u1 = afterTimeout.filter(s => s.user_id == 1L && s.n_events == 1)
    assert(u1.length == 1, afterTimeout.mkString(", "))
    assert(u1(0).total == 5.0)
    q.stop()
  }
}
