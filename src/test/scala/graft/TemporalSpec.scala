package graft

import org.apache.spark.sql.functions._
import graft.operators.{PipelineQueries, Temporal}

/** Value oracles for the temporal operators: as-of join and batch
  * sessionization must equal in-test brute-force computations over the
  * real events table (the driver additionally hash-checks both against
  * genuine DuckDB ASOF JOIN / window SQL). */
class TemporalSpec extends SparkSpecBase {
  import spark.implicits._

  private case class Ev(id: Long, user: Long, ts: Long, typ: String, value: Double)

  private lazy val events: Seq[Ev] =
    Tables.eventsWithTs(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_ns"), col("event_type"), col("value"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq

  test("eventsAsof equals brute-force latest-error-at-or-before per user") {
    val errorsByUser = events.filter(_.typ == "error").groupBy(_.user)
    val expected = events.filter(_.typ == "click").map { c =>
      val best = errorsByUser.getOrElse(c.user, Seq.empty)
        .filter(_.ts <= c.ts)
        .sortBy(_.ts).lastOption
      c.id -> best.map(e => (e.ts / 1000, BigDecimal(e.value).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = PipelineQueries.eventsAsof(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some((r.getLong(2), r.getDouble(3)))))
      .toMap
    assert(got.size == expected.size)
    for ((id, want) <- expected)
      assert(got(id) == want, s"click $id: got ${got(id)}, want $want")
  }

  test("asofJoin emits nulls when no right row precedes, and sees same-time rows") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 99L, 500L)).toDF("id", "k", "t")
    val right = Seq((10L, 100L, 7.0), (10L, 60L, 5.0)).toDF("k", "rt", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4))))).toMap
    assert(out(1L).contains((100L, 7.0)), "right row AT the left time is visible (<=)")
    assert(out(2L).isEmpty, "no right row at or before t=50")
    assert(out(3L).isEmpty, "unseen key joins to nothing")
  }

  test("asofJoin carries a null-payload right row atomically (no field mixing)") {
    // errors at t=1 (value 5.0) and t=2 (value NULL); a click at t=3 must
    // pair asof_time=2 with a NULL value — not t=2 with the t=1 payload.
    val left = Seq((1L, 10L, 3L)).toDF("id", "k", "t")
    val right = Seq((10L, 1L, Option(5.0)), (10L, 2L, Option.empty[Double]))
      .toDF("k", "rt", "v")
    val row = Temporal.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().head
    assert(row.getLong(3) == 2L, "latest right row wins")
    assert(row.isNullAt(4), "its NULL payload is carried, not an older value")
  }

  test("asofJoin equal-time right rows resolve deterministically across partitionings") {
    val left = Seq((1L, 10L, 5L)).toDF("id", "k", "t")
    val right = Seq((10L, 2L, 1.0), (10L, 2L, 9.0), (10L, 2L, 4.0)).toDF("k", "rt", "v")
    def run(r: org.apache.spark.sql.DataFrame) =
      Temporal.asofJoin(left, r, Seq("k"), "t", "rt", Seq("v"))
        .collect().head match { case row => (row.getLong(3), row.getDouble(4)) }
    val base = run(right)
    assert(base == (2L, 9.0), "tie-break = max right-row struct")
    assert(run(right.repartition(7)) == base)
    assert(run(right.orderBy(col("v").desc)) == base)
  }

  test("eventsSessions equals brute-force gap-split sessionization") {
    val gap = 30L * 60L * 1000000000L
    val expected = events.groupBy(_.user).flatMap { case (user, evs) =>
      val sorted = evs.sortBy(e => (e.ts, e.id))
      var idx = 0L
      var prev = Long.MinValue
      val sessions = scala.collection.mutable.Map.empty[Long, Vector[Ev]]
      sorted.foreach { e =>
        if (prev == Long.MinValue || e.ts - prev > gap) idx += 1
        sessions(idx) = sessions.getOrElse(idx, Vector.empty) :+ e
        prev = e.ts
      }
      sessions.map { case (i, ss) =>
        (user, i) -> (ss.size.toLong, ss.map(_.ts).min / 1000, ss.map(_.ts).max / 1000,
          BigDecimal(ss.map(_.value).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val got = PipelineQueries.eventsSessions(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got.size == expected.size, s"${got.size} sessions vs ${expected.size}")
    for ((k, want) <- expected)
      assert(got(k) == want, s"session $k: got ${got(k)}, want $want")
  }

  test("q21PercentilesApprox (the sketch operator) lands within tolerance of exact") {
    val exact = graft.operators.Relational.q21Percentiles(spark, sfDir)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = graft.operators.Relational.q21PercentilesApprox(spark, sfDir)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(exact.keySet == approx.keySet)
    for ((t, ex) <- exact; (e, a) <- ex.zip(approx(t)))
      assert(math.abs(e - a) <= 0.25, s"$t: exact $e vs approx $a")
  }
}
