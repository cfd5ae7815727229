package graft

import org.apache.spark.sql.functions._

import graft.operators.TimesAggregator
import graft.operators.TimesAggregator.SinkEvent

/** Typed Aggregator (§2.10 UDAF): the Times session roll-up as a
  * grouped aggregate with a mergeable buffer, against the golden
  * duration values (ingestor.spec.js:355–358). */
class TimesAggregatorSpec extends SparkSuite {

  test("grouped Times aggregation yields the reference's golden durations") {
    import spark.implicits._
    val t0 = 1538050000L
    val events = Seq(
      // ingest A: neo4j 2h15m, elastic 1h05m, total 2h29m (elastic
      // starts later, per the golden fixture shape)
      ("A", SinkEvent("neo4j", "start", t0)),
      ("A", SinkEvent("neo4j", "end", t0 + 8100)),
      ("A", SinkEvent("elastic", "start", t0 + 5040)),
      ("A", SinkEvent("elastic", "end", t0 + 8940)),
      // ingest B: elastic never finished
      ("B", SinkEvent("neo4j", "start", t0)),
      ("B", SinkEvent("neo4j", "end", t0 + 600)),
      ("B", SinkEvent("elastic", "start", t0 + 600))
    ).toDF("ingest", "event")
      .select(col("ingest"), col("event.*"))
      .as[(String, String, String, Long)]
      .map { case (i, s, p, e) => (i, SinkEvent(s, p, e)) }

    val agg = TimesAggregator.aggregator.toColumn
    val result = events
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("times"))
      .collect()
      .toMap

    val a = result("A")
    assert(a.neo_job_duration == "2h:15mins")
    assert(a.elastic_job_duration == "1h:05mins")
    assert(a.total_job_duration == "2h:29mins")
    assert(a.complete)

    val b = result("B")
    assert(b.neo_job_duration == "0h:10mins")
    assert(b.elastic_job_duration == "timestamp error")
    assert(b.total_job_duration == "timestamp error")
    assert(!b.complete)
  }

  test("buffer merge is order-independent (partial aggregation safe)") {
    import TimesAggregator._
    val agg = TimesAggregator.aggregator
    val events = Seq(
      SinkEvent("neo4j", "start", 100L), SinkEvent("neo4j", "end", 200L),
      SinkEvent("elastic", "start", 150L), SinkEvent("elastic", "end", 300L))
    // reduce sequentially vs merge of per-event partials, in every order
    val direct = events.foldLeft(agg.zero)(agg.reduce)
    events.permutations.take(12).foreach { perm =>
      val partials = perm.map(e => agg.reduce(agg.zero, e))
      val merged = partials.reduce(agg.merge)
      assert(agg.finish(merged) == agg.finish(direct), s"order $perm differs")
    }
  }
}
