package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  test("windowed counts over a file-driven stream match batch") {
    val schema = spark.read.parquet(s"$sfSmoke/events.parquet").schema
    // file source needs a directory: stage the single-file table
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfSmoke/events.parquet"),
      dir.resolve("events.parquet"))
    val evStream = spark.readStream.schema(schema).parquet(dir.toString)
    val agg = StreamOps.windowedCounts(evStream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT event_type, sum(n) FROM win_out GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(s"$sfSmoke/events.parquet")
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("stateful sessionization matches the batch window query") {
    import spark.implicits._
    val evs = spark.read.parquet(s"$sfSmoke/events.parquet")
      .select(col("user_id"),
        col("ts").cast("timestamp").cast("double").as("tsec"), col("event_id"))
      .as[StreamOps.Ev]
    // batch ground truth: session count per user (sessions CLOSED by a
    // following gap; the open last session is retained in state)
    val batch = SparkEntry.queries("q_sessionize")(spark, sfSmoke)
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = StreamOps.sessionize(evs).collect()
      .groupBy(_.user_id).map { case (u, ss) => u -> ss.length.toLong }
    // streamed emits only closed sessions: batch count - 1 per user
    streamed.foreach { case (u, n) => assert(n == batch(u) - 1, s"user $u") }
    assert(streamed.nonEmpty)
  }
}
