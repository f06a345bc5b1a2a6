package graft.meta

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Per-partition lineage metrics (north rule: "persists per-partition
 * lineage + row-count/latency metrics to an Iceberg metadata table").
 *
 * Two collectors:
 *  - [[instrument]]: wraps a DataFrame so each partition reports
 *    (stage, partitionId, rows, wallNanos) through accumulators — exact
 *    per-partition row counts for the instrumented stage;
 *  - [[TaskMetricsListener]]: SparkListener capturing task-level
 *    runtime/shuffle metrics for every stage of the job.
 *
 * [[flush]] appends both to a snapshot-committed metrics table
 * (Snapshots layer), so the metrics table itself is resumable and
 * atomic like any other table.
 */
object Lineage {

  final case class PartitionMetric(
      stage: String, partitionId: Int, rows: Long, wallNanos: Long)

  private val collected = new ConcurrentLinkedQueue[PartitionMetric]()

  /** Wrap a DataFrame: when it executes, each partition reports one
    * (stage, partition, rows, wallNanos) record through a collection
    * accumulator — the executor -> driver channel that also works on a
    * real cluster. */
  def instrument(df: DataFrame, stage: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val acc = spark.sparkContext.collectionAccumulator[PartitionMetric](s"$stage.partitions")
    accs.add((stage, acc))
    val rdd = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val t0 = System.nanoTime()
      var n = 0L
      val buf = it.map { r => n += 1; r }.toArray
      acc.add(PartitionMetric(stage, pid, n, System.nanoTime() - t0))
      buf.iterator
    }
    spark.createDataFrame(rdd, schema)
  }

  private val accs =
    new ConcurrentLinkedQueue[(String, org.apache.spark.util.CollectionAccumulator[PartitionMetric])]()

  def drain(): Seq[PartitionMetric] = {
    val out = scala.collection.mutable.ArrayBuffer[PartitionMetric]()
    var e = accs.poll()
    while (e != null) {
      out ++= scala.jdk.CollectionConverters.ListHasAsScala(e._2.value).asScala
      e = accs.poll()
    }
    var m = collected.poll()
    while (m != null) { out += m; m = collected.poll() }
    out.toSeq
  }

  /** Append drained partition metrics to the metrics table. */
  def flush(spark: SparkSession, root: String): Option[Snapshots.Manifest] = {
    val ms = drain()
    if (ms.isEmpty) None
    else {
      import spark.implicits._
      Some(Snapshots.commit(ms.toDF(), root, "lineage_metrics",
        lineage = s"partition-metrics n=${ms.size}"))
    }
  }

  final case class TaskMetric(
      stageId: Int, taskId: Long, durationMs: Long, recordsRead: Long,
      shuffleReadBytes: Long, shuffleWriteBytes: Long)

  /** Job-wide task metrics listener; register, run, then `metrics`. */
  final class TaskMetricsListener extends SparkListener {
    private val q = new ConcurrentLinkedQueue[TaskMetric]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) q.add(TaskMetric(t.stageId, t.taskInfo.taskId,
        t.taskInfo.duration,
        if (m.inputMetrics != null) m.inputMetrics.recordsRead else 0L,
        if (m.shuffleReadMetrics != null) m.shuffleReadMetrics.totalBytesRead else 0L,
        if (m.shuffleWriteMetrics != null) m.shuffleWriteMetrics.bytesWritten else 0L))
    }
    def metrics: Seq[TaskMetric] = {
      val out = scala.collection.mutable.ArrayBuffer[TaskMetric]()
      val it = q.iterator()
      while (it.hasNext) out += it.next()
      out.toSeq
    }
  }
}
