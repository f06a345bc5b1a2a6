package graft

import graft.temporal.Cusum
import org.apache.spark.sql.functions._

class CusumSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference: the textbook recursion C_t = max(0, C_{t-1}+x-k),
    * plus the unrolled S/min identities the operator computes. */
  private def reference(xs: Seq[(Long, Long)], drift: Long, h: Long)
      : Seq[(Long, Long, Long, Long, Boolean)] = {
    var s = 0L
    var minS = Long.MaxValue
    xs.sortBy(_._1).map { case (t, x) =>
      s += x - drift
      minS = math.min(minS, s)
      val c = s - minS
      (t, x, s, c, c >= h)
    }
  }

  private def run(xs: Seq[(Long, Long)], drift: Long, h: Long, shift: Int) = {
    val df = xs.toDF("t", "cnt").withColumn("k", lit("a"))
    Cusum.changepoints(df, "k", "t", "cnt", drift, h, shift)
      .select("t", "cnt", "s", "cusum", "alarm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toSeq.sortBy(_._1)
  }

  test("equals the max(0, C+x-k) recursion across bucket boundaries") {
    val xs = Seq[(Long, Long)](
      (0, 9), (1, 0), (2, 0), (3, 0), (4, 12), (5, 11), (6, 10), (7, 0),
      (8, 1), (9, 2), (10, 30), (11, 0), (12, 0), (13, 0), (14, 0), (15, 4),
      (16, 4), (17, 4), (18, 25), (19, 25))
    for (shift <- Seq(0, 1, 2, 10)) {
      assert(run(xs, drift = 4L, h = 10L, shift) ===
        reference(xs, 4L, 10L), s"shift=$shift")
    }
  }

  test("negative drift-adjusted sums: running min tracks below zero") {
    // all counts below drift -> S strictly decreasing, cusum stays 0
    val xs = (0L to 40L).map(t => (t, t % 3))
    val got = run(xs, drift = 5L, h = 1L, shift = 2)
    assert(got === reference(xs, 5L, 1L))
    assert(got.forall(!_._5), "no alarms when counts never exceed drift")
  }

  test("per-key isolation: keys do not share running state") {
    val df = Seq(("a", 0L, 100L), ("b", 0L, 0L), ("a", 1L, 0L),
      ("b", 1L, 100L)).toDF("k", "t", "cnt")
    val got = Cusum.changepoints(df, "k", "t", "cnt", 1L, 50L, 1)
      .select("k", "t", "cusum", "alarm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    // a: S = 99, 98 with running min 99, 98 -> cusum 0, 0.
    // b: S = -1, 98 with running min -1, -1 -> cusum 0, 99 (alarm).
    // A shared running min would corrupt both.
    assert(got === Set(("a", 0L, 0L, false), ("a", 1L, 0L, false),
      ("b", 0L, 0L, false), ("b", 1L, 99L, true)))
  }

  test("partitioning invariance: 1 vs 13 input partitions") {
    val xs = (0L until 200L).map(t => (t, (t * 7919) % 13))
    val a = run(xs, 6L, 8L, 3)
    val dfMany = xs.toDF("t", "cnt").repartition(13)
      .withColumn("k", lit("a"))
    val b = Cusum.changepoints(dfMany, "k", "t", "cnt", 6L, 8L, 3)
      .select("t", "cnt", "s", "cusum", "alarm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq.sortBy(_._1)
    assert(a === b)
  }

  test("plan: no single-partition global window on the row table") {
    val df = (0L until 64L).map(t => (t, t % 5)).toDF("t", "cnt")
      .withColumn("k", lit("a"))
    val plan = Cusum.changepoints(df, "k", "t", "cnt", 2L, 4L, 3)
      .queryExecution.executedPlan.toString
    // every Window must be partitioned (the bucket-table window is
    // keyed by k; local windows by (k, _bkt)) — a bare
    // `Window [... ORDER BY ...]` with SinglePartition would show as
    // an Exchange SinglePartition feeding a Window.
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition funnel in plan:\n$plan")
  }
}
