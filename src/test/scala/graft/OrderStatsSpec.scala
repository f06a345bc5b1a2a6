package graft

import graft.core.OrderStats
import org.apache.spark.sql.functions._

class OrderStatsSpec extends SparkSpec {
  import spark.implicits._

  private val values: Seq[Long] =
    (1 to 997).map(i => ((i * 131) % 47).toLong) ++ Seq(0L, 46L, 23L)

  private lazy val df = values.toDF("v")

  test("kth equals the sorted sequence at every probed rank") {
    val sorted = values.sorted
    val ks = Seq(1L, 2L, 500L, 999L, 1000L)
    val got = OrderStats.kth(df, "v", ks).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ks.map(k => k -> sorted((k - 1).toInt)).toMap)
  }

  test("quantiles follow the upper-middle convention incl. p=0.5 on even n") {
    val sorted = values.sorted
    val ps = Seq(0.1, 0.5, 0.99)
    val got = OrderStats.quantiles(df, "v", ps).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    val want = ps.map { p =>
      val k = math.min(math.floor(p * values.size).toLong + 1, values.size.toLong)
      (p, k, sorted((k - 1).toInt))
    }
    assert(got == want)
  }

  test("heavy ties: every rank inside a tie run returns the tied value") {
    val tied = (Seq.fill(400)(7L) ++ Seq.fill(300)(3L) ++ Seq.fill(300)(9L))
    val d = tied.toDF("v")
    val got = OrderStats.kth(d, "v", Seq(1L, 300L, 301L, 700L, 701L, 1000L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 300L -> 3L, 301L -> 7L, 700L -> 7L,
      701L -> 9L, 1000L -> 9L))
  }

  test("no single-task global window over the data (plan guard)") {
    val p = OrderStats.kth(df, "v", Seq(500L))
      .queryExecution.executedPlan.toString
    // the only legal SinglePartition funnel is PrefixSum's bucket table
    assert("SinglePartition".r.findAllIn(p).size <= 1,
      s"order-stat plan funnels data through one partition:\n${p.take(3000)}")
    assert(p.contains("windowspecdefinition(_bkt"),
      "per-bucket window lost its partitioning")
  }

  test("partitioning invariance") {
    val a = OrderStats.kth(df.repartition(1), "v", Seq(123L, 877L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = OrderStats.kth(df.repartition(13, col("v")), "v", Seq(123L, 877L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("upperMedianByKey: sorted[n div 2] per key, heavy ties, odd/even") {
    val rows =
      (1 to 7).map(i => ("odd", i.toLong)) ++          // median idx 4 -> 4
      (1 to 8).map(i => ("even", i.toLong)) ++         // upper middle -> 5
      (Seq.fill(30)(7L) ++ Seq.fill(5)(1L)).map(("tied", _)) ++
      Seq(("one", 42L))
    val got = OrderStats.upperMedianByKey(
        rows.toDF("k", "v").repartition(9), "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("odd" -> 4L, "even" -> 5L, "tied" -> 7L,
      "one" -> 42L))
    // exactly one row per key even when ties straddle the rank
    assert(OrderStats.upperMedianByKey(rows.toDF("k", "v"), "k", "v")
      .count() === 4)
  }

  test("upperMedianByKey matches the global convention at one key") {
    val sorted = values.sorted
    val got = OrderStats.upperMedianByKey(
        values.map(("g", _)).toDF("k", "v"), "k", "v")
      .head().getLong(1)
    assert(got === sorted(values.size / 2))
  }
}
