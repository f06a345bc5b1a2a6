package graft

import graft.sketch.Sketches
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  private def docs(n: Int, groups: Int) = {
    import spark.implicits._
    // duplicate every value ~3x so distinct < n
    (0 until n).map(i => (s"g${i % groups}", s"text_${i % (n / 3)}"))
      .toDF("g", "v")
  }

  test("theta distinct is exact below k and matches count_distinct") {
    val d = docs(3000, 4)
    val got = d.groupBy("g").agg(
      Sketches.thetaDistinct(col("v")).as("approx"),
      countDistinct(col("v")).as("exact"))
    assert(got.filter(col("approx") =!= col("exact")).count() == 0)
  }

  test("stored-sketch rollup equals the direct aggregate (exact mode)") {
    import spark.implicits._
    val d = (0 until 3000).map(i => (s"g${i % 3}", s"s${i % 7}", s"t${i % 500}"))
      .toDF("g", "sub", "v")
    val direct = d.groupBy("g")
      .agg(Sketches.thetaDistinct(col("v")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rolled = d.groupBy("g", "sub")
      .agg(Sketches.thetaSketch(col("v")).as("sk"))
      .groupBy("g").agg(Sketches.thetaUnionDistinct(col("sk")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct == rolled)
    // scalar estimate of a merged stored sketch agrees too
    val viaScalar = d.groupBy("g", "sub")
      .agg(Sketches.thetaSketch(col("v")).as("sk"))
      .groupBy("g").agg(Sketches.thetaEstimate(
        Sketches.thetaUnionSketch(col("sk"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaScalar == rolled)
  }

  test("exact-mode result is invariant to partitioning") {
    val d = docs(5000, 5)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(Sketches.thetaDistinct(col("v")).as("n"))
        .orderBy("g").collect().toSeq
    assert(run(d.repartition(17)) == run(d.coalesce(1)))
  }

  test("estimation mode: 200k distinct at lgK=12 stays within 5%") {
    // RSE ~ 1/sqrt(2^12) = 1.6%, so 5% is a ~3-sigma bound
    import spark.implicits._
    val d = spark.range(200000L).select(concat(lit("v"), col("id")).as("v"))
    val est = d.agg(Sketches.thetaDistinct(col("v"), lgK = 12).as("n"))
      .head.getLong(0)
    assert(math.abs(est - 200000L) < 10000L, s"estimate $est off by >5%")
  }

  test("kll quantiles: exact for a small single-partition group") {
    import spark.implicits._
    val vals = (1 to 100).map(_.toDouble)
    val got = vals.toDF("v").coalesce(1)
      .agg(Sketches.kllQuantiles(col("v"), Seq(0.25, 0.5, 0.75, 1.0)).as("q"))
      .head.getSeq[Double](0)
    // inclusive rank: smallest value with rank >= p -> exact order stats
    assert(got == Seq(25.0, 50.0, 75.0, 100.0))
  }

  test("kll quantiles: bounded rank error on 100k rows across partitions") {
    import spark.implicits._
    val n = 100000
    val got = spark.range(1, n + 1).select(col("id").cast("double").as("v"))
      .repartition(16)
      .agg(Sketches.kllQuantiles(col("v"), Seq(0.5)).as("q"))
      .head.getSeq[Double](0).head
    // k=200 => normalized rank error ~1.65%; allow 2.5%
    assert(math.abs(got - n / 2.0) < 0.025 * n, s"median estimate $got")
  }

  test("kll stays exact under many-way merges while n <= k") {
    // the q_kll_quantiles contract: k sized above the largest group
    // keeps every weight-1 item through arbitrary partial merges
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
    val n = 2100 // ~ the largest per-lang group at sf0.1
    val vals = (1 to n).map(_.toDouble)
    for (parts <- Seq(8, 32, 64)) {
      val m = KllDoublesSketch.newHeapInstance(4096)
      vals.grouped(math.max(1, n / parts)).foreach { sh =>
        val s = KllDoublesSketch.newHeapInstance(4096)
        sh.foreach(s.update(_)); m.merge(s)
      }
      val got = Seq(0.25, 0.5, 0.75).map(p =>
        m.getQuantile(p, QuantileSearchCriteria.INCLUSIVE))
      val want = Seq(0.25, 0.5, 0.75).map(p => vals(math.ceil(p * n).toInt - 1))
      assert(got == want && m.getNumRetained == n, s"parts=$parts")
    }
  }

  test("freq items: exact mode equals GROUP BY count, invariant to partitioning") {
    import spark.implicits._
    // zipf-ish: item i appears ~ 3000/i times, 40 distinct << maxMapSize
    val d = (1 to 40).flatMap(i => Seq.fill(3000 / i)(s"item$i")).toDF("v")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.agg(Sketches.freqItems(col("v"), minCount = 100L).as("f"))
        .select(explode(col("f")).as("x"))
        .select(col("x.item"), col("x.n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = run(d.repartition(16))
    val want = d.groupBy("v").count().filter(col("count") >= 100)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (i, n) => (-n, i) }.toSeq
    assert(got == want)
    assert(run(d.coalesce(1)) == got)
  }

  test("freq items: eviction regime keeps every true heavy hitter") {
    import graft.sketch.FreqItemsAgg
    import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
    // small map (64 counters), 1000 distinct: real eviction. The
    // no-false-negatives guarantee holds for items whose true count
    // exceeds the sketch's maximum error, so the heavies must dominate
    // the tail weight.
    val sk = new ItemsSketch[String](64)
    (1 to 1000).foreach(i => (0 until (if (i <= 3) 5000 else 2))
      .foreach(_ => sk.update(s"i$i")))
    assert(sk.getMaximumError > 0) // really in the eviction regime
    assert(sk.getMaximumError < 5000) // heavies are above the error band
    val hh = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem).toSet
    assert(Set("i1", "i2", "i3").subsetOf(hh)) // no false negatives
    // estimates never stray beyond the documented error
    (1 to 3).foreach { i =>
      val est = sk.getEstimate(s"i$i")
      assert(est >= 5000 - sk.getMaximumError && est <= 5000 + sk.getMaximumError)
    }
  }

  test("theta counts empty strings and empty byte arrays as values") {
    // DataSketches' update(byte[]) silently ignores an empty array; the
    // marker byte in Sketches.updateWith restores SQL semantics where
    // '' is a countable distinct value (count(DISTINCT) keeps it).
    import spark.implicits._
    val d = Seq("", "a", "b", "", "a").toDF("v")
    val r = d.agg(
      Sketches.thetaDistinct(col("v")).as("approx"),
      countDistinct(col("v")).as("exact")).head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    val bin = Seq(Array.emptyByteArray, Array[Byte](1), Array[Byte](1, 2))
      .toDF("v")
    assert(bin.agg(Sketches.thetaDistinct(col("v"))).head.getLong(0) == 3L)
  }

  test("kll of an empty group is null") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("v")
    assert(empty.agg(Sketches.kllQuantiles(col("v"), Seq(0.5)).as("q"))
      .head.isNullAt(0))
  }
}
