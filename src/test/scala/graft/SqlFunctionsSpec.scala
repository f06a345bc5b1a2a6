package graft

import graft.index.CellFunctions
import graft.similarity.DotProduct
import graft.sketch.Sketches
import graft.sql.GraftFunctions
import org.apache.spark.sql.functions._

/** The SQL function surface must agree with the Column API builders it
  * shares with `GraftExtensions`. */
class SqlFunctionsSpec extends SparkSpec {

  GraftFunctions.register(spark)

  private def docsGeo = {
    import spark.implicits._
    graft.core.Geo.withGeo(
      spark.range(200L).select(col("id").as("doc_id")))
  }

  test("graft_cell in SQL == CellFunctions.cellId") {
    docsGeo.createOrReplaceTempView("sqlspec_pts")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_cell(lon, lat, 10) AS c FROM sqlspec_pts")
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val viaCol = docsGeo.select(col("doc_id"),
        CellFunctions.cellId(col("lon"), col("lat"), 10).as("c"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(viaSql == viaCol)
  }

  test("graft_hex_cell in SQL == HexFunctions") {
    docsGeo.createOrReplaceTempView("sqlspec_pts")
    val viaSql = spark.sql(
      "SELECT graft_hex_cell(lon, lat, 8) AS c FROM sqlspec_pts ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = docsGeo.orderBy("doc_id")
      .select(graft.index.HexCellFunctions.hexCellId(col("lon"), col("lat"), 8))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
  }

  test("graft_dot in SQL == VectorFunctions.dot") {
    import spark.implicits._
    val v = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    v.createOrReplaceTempView("sqlspec_vec")
    assert(spark.sql("SELECT graft_dot(a, b) FROM sqlspec_vec")
      .head.getDouble(0) == 32.0)
    assert(v.select(DotProduct(col("a"), col("b")))
      .head.getDouble(0) == 32.0)
  }

  test("theta family in SQL: distinct, sketch+union+estimate agree") {
    import spark.implicits._
    (0 until 3000).map(i => (s"g${i % 3}", s"s${i % 7}", s"t${i % 500}"))
      .toDF("g", "sub", "v").createOrReplaceTempView("sqlspec_docs")
    val direct = spark.sql(
      """SELECT g, graft_theta_distinct(v) AS n FROM sqlspec_docs
        |GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val rolled = spark.sql(
      """SELECT g, graft_theta_union(sk) AS n FROM (
        |  SELECT g, sub, graft_theta_sketch(v) AS sk FROM sqlspec_docs
        |  GROUP BY g, sub)
        |GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(direct == rolled)
    val viaEstimate = spark.sql(
      """SELECT g, graft_theta_estimate(graft_theta_union_sketch(sk)) AS n FROM (
        |  SELECT g, sub, graft_theta_sketch(v) AS sk FROM sqlspec_docs
        |  GROUP BY g, sub)
        |GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaEstimate == rolled)
    assert(direct.map(_._2) == Seq(500L, 500L, 500L))
  }

  test("graft_kll_quantiles in SQL == Column API") {
    import spark.implicits._
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("sqlspec_v")
    val viaSql = spark.sql(
      "SELECT graft_kll_quantiles(v, array(0.25, 0.5, 0.75)) FROM sqlspec_v")
      .head.getSeq[Double](0)
    val viaCol = spark.table("sqlspec_v")
      .agg(Sketches.kllQuantiles(col("v"), Seq(0.25, 0.5, 0.75)))
      .head.getSeq[Double](0)
    assert(viaSql == viaCol)
  }

  test("graft_freq_items in SQL == Column API (exact regime)") {
    import spark.implicits._
    (1 to 30).flatMap(i => Seq.fill(600 / i)(s"w$i")).toDF("v")
      .createOrReplaceTempView("sqlspec_freq")
    val viaSql = spark.sql(
      "SELECT graft_freq_items(v, 50) AS f FROM sqlspec_freq")
      .select(explode(col("f")).as("x"))
      .select(col("x.item"), col("x.n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = spark.table("sqlspec_freq").groupBy("v").count()
      .filter(col("count") >= 50)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (i, n) => (-n, i) }.toSeq
    assert(viaSql == want)
  }

  test("graft_freq_items takes a BIGINT threshold without truncation") {
    // 3e9 parses as a Long literal; routed through a 32-bit parse it
    // would wrap negative and return EVERY item as a heavy hitter.
    import spark.implicits._
    (1 to 30).flatMap(i => Seq.fill(600 / i)(s"w$i")).toDF("v")
      .createOrReplaceTempView("sqlspec_freq_big")
    val f = spark.sql(
      "SELECT graft_freq_items(v, 3000000000) AS f FROM sqlspec_freq_big")
      .select(size(col("f"))).head.getInt(0)
    assert(f == 0, s"expected no items above 3e9, got $f")
  }

  test("graft_topk in SQL == Column API") {
    import spark.implicits._
    val rnd = new scala.util.Random(4)
    (0 until 800).map(i => (s"g${i % 4}", i.toLong, rnd.nextInt(30).toLong))
      .toDF("g", "item", "score").createOrReplaceTempView("sqlspec_topk")
    val viaSql = spark.sql(
      "SELECT g, graft_topk(item, score, 5) AS t FROM sqlspec_topk GROUP BY g")
      .select(col("g"), explode(col("t")).as("x"))
      .select(col("g"), col("x.item"), col("x.score")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaCol = spark.table("sqlspec_topk").groupBy("g")
      .agg(graft.sketch.TopK.topK(col("item"), col("score"), 5).as("t"))
      .select(col("g"), explode(col("t")).as("x"))
      .select(col("g"), col("x.item"), col("x.score")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSql == viaCol && viaSql.size == 20)
  }

  test("optimizer rewrites the zip_with dot fold to graft_dot") {
    import spark.implicits._
    // non-local source: a literal Seq would be constant-folded into a
    // LocalRelation before the rewrite could be observed in the plan
    val df = spark.range(1, 4).select(
      array(col("id").cast("double"), lit(2.0), col("id").cast("double") * 3.0).as("a"),
      array(lit(4.0), col("id").cast("double"), lit(6.0)).as("b"))
    val fold = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), " +
        "CAST(0 AS DOUBLE), (acc, t) -> acc + t)").as("d"))
    assert(fold.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      s"rewrite did not fire:\n${fold.queryExecution.optimizedPlan}")
    val viaExpr = df.select(DotProduct(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(fold.collect().map(_.getDouble(0)).toSeq == viaExpr)
    // self-dot variant (the q_embed_norm shape)
    val norm = df.select(expr(
      "aggregate(transform(a, x -> x * x), " +
        "CAST(0 AS DOUBLE), (acc, t) -> acc + t)").as("n"))
    assert(norm.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(norm.collect().map(_.getDouble(0)).toSeq ==
      df.select(DotProduct(col("a"), col("a"))).collect().map(_.getDouble(0)).toSeq)
    // near-miss shapes must NOT be rewritten: wrong zero, wrong zip op
    val wrongZero = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), " +
        "CAST(1 AS DOUBLE), (acc, t) -> acc + t)").as("d"))
    assert(!wrongZero.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    val wrongOp = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x + y), " +
        "CAST(0 AS DOUBLE), (acc, t) -> acc + t)").as("d"))
    assert(!wrongOp.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    // null/shape parity: length mismatch and a null element both -> NULL
    val odd = Seq((Seq(1.0, 2.0), Seq(1.0)),
      (Seq(1.0, Double.NaN), Seq(1.0, 2.0))).toDF("a", "b")
    val oddFold = odd.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), " +
        "CAST(0 AS DOUBLE), (acc, t) -> acc + t)").as("d")).collect()
    assert(oddFold(0).isNullAt(0))
  }

  test("sizing arguments must be literals") {
    docsGeo.createOrReplaceTempView("sqlspec_pts")
    intercept[Exception] {
      spark.sql("SELECT graft_cell(lon, lat, CAST(doc_id AS INT)) FROM sqlspec_pts")
        .collect()
    }
  }
}
