package graft.queries

import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Core relational operator coverage (scan, filter, hash-agg, joins,
 * semi-join, windows) over the TPC-H-ish tables.
 *
 * Money arithmetic: doubles are converted to exact integer cents /
 * basis points per row (`round(x*100)` — identical HALF-UP for positive
 * values in Spark and DuckDB), summed exactly (order-independent), and
 * only then divided back to double. This makes the aggregate
 * bit-reproducible across engines and across partitionings — the same
 * property the reference gets from integer u16 grids
 * (pubgeo `src/common/orthoimage.h:373-378`).
 */
object Relational {

  private def centsCol(c: String) = round(col(c) * 100, 0).cast("long")
  private def bpCol(c: String) = round(col(c) * 10000, 0).cast("long")
  private def centsSql(c: String) = s"CAST(round($c * 100) AS BIGINT)"
  private def bpSql(c: String) = s"CAST(round($c * 10000) AS BIGINT)"

  val q1_agg: QueryDef = QueryDef.sqlChecked(
    "q1_agg",
    s"""SELECT l_returnflag, l_linestatus,
       |  SUM(${centsSql("l_quantity")}) / 100.0 AS sum_qty,
       |  SUM(${centsSql("l_extendedprice")}) / 100.0 AS sum_base_price,
       |  CAST(SUM(CAST(${centsSql("l_extendedprice")} * (10000 - ${bpSql("l_discount")}) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_disc_price,
       |  CAST(SUM(CAST(${centsSql("l_extendedprice")} * (10000 - ${bpSql("l_discount")}) * (10000 + ${bpSql("l_tax")}) AS DECIMAL(38,0))) AS DOUBLE) / 10000000000.0 AS sum_charge,
       |  COUNT(*) AS count_order
       |FROM lineitem GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(centsCol("l_quantity")) / lit(100.0)).as("sum_qty"),
        (sum(centsCol("l_extendedprice")) / lit(100.0)).as("sum_base_price"),
        (sum((centsCol("l_extendedprice") * (lit(10000L) - bpCol("l_discount")))
          .cast("decimal(38,0)")).cast("double") / lit(1000000.0)).as("sum_disc_price"),
        (sum((centsCol("l_extendedprice") * (lit(10000L) - bpCol("l_discount"))
          * (lit(10000L) + bpCol("l_tax"))).cast("decimal(38,0)")).cast("double")
          / lit(10000000000.0)).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Two equi-joins + exact-integer revenue aggregation + top-k. */
  val q3_top_revenue: QueryDef = QueryDef.sqlChecked(
    "q3_top_revenue",
    s"""SELECT l_orderkey,
       |  CAST(SUM(CAST(${centsSql("l_extendedprice")} * (10000 - ${bpSql("l_discount")}) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY l_orderkey
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    // customer is tiny at every SF -> broadcast; lineitem–orders is the
    // big join and shuffles on the order key only once.
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg((sum((centsCol("l_extendedprice") * (lit(10000L) - bpCol("l_discount")))
        .cast("decimal(38,0)")).cast("double") / lit(1000000.0)).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Correlated-EXISTS as a left-semi join (TPC-H Q4 shape). */
  val q4_order_priority: QueryDef = QueryDef.sqlChecked(
    "q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    o.join(l, l("l_orderkey") === o("o_orderkey") && l("l_shipdate") > o("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Latest capture per key via row_number — the engine's url-dedup
    * primitive (SURVEY.md J6: latest warc_ts per url). */
  val q_latest_event: QueryDef = QueryDef.sqlChecked(
    "q_latest_event",
    """SELECT event_id, user_id, event_type, value FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy(col("user_id"))
  }

  /** Gap-based sessionization (lag + running sum), 1h gap. Batch analog
    * of the streaming session-window operator. */
  val q_sessionize: QueryDef = QueryDef.sqlChecked(
    "q_sessionize",
    """WITH e AS (SELECT user_id, event_id, epoch(ts) AS tsec FROM events),
      |m AS (SELECT user_id, event_id, tsec,
      |  CASE WHEN lag(tsec) OVER w IS NULL OR tsec - lag(tsec) OVER w > 3600.0
      |       THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
      |s AS (SELECT user_id, event_id, tsec,
      |  SUM(brk) OVER (PARTITION BY user_id ORDER BY tsec, event_id
      |                 ROWS UNBOUNDED PRECEDING) AS sess FROM m)
      |SELECT user_id, CAST(sess AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events, max(tsec) - min(tsec) AS duration_sec
      |FROM s GROUP BY user_id, sess ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      // ts is TIMESTAMP_NTZ in the parquet; session TZ is UTC, so the
      // NTZ -> TZ cast is instant-preserving and matches DuckDB epoch().
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("double").as("tsec"))
      .withColumn("brk",
        when(lag(col("tsec"), 1).over(w).isNull
          || col("tsec") - lag(col("tsec"), 1).over(w) > 3600.0, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tsec")) - min(col("tsec"))).as("duration_sec"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Declarative data-quality audit ([[graft.meta.DataQuality]]):
    * referential orphans (lineitem→orders, orders→customer via
    * null-probe left joins), duplicate doc ids, empty text, negative
    * event values — one exact (check, n_violations, n_checked) row
    * each, every check a single conditional-count aggregate. */
  val q_dq_audit: QueryDef = QueryDef.sqlChecked(
    "q_dq_audit",
    """SELECT 'documents_dup_ids' AS check,
      |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violations,
      |  CAST(count(*) AS BIGINT) AS n_checked
      |FROM (SELECT doc_id, count(*) AS n FROM documents GROUP BY doc_id)
      |UNION ALL
      |SELECT 'documents_empty_text',
      |  CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
      |                THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(*) AS BIGINT) FROM documents
      |UNION ALL
      |SELECT 'events_negative_value',
      |  CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(*) AS BIGINT) FROM events
      |UNION ALL
      |SELECT 'lineitem_fk_orphans',
      |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
      |       AS BIGINT),
      |  CAST(count(*) AS BIGINT)
      |FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
      |UNION ALL
      |SELECT 'orders_fk_orphans',
      |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
      |       AS BIGINT),
      |  CAST(count(*) AS BIGINT)
      |FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    import graft.meta.DataQuality
    val docs = Tables.documents(s, dir)
    val dupDocs = docs.groupBy("doc_id").agg(count(lit(1)).as("_n"))
    DataQuality.audit(Seq(
      ("documents_dup_ids", dupDocs, col("_n") > 1),
      ("documents_empty_text", docs,
        col("text").isNull || length(col("text")) === 0),
      ("events_negative_value", Tables.events(s, dir), col("value") < 0),
      ("lineitem_fk_orphans",
        Tables.lineitem(s, dir).join(Tables.orders(s, dir),
          col("o_orderkey") === col("l_orderkey"), "left"),
        col("o_orderkey").isNull),
      ("orders_fk_orphans",
        Tables.orders(s, dir).join(Tables.customer(s, dir),
          col("c_custkey") === col("o_custkey"), "left"),
        col("c_custkey").isNull)))
      .orderBy(col("check"))
  }

  val all: Seq[QueryDef] =
    Seq(q1_agg, q3_top_revenue, q4_order_priority, q_latest_event,
      q_sessionize, q_dq_audit)
}
