package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join: for every probe row, attach the build row with
 * the greatest build time <= the probe time within the same key group —
 * "the state of X as the crawler saw it when Y happened". The web-archive
 * staple (page content as of a link's capture time, price as of an order,
 * last config push before an error) that plain equi-joins can't express.
 *
 * Spark has no built-in as-of join, and the naive theta-join
 * (`p.ts >= b.ts` + row_number) explodes to |probe| x |build| pairs per
 * key before pruning. This implementation is the scalable union form:
 *
 *   1. tag both inputs and union them into one relation;
 *   2. one hash shuffle on the keys, one sort by (ts, side) per key;
 *   3. a running `last(payload, ignoreNulls)` window carries the most
 *      recent build values forward onto each probe row.
 *
 * The frame is UnboundedPreceding..CurrentRow, which Spark executes as a
 * running aggregate — O(1) state per row, no per-row frame rescans. Total
 * cost is one shuffle + one sort of |probe| + |build| rows, the same
 * shape a single keyed window query costs; nothing is ever materialized
 * per *pair*. At 100 TB the parallelism unit is the key group (urls,
 * users, cells — billions of them), so partitions stay balanced; a
 * single pathologically hot key would need range-splitting by time with
 * boundary builds replicated, which callers can layer on top.
 *
 * Build rows sort BEFORE probe rows at equal timestamps, so a probe at
 * exactly t sees a build at t (>= semantics, matching DuckDB's
 * `ASOF LEFT JOIN ... ON p.ts >= b.ts`). The build side must be unique
 * per (keys, ts) — pre-aggregate ties (e.g. `max(value)`) before the
 * call, otherwise "the" row at a timestamp is ill-defined on both
 * engines.
 *
 * Probes with no earlier build keep null payloads (left-join semantics).
 */
object AsOf {

  /**
   * @param probe   left side; all its columns are preserved
   * @param build   right side; must contain `keys`, `ts`, and `payload`
   *                columns, unique per (keys, ts)
   * @param keys    equi-join key columns (present on both sides)
   * @param ts      event-time column name (present on both sides, any
   *                orderable type; probe and build types must match)
   * @param payload build columns carried onto each probe row; emitted
   *                under the same names, plus `<ts>_build` = the matched
   *                build row's timestamp (null when no match)
   */
  def joinAsOf(
      probe: DataFrame, build: DataFrame,
      keys: Seq[String], ts: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val buildTs = s"${ts}_build"
    val probeCols = probe.columns.toSeq
    require(!probeCols.contains(buildTs) && payload.forall(!probeCols.contains(_)),
      s"probe columns collide with payload/$buildTs")

    // Common tagged schema: probe columns + build payload (+ matched ts).
    val p = probe
      .withColumn("_side", lit(1))
      .withColumn(buildTs, lit(null).cast(build.schema(ts).dataType))
    val pWithNullPayload = payload.foldLeft(p)((df, c) =>
      df.withColumn(c, lit(null).cast(build.schema(c).dataType)))
    val probeOnly = probeCols.filterNot(c => keys.contains(c) || c == ts)
    val b = build
      .withColumn("_side", lit(0))
      .withColumn(buildTs, col(ts))
    val bWithNullProbe = probeOnly.foldLeft(b)((df, c) =>
      df.withColumn(c, lit(null).cast(probe.schema(c).dataType)))

    val ordered = probeCols ++ Seq(buildTs) ++ payload ++ Seq("_side")
    val unioned = pWithNullPayload.select(ordered.map(col): _*)
      .unionByName(bWithNullProbe.select(ordered.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (buildTs +: payload).foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    carried.filter(col("_side") === 1).drop("_side")
  }
}
