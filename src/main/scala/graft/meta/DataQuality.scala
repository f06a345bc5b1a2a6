package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality audit — the dbt-test / Deequ-style check
 * runner a production table needs before anything downstream trusts
 * it: each check is (name, prepared frame, violation predicate), and
 * the audit emits one exact `(check, n_violations, n_checked)` row per
 * check.
 *
 * Scale shape: each check is ONE aggregate over its frame —
 * a conditional count with map-side partials, never a collect;
 * referential checks arrive pre-joined by the caller (a left join
 * whose null-probe IS the orphan predicate — Catalyst plans the usual
 * hash join, broadcast when the parent side is small). The audit
 * result is |checks| rows, so the union tree is driver-trivial. */
object DataQuality {

  /** (name, frame, violationPredicate) -> one row per check. */
  def audit(checks: Seq[(String, DataFrame, Column)]): DataFrame =
    checks.map { case (name, df, pred) =>
      df.agg(
          coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))
            .as("n_violations"),
          count(lit(1)).as("n_checked"))
        .select(lit(name).as("check"), col("n_violations"),
          col("n_checked"))
    }.reduce(_ unionByName _)
}
