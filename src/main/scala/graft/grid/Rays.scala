package graft.grid

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared exact discrete-ray arithmetic for the line-of-sight family
  * ([[Viewshed]], [[LineRaster]]): the rounded-parametric line and the
  * engine-portable floor division it needs. */
object Rays {

  /** floor(a / b) for b > 0, bit-identical in Spark and DuckDB: pmod
    * makes the numerator an exact multiple, where truncating and
    * flooring division coincide (|a| < 2^52 keeps the double path
    * exact; callers stay far below). */
  def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Coordinate of step k on the rounded-parametric line from `o`
    * along displacement `d` with `n` total steps (n >= 1):
    * o + floor((2*k*d + n) / (2*n)) = o + round-half-up(k*d/n). */
  def pointAt(o: Column, d: Column, k: Column, n: Column): Column =
    o + floorDiv(lit(2L) * k * d + n, lit(2L) * n)
}
