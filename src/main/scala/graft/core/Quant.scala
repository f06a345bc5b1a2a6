package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * u16 elevation quantization, replicating the reference's rule
 * (pubgeo `src/common/orthoimage.h:373-378`):
 *
 *   offset = zMin - 1
 *   scale  = (zMax + 1 - (zMin - 1)) / 65535
 *   raw    = trunc((z - offset) / scale)        // C cast semantics
 *
 * Zero is the universal void sentinel (`orthoimage.h:430-431`), which the
 * `-1` offset reserves. The engine's geocoded z lives in [0, 20), so the
 * standard grid uses the fixed constants zMin=0, zMax=20 =>
 * offset = -1, scale = 22/65535. All values are positive, so
 * floor == trunc and the same formula is expressible in ANSI SQL.
 */
object Quant {
  final val ZMin = 0.0
  final val ZMax = 20.0
  final val Offset: Double = ZMin - 1.0
  final val Scale: Double = (ZMax + 1.0 - (ZMin - 1.0)) / 65535.0

  /** Quantize meters -> u16 raw (as Long column). */
  def q(z: Column): Column = floor((z - lit(Offset)) / lit(Scale)).cast("long")

  /** Dequantize raw -> meters (pubgeo `src/common/orthoimage.h:333`). */
  def deq(v: Column): Column = v.cast("double") * lit(Scale) + lit(Offset)

  def q(z: Double): Long = math.floor((z - Offset) / Scale).toLong
  def deq(v: Long): Double = v.toDouble * Scale + Offset

  /** DuckDB dual of [[q]]: `(z - (-1.0)) / (22.0/65535.0)` floored. */
  def qSql(z: String): String =
    s"CAST(floor((($z) - (-1.0)) / (22.0 / 65535.0)) AS BIGINT)"
}
