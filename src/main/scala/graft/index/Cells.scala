package graft.index

/**
 * S2-style hierarchical quad cells over the lon/lat plane, Morton
 * (Z-order) encoded. A cell id packs `res` (0..16) in the top byte and
 * the interleaved (cx, cy) bits below:
 *
 *   id = (res << 56) | interleave(cx, cy)
 *
 * where cx indexes 2^res columns over lon in [-180, 180) and cy indexes
 * 2^res rows over lat in [-90, 90). Parent/child moves are 2-bit shifts,
 * so "partition by cell prefix" (BASELINE.json north_rule) is
 * `parent(cell, dr)` — a pure arithmetic prefix.
 *
 * The reference has no spatial index; its analog is the pixel transform
 * `col = (x - easting)/gsd` (pubgeo `src/common/orthoimage.h:400-409`).
 * This class is the north rule's added index layer. All methods are
 * static and branch-light so the Catalyst expression (CellIdExpr) can
 * call them from generated code.
 */
object Cells {
  final val MaxRes = 16

  /** Spread the low 16 bits of v so bit i lands at position 2i. */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Inverse of spread16: collect bits at even positions. */
  def unspread16(v: Long): Long = {
    var x = v & 0x55555555L
    x = (x | (x >> 1)) & 0x33333333L
    x = (x | (x >> 2)) & 0x0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFFL
    x
  }

  def clampIdx(i: Long, n: Long): Long =
    if (i < 0L) 0L else if (i >= n) n - 1L else i

  def cxOf(lon: Double, res: Int): Long = {
    val n = 1L << res
    clampIdx(math.floor((lon + 180.0) / 360.0 * n.toDouble).toLong, n)
  }

  def cyOf(lat: Double, res: Int): Long = {
    val n = 1L << res
    clampIdx(math.floor((lat + 90.0) / 180.0 * n.toDouble).toLong, n)
  }

  def pack(cx: Long, cy: Long, res: Int): Long =
    (res.toLong << 56) | spread16(cx) | (spread16(cy) << 1)

  /** lon/lat -> cell id at resolution res. Called from generated code. */
  def encode(lon: Double, lat: Double, res: Int): Long =
    pack(cxOf(lon, res), cyOf(lat, res), res)

  def res(cell: Long): Int = (cell >>> 56).toInt
  def morton(cell: Long): Long = cell & 0x00FFFFFFFFFFFFFFL
  def cx(cell: Long): Long = unspread16(morton(cell))
  def cy(cell: Long): Long = unspread16(morton(cell) >> 1)

  /** Coarser ancestor: drop dr levels (2 bits per level). */
  def parent(cell: Long, dr: Int): Long = {
    val r = res(cell)
    require(dr >= 0 && dr <= r, s"bad dr=$dr for res=$r")
    ((r - dr).toLong << 56) | (morton(cell) >> (2 * dr))
  }

  /** Cell center in degrees. */
  def center(cell: Long): (Double, Double) = {
    val r = res(cell); val n = (1L << r).toDouble
    val lon = (cx(cell).toDouble + 0.5) / n * 360.0 - 180.0
    val lat = (cy(cell).toDouble + 0.5) / n * 180.0 - 90.0
    (lon, lat)
  }

  /** Cell bounds (lonMin, latMin, lonMax, latMax). */
  def bounds(cell: Long): (Double, Double, Double, Double) = {
    val r = res(cell); val n = (1L << r).toDouble
    val x = cx(cell).toDouble; val y = cy(cell).toDouble
    (x / n * 360.0 - 180.0, y / n * 180.0 - 90.0,
     (x + 1.0) / n * 360.0 - 180.0, (y + 1.0) / n * 180.0 - 90.0)
  }

  /** All cells within Chebyshev ring distance <= k (the (2k+1)^2 block),
    * clipped at the index edge. Used for kNN candidate expansion. */
  def disk(cell: Long, k: Int): Array[Long] = {
    val r = res(cell); val n = 1L << r
    val x0 = cx(cell); val y0 = cy(cell)
    val out = Array.newBuilder[Long]
    var dy = -k
    while (dy <= k) {
      var dx = -k
      while (dx <= k) {
        val x = x0 + dx; val y = y0 + dy
        if (x >= 0 && x < n && y >= 0 && y < n) out += pack(x, y, r)
        dx += 1
      }
      dy += 1
    }
    out.result()
  }

  /** Cells at exactly Chebyshev ring distance k (ring border). */
  def ring(cell: Long, k: Int): Array[Long] = {
    if (k == 0) return Array(cell)
    val r = res(cell); val n = 1L << r
    val x0 = cx(cell); val y0 = cy(cell)
    val out = Array.newBuilder[Long]
    var dy = -k
    while (dy <= k) {
      var dx = -k
      while (dx <= k) {
        if (math.max(math.abs(dx), math.abs(dy)) == k) {
          val x = x0 + dx; val y = y0 + dy
          if (x >= 0 && x < n && y >= 0 && y < n) out += pack(x, y, r)
        }
        dx += 1
      }
      dy += 1
    }
    out.result()
  }

  /** All cells at resolution res intersecting the lon/lat rectangle. */
  def cover(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
            res: Int): Array[Long] = {
    val x0 = cxOf(lonMin, res); val x1 = cxOf(lonMax, res)
    val y0 = cyOf(latMin, res); val y1 = cyOf(latMax, res)
    val out = new Array[Long](((x1 - x0 + 1) * (y1 - y0 + 1)).toInt)
    var i = 0; var y = y0
    while (y <= y1) {
      var x = x0
      while (x <= x1) { out(i) = pack(x, y, res); i += 1; x += 1 }
      y += 1
    }
    out
  }

  // ---- DuckDB-SQL duals --------------------------------------------------

  /** SQL for spread16 of a (already BIGINT, in-range) column/expr. */
  def spreadSql(x: String): String = {
    val a = s"((($x) | (($x) << 8)) & 16711935)"
    val b = s"((($a) | (($a) << 4)) & 252645135)"
    val c = s"((($b) | (($b) << 2)) & 858993459)"
    s"((($c) | (($c) << 1)) & 1431655765)"
  }

  def cxSql(lon: String, res: Int): String = {
    val n = (1L << res).toDouble
    s"CAST(floor((($lon) + 180.0) / 360.0 * $n) AS BIGINT)"
  }

  def cySql(lat: String, res: Int): String = {
    val n = (1L << res).toDouble
    s"CAST(floor((($lat) + 90.0) / 180.0 * $n) AS BIGINT)"
  }

  /** SQL packing pre-computed cx/cy columns into the cell id. */
  def packSql(cx: String, cy: String, res: Int): String =
    s"((CAST($res AS BIGINT) << 56) | ${spreadSql(cx)} | (${spreadSql(cy)} << 1))"
}
