package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial primitives for the reference's own domain — the
  * reference is a GPS location pipeline (required `latitude` /
  * `longitude` doubles, /root/reference/main.go:34-35), so the first
  * queries a location-lake user runs are a bounding-box probe and a
  * near-point / radius search.
  *
  * Everything here composes BUILT-IN functions (sin/cos/asin/sqrt —
  * all codegen'd), so the expressions stay inside whole-stage codegen
  * with no UDF and DuckDB can replay the identical formula text for
  * the oracle (SURVEY §5). Coordinates ride as scaled-integer
  * MICRODEGREES (`lat_e6`/`lon_e6` bigints) wherever they feed
  * layouts or joins: integer columns get exact manifest min/max stats
  * (z-order file pruning) and exact cell arithmetic; conversion to
  * degrees happens only inside the distance formula.
  */
object GeoFns {

  /** Mean-earth-radius haversine distance in METERS between two
    * (degree, degree) points. Operand order and the pow/sin/cos
    * composition are FIXED — the DuckDB oracle replays this exact
    * text, so both engines evaluate the same IEEE expression tree:
    *
    * {{{
    * 2 * 6371000.0 * ASIN(SQRT(
    *   POW(SIN(RADIANS(lat2 - lat1) / 2), 2) +
    *   COS(RADIANS(lat1)) * COS(RADIANS(lat2)) *
    *   POW(SIN(RADIANS(lon2 - lon1) / 2), 2)))
    * }}}
    *
    * Longitude wraparound needs no special-casing: sin²((2π−θ)/2) =
    * sin²(θ/2), so a Δλ crossing the antimeridian scores the short
    * way around.
    */
  def haversineMeters(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column =
    lit(2d) * lit(6371000.0) * asin(sqrt(
      pow(sin(radians(lat2 - lat1) / 2), lit(2)) +
        cos(radians(lat1)) * cos(radians(lat2)) *
          pow(sin(radians(lon2 - lon1) / 2), lit(2))))

  /** Microdegrees → degrees (exact IEEE division of an exact integer
    * — identical on both engines).
    */
  def deg(e6: Column): Column = e6.cast("double") / lit(1000000.0)

  /** Deterministic 60-bit md5 integer (the repo's oracle-determinism
    * convention, SURVEY §5): identical in Spark and DuckDB.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Synthetic GPS point derivation for a row key: latitude clamped
    * to ±60° (microdegrees) so fixed-width longitude grid cells keep
    * a bounded km width (see [[lonCell]]); longitude full-range.
    * DuckDB replay:
    * `('0x'||substr(md5(k||':lat'),1,15))::BIGINT % 120000000 - 60000000`.
    */
  def latE6(key: Column): Column =
    h60(concat(key.cast("string"), lit(":lat"))) % 120000000L - 60000000L
  def lonE6(key: Column): Column =
    h60(concat(key.cast("string"), lit(":lon"))) % 360000000L - 180000000L

  /** Grid-cell size: 6° in microdegrees. At |lat| ≤ 60° one lon cell
    * is ≥ 333 km wide and one lat cell is ~667 km tall, so a 600 km
    * radius is covered by ±1 lat cells and ±2 lon cells — the
    * neighborhood [[cellNeighbors]] enumerates.
    */
  val CellE6 = 6000000L
  /** Longitude cell count (360° / 6°) for modular wraparound. */
  val LonCells = 60L

  def latCell(latE6: Column): Column = floor(latE6 / lit(CellE6)).cast("bigint")
  def lonCell(lonE6: Column): Column = floor(lonE6 / lit(CellE6)).cast("bigint")

  /** The (dLat, dLon) cell offsets a 600 km radius can reach from a
    * center cell under the ±60° clamp: 3 lat × 5 lon = 15 cells.
    * Longitude neighbors wrap modulo [[LonCells]] (antimeridian).
    */
  val RadiusNeighborhood: Seq[(Int, Int)] =
    for (dLat <- -1 to 1; dLon <- -2 to 2) yield (dLat, dLon)

  /** Wrap a lon cell id into [-30, 29] after an offset. */
  def wrapLonCell(c: Column): Column =
    pmod(c + lit(LonCells / 2), lit(LonCells)) - lit(LonCells / 2)
}
