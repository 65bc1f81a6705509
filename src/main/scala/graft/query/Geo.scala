package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ingest.Tables

/**
 * Kibana Maps / ES geo query surface: `geohash_grid` aggregation (the
 * map's cell-density layer), `geo_bounding_box` filtering, and
 * `geo_distance`-style nearest-k — re-expressed over integer
 * MICRO-DEGREE coordinates so every figure is exact and cross-engine.
 *
 * The fixture has no geo columns, so coordinates derive from the pinned
 * md5-32 closed form over the customer key ('lat:'/'lon:' salts) — the
 * same derived-fixture discipline as x72's snapshot or x86's partial
 * copies; the DuckDB oracle rebuilds the identical points.
 *
 * Geohash cells are computed from FIRST PRINCIPLES: 10 quantized bits
 * per axis, bit-interleaved (lon first — the geohash standard) into a
 * 20-bit cell id, base32-encoded with the geohash alphabet. All integer
 * shifts/masks — no trig, no doubles — so precision-4 cells match any
 * standard geohash implementation on the same points.
 *
 * Distance ranking uses the squared equirectangular proxy (dlat^2 +
 * dlon^2 in micro-degrees, exact BIGINT): monotone with true distance
 * at city scale and free of cross-engine libm trig, documented as the
 * sort key the ES `geo_distance` sort plays here.
 *
 * Scale: the grid agg is one map-side-combinable aggregation into the
 * bounded cell domain; the bbox filter is two range predicates that
 * push to the scan; nearest-k is a TakeOrderedAndProject top-k.
 */
object Geo {

  private val Alpha = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Micro-degree coordinate derivation + geohash cell, as engine-
    * shareable SQL fragments. `shift(x, i)` abstracts `shiftright` vs
    * `>>`. */
  private def latSql(custkey: String, duck: Boolean): String =
    if (duck)
      s"('0x' || substr(md5('lat:' || CAST($custkey AS VARCHAR)), 1, 8))::BIGINT % 180000001 - 90000000"
    else
      s"CAST(conv(substring(md5(concat('lat:', CAST($custkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % 180000001 - 90000000"

  private def lonSql(custkey: String, duck: Boolean): String =
    if (duck)
      s"('0x' || substr(md5('lon:' || CAST($custkey AS VARCHAR)), 1, 8))::BIGINT % 360000001 - 180000000"
    else
      s"CAST(conv(substring(md5(concat('lon:', CAST($custkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % 360000001 - 180000000"

  /** 10-bit axis quantizers (clamped at the open top edge). */
  private def lonBitsSql(duck: Boolean): String =
    s"least(((lon_u + 180000000) * 1024) ${div(duck)} 360000000, 1023)"
  private def latBitsSql(duck: Boolean): String =
    s"least(((lat_u + 90000000) * 1024) ${div(duck)} 180000000, 1023)"
  private def div(duck: Boolean): String = if (duck) "//" else "div"

  /** lon/lat bit interleave into the 20-bit geohash cell id. */
  private def cellSql(duck: Boolean): String = {
    def sh(c: String, i: Int): String =
      if (duck) s"($c >> $i)" else s"shiftright($c, $i)"
    (0 until 10).map { i =>
      s"((${sh("lonb", i)} & 1) * ${1L << (2 * i + 1)} + " +
        s"(${sh("latb", i)} & 1) * ${1L << (2 * i)})"
    }.mkString(" + ")
  }

  /** Precision-4 base32 geohash string from the 20-bit cell. */
  private def geohashSql(duck: Boolean): String = {
    def sh(i: Int): String = if (duck) s"(cell >> $i)" else s"shiftright(cell, $i)"
    val f = if (duck) "substr" else "substring"
    Seq(15, 10, 5, 0)
      .map(i => s"$f('$Alpha', CAST((${sh(i)} & 31) + 1 AS INT), 1)")
      .mkString(" || ")
  }

  /** The derived geo-point table as a DataFrame (Spark side). */
  private def geoPoints(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("lat_u", expr(latSql("c_custkey", duck = false)))
      .withColumn("lon_u", expr(lonSql("c_custkey", duck = false)))

  private def withGeohash(points: DataFrame): DataFrame = {
    val chars = Seq(15, 10, 5, 0).map(i =>
      s"substring('$Alpha', CAST((shiftright(cell, $i) & 31) + 1 AS INT), 1)")
    points
      .withColumn("lonb", expr(lonBitsSql(duck = false)))
      .withColumn("latb", expr(latBitsSql(duck = false)))
      .withColumn("cell", expr(cellSql(duck = false)))
      .withColumn("geohash4", expr(chars.mkString("concat(", ", ", ")")))
  }

  /** The shared oracle prefix: the identical derived points in DuckDB. */
  private def geoCte: String =
    s"""geo AS (
       |  SELECT c_custkey, c_acctbal,
       |    ${latSql("c_custkey", duck = true)} AS lat_u,
       |    ${lonSql("c_custkey", duck = true)} AS lon_u
       |  FROM customer),
       |cells AS (
       |  SELECT *, ${cellSql(duck = true)} AS cell FROM (
       |    SELECT *, ${lonBitsSql(duck = true)} AS lonb,
       |              ${latBitsSql(duck = true)} AS latb
       |    FROM geo)),
       |hashed AS (
       |  SELECT *, ${geohashSql(duck = true)} AS geohash4 FROM cells)""".stripMargin

  /** Full per-customer point + geohash frame (spec replay surface). */
  private[graft] def pointsWithGeohash(spark: SparkSession,
      dir: String): DataFrame = withGeohash(geoPoints(spark, dir))

  /** kq59 — geohash_grid: precision-4 cell densities (top-15 cells by
    * customer count with exact cent balances). */
  def geoGrid(spark: SparkSession, dir: String): DataFrame =
    withGeohash(geoPoints(spark, dir))
      .groupBy(col("geohash4"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast(DecimalType(18, 2)).multiply(lit(100))
          .cast("long")).cast("long").as("sum_bal_cents"))
      .orderBy(col("n_customers").desc, col("geohash4"))
      .limit(15)

  def geoGridOracle: String =
    s"""WITH $geoCte
       |SELECT geohash4, CAST(count(*) AS BIGINT) AS n_customers,
       |  CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
       |       AS BIGINT) AS sum_bal_cents
       |FROM hashed GROUP BY 1
       |ORDER BY n_customers DESC, geohash4 LIMIT 15""".stripMargin

  // ---- kq107: ES geotile_grid — slippy-map z/x/y Web-Mercator tiles ----

  private val Zoom = 6
  private val NTiles = 1 << Zoom

  /** Web-Mercator y-tile boundary latitudes at [[Zoom]], integer
    * micro-degrees, k = 1 .. 2^z − 1: lat_k = atan(sinh(π(1 − 2k/2^z))).
    * The trig runs ONCE here on the driver; BOTH engines receive the
    * identical literals, so tile assignment is exact integer comparison —
    * no cross-engine libm, the package's trig-free discipline applied to
    * the one projection that genuinely needs transcendentals. */
  private[graft] val YBounds: Seq[Long] = (1 until NTiles).map { k =>
    math.round(math.toDegrees(
      math.atan(math.sinh(math.Pi * (1.0 - 2.0 * k / NTiles)))) * 1e6)
  }

  /** x tile: pure integer floor division; lon = +180° lands on tile 2^z
    * and clamps back to 2^z − 1 (the antimeridian seam). */
  private def txSql(duck: Boolean): String =
    s"least(((lon_u + 180000000) * $NTiles) ${div(duck)} 360000000, " +
      s"${NTiles - 1})"

  /** y tile = how many Mercator boundaries lie at-or-above the point
    * (count of B_k ≥ lat): 0 for the arctic cap above B_1 and 2^z − 1
    * for the antarctic cap below B_{2^z−1} — ES's ±85.05° pole clamp
    * falls out of the count with no special case. A lat exactly ON a
    * boundary counts it, matching floor() of the continuous tile
    * coordinate. Engine-shared SQL: plain CASE sums. */
  private def tySql: String =
    YBounds.map(b => s"(CASE WHEN lat_u <= $b THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Attaches tx/ty/tile ("z/x/y") to any frame with lat_u/lon_u
    * micro-degree columns (spec replay surface for the clamp pins). */
  private[graft] def withGeotile(points: DataFrame): DataFrame =
    points
      .withColumn("tx", expr(txSql(duck = false)).cast("long"))
      .withColumn("ty", expr(tySql).cast("long"))
      .withColumn("tile", concat_ws("/", lit(Zoom.toString),
        col("tx").cast("string"), col("ty").cast("string")))

  private[graft] def pointsWithGeotile(spark: SparkSession,
      dir: String): DataFrame = withGeotile(geoPoints(spark, dir))

  /** kq107 — ES `geotile_grid`: the Kibana Maps bucket agg that keys
    * cells by slippy-map tiles ("z/x/y", Web Mercator) instead of
    * geohashes — the layer the map actually renders at a given zoom.
    * Same 100 TB shape as kq59: one map-side-combinable aggregation
    * into the bounded tile domain (≤ 4^z cells), top-20 by density. */
  def geotileGrid(spark: SparkSession, dir: String): DataFrame =
    withGeotile(geoPoints(spark, dir))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast(DecimalType(18, 2)).multiply(lit(100))
          .cast("long")).cast("long").as("sum_bal_cents"))
      .orderBy(col("n_customers").desc, col("tile"))
      .limit(20)

  def geotileGridOracle: String =
    s"""WITH $geoCte,
       |tiles AS (
       |  SELECT *, CAST($Zoom AS VARCHAR) || '/' ||
       |    CAST(${txSql(duck = true)} AS VARCHAR) || '/' ||
       |    CAST($tySql AS VARCHAR) AS tile
       |  FROM geo)
       |SELECT tile, CAST(count(*) AS BIGINT) AS n_customers,
       |  CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
       |       AS BIGINT) AS sum_bal_cents
       |FROM tiles GROUP BY 1
       |ORDER BY n_customers DESC, tile LIMIT 20""".stripMargin

  /** The demo viewport (micro-degrees) and query point (Paris). */
  private val LatLo = 10000000L
  private val LatHi = 60000000L
  private val LonLo = -30000000L
  private val LonHi = 40000000L
  private val QLat = 48856600L
  private val QLon = 2352200L

  /** Per-event derived movement point + the kq60 viewport as an
    * inside-fence flag (Spark side of the kq109 geofence input; events
    * use the EVENT-id salt — a movement track, as kq99). */
  private[graft] def eventFenceFrame(spark: SparkSession,
      dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("lat_u", expr(latSql("event_id", duck = false)))
      .withColumn("lon_u", expr(lonSql("event_id", duck = false)))
      .withColumn("inside",
        col("lat_u").between(LatLo, LatHi) &&
          col("lon_u").between(LonLo, LonHi))

  /** DuckDB replay of [[eventFenceFrame]] (user_id, event_id, us,
    * inside) — the kq109 oracle's base CTE body. */
  private[graft] def eventFenceSql: String =
    s"""SELECT user_id, event_id, epoch_us(ts) AS us,
       |  (${latSql("event_id", duck = true)} BETWEEN $LatLo AND $LatHi)
       |  AND (${lonSql("event_id", duck = true)}
       |       BETWEEN $LonLo AND $LonHi) AS inside
       |FROM events""".stripMargin

  // ---- kq110/kq111: ES `geo_shape` — polygon filter, exact integer ----

  /** The frozen fence polygon, (lon_u, lat_u) micro-degree vertices in
    * ring order — deliberately CONCAVE (the notch at (7e6, 48e6) pulls
    * the top edge inward) so the even-odd rule is genuinely exercised:
    * a point can sit inside the bounding box yet outside the shape.
    * Kibana Maps' draw-a-polygon filter (ES `geo_shape` intersects)
    * plays this role over the discover surface
    * (reference capability: `attachments/discover.png`). */
  private[graft] val Polygon: Seq[(Long, Long)] = Seq(
    (-10000000L, 35000000L), // SW
    (25000000L, 35000000L),  // SE
    (25000000L, 60000000L),  // NE
    (7000000L, 48000000L),   // concave notch
    (-10000000L, 60000000L)) // NW

  /** Even-odd ray casting as ONE engine-shared SQL fragment over
    * `lat_u`/`lon_u`: for each non-horizontal edge, the ray east from
    * the point crosses iff the edge straddles the point's latitude
    * half-open (`(y1 > lat) <> (y2 > lat)` — each vertex belongs to
    * exactly one of its two edges, so a ray through a vertex never
    * double-counts) and the point is strictly west of the edge's
    * crossing. The west test clears the division by dy with the sign
    * FOLDED AT GENERATION TIME (vertices are driver literals, so the
    * inequality direction is baked per edge): exact BIGINT
    * cross-products, no doubles, no libm — the kq107 literal
    * discipline. |coord diff| ≤ 3.6e8 and |dy| ≤ 2.5e7 keep every
    * product < 1e16, far inside int64 on both engines. */
  private[graft] def polygonInsideSql: String =
    ringTerms(Polygon).mkString("((", " + ", ") % 2 = 1)")

  /** One ring's crossing-count terms (the generated fragment shared by
    * the single-ring [[polygonInsideSql]] and the multi-ring
    * [[multiPolygonInsideSql]]). */
  private def ringTerms(ring: Seq[(Long, Long)]): Seq[String] = {
    val edges = ring.zip(ring.tail :+ ring.head)
    edges.flatMap { case ((x1, y1), (x2, y2)) =>
      if (y1 == y2) None // horizontal edge: never a half-open crossing
      else {
        val dy = y2 - y1
        val dx = x2 - x1
        val cmp = if (dy > 0) "<" else ">"
        Some(s"(CASE WHEN (($y1 > lat_u) <> ($y2 > lat_u)) AND " +
          s"(lon_u - ($x1)) * ($dy) $cmp (lat_u - ($y1)) * ($dx) " +
          "THEN 1 ELSE 0 END)")
      }
    }
  }

  /** The frozen MULTIPOLYGON-with-hole (GeoJSON `MultiPolygon`
    * semantics, ES `geo_shape`): ring 1 is [[Polygon]] (the kq110
    * concave outer), ring 2 a HOLE fully inside it (below the notch),
    * ring 3 a disjoint second outer east of ring 1. The even-odd rule
    * needs NO ring-role bookkeeping — crossings over the union of all
    * rings are odd exactly inside (outer₁ \\ hole) ∪ outer₂: a point in
    * the hole crosses both ring 1 and ring 2 an odd number of times
    * (even total → outside), a point in outer₂ crosses only ring 3 —
    * which is why hole support is free once the ray caster sums rings. */
  private[graft] val MultiPolygon: Seq[Seq[(Long, Long)]] = Seq(
    Polygon,
    Seq( // hole inside Polygon, fully below the concave notch
      (-5000000L, 40000000L), (5000000L, 40000000L),
      (5000000L, 45000000L), (-5000000L, 45000000L)),
    Seq( // disjoint second outer: a triangle east of Polygon
      (30000000L, 20000000L), (38000000L, 20000000L),
      (34000000L, 30000000L)))

  /** Even-odd over the UNION of [[MultiPolygon]]'s rings — the same
    * generation-time sign-folded integer rule as [[polygonInsideSql]],
    * one summed crossing count. */
  private[graft] def multiPolygonInsideSql: String =
    MultiPolygon.flatMap(ringTerms).mkString("((", " + ", ") % 2 = 1)")

  /** kq113 — ES `geo_shape` MULTIPOLYGON-with-hole filter: customers
    * whose derived point falls inside [[MultiPolygon]] (outer₁ minus
    * its hole, plus the disjoint outer₂) by the even-odd rule over the
    * union of rings. Same plan shape as kq110: one per-row integer
    * predicate, map-only, codegen'd — hole rings and extra polygons
    * only lengthen the crossing sum, they add no join, no shuffle, no
    * doubles. */
  def geoMultiPolygon(spark: SparkSession, dir: String): DataFrame =
    geoPoints(spark, dir)
      .where(expr(multiPolygonInsideSql))
      .select(col("c_custkey"), col("lat_u"), col("lon_u"))
      .orderBy(col("c_custkey"))

  def geoMultiPolygonOracle: String =
    s"""WITH $geoCte
       |SELECT c_custkey, lat_u, lon_u FROM geo
       |WHERE $multiPolygonInsideSql
       |ORDER BY c_custkey""".stripMargin

  /** kq110 — ES `geo_shape` polygon filter: the customers whose derived
    * point falls inside [[Polygon]] by the even-odd rule. The predicate
    * is a per-row integer expression — map-only, pushes past nothing
    * because it needs nothing: at 100 TB it is one codegen'd scan with
    * the same cost as the kq60 bbox, for an arbitrary polygon. Output
    * is every inside customer (ordered), plus the flag's two inputs so
    * the oracle pins the derived points too. */
  def geoPolygon(spark: SparkSession, dir: String): DataFrame =
    geoPoints(spark, dir)
      .where(expr(polygonInsideSql))
      .select(col("c_custkey"), col("lat_u"), col("lon_u"))
      .orderBy(col("c_custkey"))

  def geoPolygonOracle: String =
    s"""WITH $geoCte
       |SELECT c_custkey, lat_u, lon_u FROM geo
       |WHERE $polygonInsideSql
       |ORDER BY c_custkey""".stripMargin

  /** Per-event derived movement point + the polygon-inside flag: the
    * kq111 streaming fence input (events use the EVENT-id salt, a
    * movement track — same frame shape as [[eventFenceFrame]], fence
    * swapped from the kq60 bbox to [[Polygon]]). */
  private[graft] def eventPolygonFrame(spark: SparkSession,
      dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("lat_u", expr(latSql("event_id", duck = false)))
      .withColumn("lon_u", expr(lonSql("event_id", duck = false)))
      .withColumn("inside", expr(polygonInsideSql))

  /** DuckDB replay of [[eventPolygonFrame]] (user_id, event_id, us,
    * inside) — the kq111 oracle's base CTE body. */
  private[graft] def eventPolygonSql: String =
    s"""SELECT user_id, event_id, us, $polygonInsideSql AS inside
       |FROM (SELECT user_id, event_id, epoch_us(ts) AS us,
       |        ${latSql("event_id", duck = true)} AS lat_u,
       |        ${lonSql("event_id", duck = true)} AS lon_u
       |      FROM events)""".stripMargin

  /** kq60 — geo_bounding_box + geo_distance sort: the 10 customers
    * nearest the query point inside the viewport, ranked by the exact
    * integer squared-equirectangular proxy. */
  def geoDistance(spark: SparkSession, dir: String): DataFrame =
    geoPoints(spark, dir)
      .where(col("lat_u").between(LatLo, LatHi) &&
        col("lon_u").between(LonLo, LonHi))
      .withColumn("d2",
        (col("lat_u") - QLat) * (col("lat_u") - QLat) +
          (col("lon_u") - QLon) * (col("lon_u") - QLon))
      .select(col("c_custkey"), col("lat_u"), col("lon_u"), col("d2"))
      .orderBy(col("d2"), col("c_custkey"))
      .limit(10)

  def geoDistanceOracle: String =
    s"""WITH $geoCte
       |SELECT c_custkey, lat_u, lon_u,
       |  (lat_u - $QLat) * (lat_u - $QLat)
       |    + (lon_u - $QLon) * (lon_u - $QLon) AS d2
       |FROM geo
       |WHERE lat_u BETWEEN $LatLo AND $LatHi
       |  AND lon_u BETWEEN $LonLo AND $LonHi
       |ORDER BY d2, c_custkey LIMIT 10""".stripMargin

  /** Truncate-toward-zero integer division both engines agree on: the
    * numerator is sign-split so each floor-division sees a POSITIVE
    * numerator (Spark `div` and DuckDB `//` differ on negatives). */
  private def tzDiv(num: String, den: String, duck: Boolean): String = {
    val d = div(duck)
    s"(CASE WHEN $num >= 0 THEN ($num) $d ($den) " +
      s"ELSE -((-($num)) $d ($den)) END)"
  }

  /** kq82 — ES `geo_centroid` + `geo_bounds` per geohash cell: the two
    * map-layer metric aggregations Kibana draws cell markers and
    * envelopes from. Centroids are exact integer micro-degrees
    * (sign-split truncating division, so both engines agree on
    * southern/western cells); bounds are min/max integers. One
    * map-side-combinable aggregation into the bounded cell domain —
    * the same 100 TB shape as kq59's density grid. Top-20 cells by
    * population with the geohash tiebreak. */
  def geoCentroidBounds(spark: SparkSession, dir: String): DataFrame =
    withGeohash(geoPoints(spark, dir))
      .groupBy(col("geohash4"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("lat_u")).as("slat"), sum(col("lon_u")).as("slon"),
        min(col("lat_u")).as("lat_min"), max(col("lat_u")).as("lat_max"),
        min(col("lon_u")).as("lon_min"), max(col("lon_u")).as("lon_max"))
      .select(col("geohash4"), col("n_customers"),
        expr(tzDiv("slat", "n_customers", duck = false)).as("cent_lat_u"),
        expr(tzDiv("slon", "n_customers", duck = false)).as("cent_lon_u"),
        col("lat_min"), col("lat_max"), col("lon_min"), col("lon_max"))
      .orderBy(col("n_customers").desc, col("geohash4"))
      .limit(20)

  def geoCentroidBoundsOracle: String =
    s"""WITH $geoCte,
       |agg AS (
       |  SELECT geohash4, CAST(count(*) AS BIGINT) AS n_customers,
       |    CAST(sum(lat_u) AS BIGINT) AS slat,
       |    CAST(sum(lon_u) AS BIGINT) AS slon,
       |    min(lat_u) AS lat_min, max(lat_u) AS lat_max,
       |    min(lon_u) AS lon_min, max(lon_u) AS lon_max
       |  FROM hashed GROUP BY 1)
       |SELECT geohash4, n_customers,
       |  ${tzDiv("slat", "n_customers", duck = true)} AS cent_lat_u,
       |  ${tzDiv("slon", "n_customers", duck = true)} AS cent_lon_u,
       |  lat_min, lat_max, lon_min, lon_max
       |FROM agg ORDER BY n_customers DESC, geohash4 LIMIT 20""".stripMargin

  /** kq99 — ES `geo_line`: per track key (user), the first `k` points
    * in (ts, event_id) order joined into a LINESTRING-style
    * "lon lat;lon lat;…" string, plus the kept/total point counts —
    * Kibana Maps' track layer. Event points derive from the pinned
    * md5-32 closed form over the EVENT id ('lat:'/'lon:' salts: a
    * movement track, not the per-customer home point). The track
    * assembles from `array_sort(struct(rn, pt))` — collect order is
    * never relied on — and the per-user truncation is the bounded
    * window top-k, so state per track is k points at any scale,
    * exactly ES's `size` bound. */
  def geoLine(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("lat_u", expr(latSql("event_id", duck = false)))
      .withColumn("lon_u", expr(lonSql("event_id", duck = false)))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .withColumn("n_events",
        count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .where(col("rn") <= k)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_points"),
        first(col("n_events")).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col("rn"),
            concat_ws(" ", col("lon_u"), col("lat_u")).as("pt")))),
          x => x.getField("pt")), ";").as("track"))
      .orderBy(col("user_id"))
  }

  /** Oracle for [[geoLine]] — k interpolated so both sides always agree. */
  def geoLineOracle(k: Int = 5): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, ts,
       |    ${latSql("event_id", duck = true)} AS lat_u,
       |    ${lonSql("event_id", duck = true)} AS lon_u
       |  FROM events),
       |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id) AS rn,
       |      count(*) OVER (PARTITION BY user_id) AS n_events
       |      FROM e)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
       |  CAST(first(n_events) AS BIGINT) AS n_events,
       |  string_agg(concat(lon_u, ' ', lat_u), ';' ORDER BY rn) AS track
       |FROM r WHERE rn <= $k GROUP BY user_id
       |ORDER BY user_id""".stripMargin
}
