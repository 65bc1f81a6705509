package graft

import org.scalacheck.{Gen, Prop, Properties}

/**
 * Property check for kq107's geotile math: the driver-literal Mercator
 * boundary-count formulation must agree with the textbook slippy-map
 * formula (y = (1 − asinh-form/π)/2 · 2^z, floored, pole-clamped) for
 * ARBITRARY micro-degree coordinates — not just the fixture's. The two
 * can differ only for a latitude exactly equal to a rounded boundary
 * literal, where the contract is "the boundary belongs to the tile
 * below the line" (ty = the boundary's 1-based index); the generator
 * plants exact boundaries, the poles, the antimeridian on both sides,
 * and the equator alongside uniform points to pin every clamp.
 */
object GeoProps extends Properties("geotile") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.spark

  private val bounds = graft.query.Geo.YBounds
  private val bset = bounds.toSet

  private val latGen: Gen[Long] = Gen.frequency(
    6 -> Gen.choose(-90000000L, 90000000L),
    2 -> Gen.oneOf(90000000L, -90000000L, 0L, 86000000L, -86000000L,
      bounds.head + 1, bounds.last - 1),
    2 -> Gen.oneOf(bounds))
  private val lonGen: Gen[Long] = Gen.frequency(
    7 -> Gen.choose(-180000000L, 180000000L),
    3 -> Gen.oneOf(-180000000L, 180000000L, 0L, 179999999L, -179999999L))

  property("tile == textbook formula off boundaries; a boundary lat " +
      "takes the tile below the line; clamps hold everywhere") =
    Prop.forAll(Gen.listOfN(50, Gen.zip(latGen, lonGen))) { pts =>
      import spark.implicits._
      val got = graft.query.Geo.withGeotile(pts.toDF("lat_u", "lon_u"))
        .select($"lat_u", $"lon_u", $"tx", $"ty")
        .as[(Long, Long, Long, Long)].collect()
      got.forall { case (la, lo, tx, ty) =>
        val txWant = math.min(63L, (lo + 180000000L) * 64L / 360000000L)
        val tyWant =
          if (bset.contains(la)) bounds.count(_ >= la).toLong
          else {
            val latRad = math.toRadians(la / 1e6)
            val y = (1.0 - math.log(math.tan(latRad) +
              1.0 / math.cos(latRad)) / math.Pi) / 2.0 * 64
            math.max(0L, math.min(63L, math.floor(y).toLong))
          }
        tx == txWant && ty == tyWant && tx >= 0 && tx <= 63 &&
          ty >= 0 && ty <= 63
      }
    }

  // ---- kq110/kq111: polygon even-odd ray casting ----

  private val vs = graft.query.Geo.Polygon
  private val edges = vs.zip(vs.tail :+ vs.head)

  /** Exact-integer replay of the generated SQL rule (BigInt products,
    * half-open straddle, generation-time sign fold). */
  private def insideExact(lon: Long, lat: Long): Boolean =
    edges.count { case ((x1, y1), (x2, y2)) =>
      y1 != y2 && ((y1 > lat) != (y2 > lat)) && {
        val lhs = BigInt(lon - x1) * BigInt(y2 - y1)
        val rhs = BigInt(lat - y1) * BigInt(x2 - x1)
        if (y2 > y1) lhs < rhs else lhs > rhs
      }
    } % 2 == 1

  /** Textbook PNPOLY (Franklin) in doubles — the division form. */
  private def pnpoly(px: Double, py: Double): Boolean = {
    var inside = false
    var j = vs.length - 1
    for (i <- vs.indices) {
      val (xi, yi) = (vs(i)._1.toDouble, vs(i)._2.toDouble)
      val (xj, yj) = (vs(j)._1.toDouble, vs(j)._2.toDouble)
      if (((yi > py) != (yj > py)) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
      j = i
    }
    inside
  }

  /** True when every straddling edge's crossing is comfortably away
    * from the point (> 0.04 micro-degrees), so the double division in
    * [[pnpoly]] cannot flip the comparison (its error is ~3e-8 µdeg). */
  private def offKnifeEdge(lon: Long, lat: Long): Boolean =
    edges.forall { case ((x1, y1), (x2, y2)) =>
      y1 == y2 || ((y1 > lat) == (y2 > lat)) || {
        val diff = BigInt(lon - x1) * BigInt(y2 - y1) -
          BigInt(lat - y1) * BigInt(x2 - x1)
        diff.abs > 1000000
      }
    }

  private val vertexLats = vs.map(_._2)
  private val vertexLons = vs.map(_._1)
  private val polyLatGen: Gen[Long] = Gen.frequency(
    6 -> Gen.choose(30000000L, 65000000L), // dense around the shape
    2 -> Gen.choose(-90000000L, 90000000L),
    2 -> Gen.oneOf(vertexLats))
  private val polyLonGen: Gen[Long] = Gen.frequency(
    6 -> Gen.choose(-15000000L, 30000000L),
    2 -> Gen.choose(-180000000L, 180000000L),
    2 -> Gen.oneOf(vertexLons))

  property("polygon inside == exact-integer replay everywhere, == " +
      "textbook double PNPOLY off knife edges") =
    Prop.forAll(Gen.listOfN(60, Gen.zip(polyLatGen, polyLonGen))) { pts =>
      import spark.implicits._
      val got = pts.toDF("lat_u", "lon_u")
        .withColumn("inside",
          org.apache.spark.sql.functions.expr(
            graft.query.Geo.polygonInsideSql))
        .select($"lat_u", $"lon_u", $"inside")
        .as[(Long, Long, Boolean)].collect()
      got.forall { case (la, lo, in) =>
        in == insideExact(lo, la) &&
          (!offKnifeEdge(lo, la) || in == pnpoly(lo.toDouble, la.toDouble))
      }
    }

  // ---- kq113: multipolygon-with-hole even-odd over the ring union ----

  private val rings = graft.query.Geo.MultiPolygon

  /** Exact-integer replay of the multi-ring rule: crossings summed over
    * the UNION of rings, odd == inside. */
  private def insideExactMulti(lon: Long, lat: Long): Boolean =
    rings.map { r =>
      r.zip(r.tail :+ r.head).count { case ((x1, y1), (x2, y2)) =>
        y1 != y2 && ((y1 > lat) != (y2 > lat)) && {
          val lhs = BigInt(lon - x1) * BigInt(y2 - y1)
          val rhs = BigInt(lat - y1) * BigInt(x2 - x1)
          if (y2 > y1) lhs < rhs else lhs > rhs
        }
      }
    }.sum % 2 == 1

  private val multiLatGen: Gen[Long] = Gen.frequency(
    4 -> Gen.choose(30000000L, 65000000L), // around outer 1
    2 -> Gen.choose(38000000L, 47000000L), // around the hole
    2 -> Gen.choose(15000000L, 35000000L), // around the triangle
    1 -> Gen.choose(-90000000L, 90000000L),
    1 -> Gen.oneOf(rings.flatMap(_.map(_._2))))
  private val multiLonGen: Gen[Long] = Gen.frequency(
    4 -> Gen.choose(-15000000L, 30000000L),
    2 -> Gen.choose(-7000000L, 7000000L),
    2 -> Gen.choose(28000000L, 40000000L),
    1 -> Gen.choose(-180000000L, 180000000L),
    1 -> Gen.oneOf(rings.flatMap(_.map(_._1))))

  property("multipolygon inside == exact-integer replay everywhere, " +
      "and the shape == (outer1 XOR hole) OR outer2 by ring algebra") =
    Prop.forAll(Gen.listOfN(60,
        Gen.zip(multiLatGen, multiLonGen))) { pts =>
      import spark.implicits._
      val got = pts.toDF("lat_u", "lon_u")
        .withColumn("inside",
          org.apache.spark.sql.functions.expr(
            graft.query.Geo.multiPolygonInsideSql))
        .select($"lat_u", $"lon_u", $"inside")
        .as[(Long, Long, Boolean)].collect()
      def ringOdd(r: Seq[(Long, Long)], lon: Long, lat: Long): Boolean =
        r.zip(r.tail :+ r.head).count { case ((x1, y1), (x2, y2)) =>
          y1 != y2 && ((y1 > lat) != (y2 > lat)) && {
            val lhs = BigInt(lon - x1) * BigInt(y2 - y1)
            val rhs = BigInt(lat - y1) * BigInt(x2 - x1)
            if (y2 > y1) lhs < rhs else lhs > rhs
          }
        } % 2 == 1
      got.forall { case (la, lo, in) =>
        in == insideExactMulti(lo, la) &&
          in == ((ringOdd(rings(0), lo, la) ^ ringOdd(rings(1), lo, la))
            ^ ringOdd(rings(2), lo, la))
      }
    }

  property("multipolygon knife edges pinned: the hole carves its west / " +
      "south edges out and leaves its east / north edges in; the second " +
      "outer classifies like a polygon; between-shapes is out") = {
    import spark.implicits._
    // (lon_u, lat_u, expected) — hand-derived from the half-open rule
    val pins: Seq[(Long, Long, Boolean)] = Seq(
      (0L, 42000000L, false),        // hole interior: carved out
      (-5000000L, 42000000L, false), // hole WEST edge: in hole -> out
      (5000000L, 42000000L, true),   // hole EAST edge: in shape
      (0L, 40000000L, false),        // hole SOUTH edge: in hole -> out
      (0L, 45000000L, true),         // hole NORTH edge: in shape
      (0L, 47000000L, true),         // between hole top and the notch
      (30000000L, 20000000L, true),  // triangle SW vertex: in
      (34000000L, 23000000L, true),  // triangle interior: in
      (34000000L, 30000000L, false), // triangle apex: out (top excl.)
      (27000000L, 40000000L, false)) // between the two outers: out
    val got = pins.map(p => (p._2, p._1)).toDF("lat_u", "lon_u")
      .withColumn("inside", org.apache.spark.sql.functions.expr(
        graft.query.Geo.multiPolygonInsideSql))
      .select($"lon_u", $"lat_u", $"inside")
      .as[(Long, Long, Boolean)].collect().toSeq
    Prop(pins.forall { case (lo, la, want) =>
      insideExactMulti(lo, la) == want && got.contains((lo, la, want))
    }) :| s"got: $got"
  }

  property("polygon knife edges pinned: vertices, horizontal / vertical " +
      "edges, and the concave notch classify by the half-open rule") = {
    import spark.implicits._
    // (lon_u, lat_u, expected) — hand-derived from the even-odd rule:
    // west/south boundaries inclusive, east boundary exclusive, the SE
    // corner outside, the notch vertex inside, the cavity above it out
    val pins: Seq[(Long, Long, Boolean)] = Seq(
      (-10000000L, 35000000L, true),  // SW vertex: in (south+west incl.)
      (25000000L, 35000000L, false),  // SE vertex: out (east excl.)
      (0L, 35000000L, true),          // bottom horizontal edge: in
      (25000000L, 50000000L, false),  // right vertical edge: out
      (-10000000L, 50000000L, true),  // left vertical edge: in
      (7000000L, 48000000L, true),    // concave notch vertex: in
      (7000000L, 55000000L, false),   // cavity above the notch: out
      (7000000L, 40000000L, true),    // interior below the notch: in
      (25000000L, 60000000L, false),  // NE vertex: out
      (-10000000L, 60000000L, false)) // NW vertex: out (top excl.)
    val got = pins.map(p => (p._2, p._1)).toDF("lat_u", "lon_u")
      .withColumn("inside", org.apache.spark.sql.functions.expr(
        graft.query.Geo.polygonInsideSql))
      .select($"lon_u", $"lat_u", $"inside")
      .as[(Long, Long, Boolean)].collect().toSeq
    Prop(pins.forall { case (lo, la, want) =>
      insideExact(lo, la) == want &&
        got.contains((lo, la, want))
    }) :| s"got: $got"
  }
}
