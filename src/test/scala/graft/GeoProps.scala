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
}
