package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.ext.Multimodal

/**
 * Pure-JVM property checks for the multimodal codecs — no Spark, so they
 * run at ScalaCheck speed and pin the codec layer independently of the
 * plumbing: encode → decode is the identity on ARBITRARY inputs, not just
 * the closed-form fixture payloads the oracles cover.
 */
object CodecProps extends Properties("mediaCodecs") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(200)

  private val genDims: Gen[(Int, Int)] = for {
    w <- Gen.choose(1, 32)
    h <- Gen.choose(1, 32)
  } yield (w, h)

  private def genPixels(w: Int, h: Int): Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(
      Byte.MinValue, Byte.MaxValue))

  property("PPM encode→decode is identity: header round-trips, channel " +
      "sums equal direct byte sums") =
    Prop.forAll(genDims.flatMap { case (w, h) =>
      genPixels(w, h).map(px => (w, h, px))
    }) { case (w, h, px) =>
      val bytes = Multimodal.encodePpm(w, h, px)
      val (dw, dh, r, g, b) = Multimodal.ppmChannelSums(bytes)
      val ref = Array(0L, 0L, 0L)
      px.zipWithIndex.foreach { case (v, i) => ref(i % 3) += (v & 0xff) }
      dw == w && dh == h && r == ref(0) && g == ref(1) && b == ref(2)
    }

  property("PPM resize: output dims floor-halve; every output pixel is " +
      "the floor-average of its source block") =
    Prop.forAll(genDims.suchThat { case (w, h) => w >= 2 && h >= 2 }
      .flatMap { case (w, h) => genPixels(w, h).map(px => (w, h, px)) }) {
      case (w, h, px) =>
        val resized = Multimodal.resizePpmBytes(
          Multimodal.encodePpm(w, h, px), 2)
        val (ow, oh, off) = {
          val (a, b, _, o) = Multimodal.ppmHeader(resized); (a, b, o)
        }
        def src(y: Int, x: Int, c: Int): Long =
          px((y * w + x) * 3 + c) & 0xff
        ow == w / 2 && oh == h / 2 && (0 until oh).forall(by =>
          (0 until ow).forall(bx => (0 until 3).forall { c =>
            val want = (src(by * 2, bx * 2, c) + src(by * 2, bx * 2 + 1, c) +
              src(by * 2 + 1, bx * 2, c) + src(by * 2 + 1, bx * 2 + 1, c)) / 4
            (resized(off + (by * ow + bx) * 3 + c) & 0xff).toLong == want
          }))
    }

  private val genWav: Gen[(Int, Array[Int])] = for {
    nch <- Gen.choose(1, 4)
    frames <- Gen.choose(1, 128)
    samples <- Gen.containerOfN[Array, Int](frames * nch,
      Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
  } yield (nch, samples)

  property("WAV encode→decode is identity: chunk walker skips LIST, " +
      "per-channel sumSq/peak/frames equal direct sums") =
    Prop.forAll(genWav) { case (nch, interleaved) =>
      val stats = Multimodal.wavChannelSums(
        Multimodal.encodeWav(nch, interleaved))
      val frames = interleaved.length / nch
      stats.size == nch && stats.forall { case (c, fr, sq, pk) =>
        val chan = interleaved.zipWithIndex.collect {
          case (v, i) if i % nch == c => v.toLong
        }
        fr == frames && sq == chan.map(v => v * v).sum &&
          pk == (if (chan.isEmpty) 0L else chan.map(math.abs).max)
      }
    }

  private val genStream: Gen[(Int, Int, List[Array[Byte]], Int)] = for {
    (w, h) <- genDims
    nf <- Gen.choose(1, 8)
    frames <- Gen.listOfN(nf, genPixels(w, h))
    stride <- Gen.choose(1, 3)
  } yield (w, h, frames, stride)

  property("PPM-stream walk: sampled frames' sums equal direct sums of " +
      "exactly the strided frames; boundaries come from header parses") =
    Prop.forAll(genStream) { case (w, h, frames, stride) =>
      val stream = frames.map(Multimodal.encodePpm(w, h, _))
        .reduce(_ ++ _)
      val got = Multimodal.sampleFrameSums(stream, stride)
      val want = frames.zipWithIndex.filter(_._2 % stride == 0).map {
        case (px, f) =>
          val ref = Array(0L, 0L, 0L)
          px.zipWithIndex.foreach { case (v, i) => ref(i % 3) += (v & 0xff) }
          (f, w, h, ref(0), ref(1), ref(2))
      }
      got == want
    }

  property("corrupt headers are rejected, never misparsed") =
    Prop.forAll(Gen.containerOfN[Array, Byte](16,
      Gen.choose(Byte.MinValue, Byte.MaxValue))) { junk =>
      val ppm = scala.util.Try(Multimodal.ppmChannelSums(junk)).isFailure ||
        (junk.length > 2 && junk(0) == 'P' && junk(1) == '6')
      val wav = scala.util.Try(Multimodal.wavChannelSums(junk)).isFailure ||
        junk.startsWith("RIFF".getBytes("US-ASCII"))
      ppm && wav
    }

  property("WAV fingerprint: window-energy bits equal an independent " +
      "reference on arbitrary PCM (integer window map, cross-multiply)") =
    Prop.forAll(for {
      nch <- Gen.choose(1, 2)
      frames <- Gen.choose(16, 200)
      samples <- Gen.listOfN(nch * frames, Gen.choose(-1024, 1023))
    } yield (nch, frames, samples.toArray)) {
      case (nch, frames, samples) =>
        val fps = Multimodal.wavFingerprint(
          Multimodal.encodeWav(nch, samples))
        fps.length == nch && fps.forall { case (c, fr, fp) =>
          val e = Array.fill(16)(0L); val n = Array.fill(16)(0L)
          var tot = 0L
          for (s <- 0 until frames) {
            val v = samples(s * nch + c).toLong
            val w = s * 16 / frames
            e(w) += v * v; n(w) += 1; tot += v * v
          }
          var ref = 0L
          for (w <- 0 until 16)
            if (e(w) * frames > tot * n(w)) ref |= 1L << w
          fr == frames && fp == ref && n.forall(_ > 0)
        }
    }

  property("aHash: band bits equal an independent 8x8 grid reference on " +
      "arbitrary images (integer cell map, cross-multiplied threshold)") =
    Prop.forAll(genDims.suchThat { case (w, h) => w >= 8 && h >= 8 }
      .flatMap { case (w, h) => genPixels(w, h).map(px => (w, h, px)) }) {
      case (w, h, px) =>
        val (dw, dh, bands) =
          Multimodal.aHashBands(Multimodal.encodePpm(w, h, px))
        // reference: accumulate per-cell luma via the same forward map,
        // then compare means by cross-multiplication
        val s = Array.fill(64)(0L); val cnt = Array.fill(64)(0L)
        var tot = 0L
        for (p <- 0 until w * h; c <- 0 until 3) {
          val cell = ((p / w) * 8 / h) * 8 + ((p % w) * 8 / w)
          val v = (px(p * 3 + c) & 0xff).toLong
          s(cell) += v; cnt(cell) += 1; tot += v
        }
        val refBands = Array.fill(4)(0L)
        for (cell <- 0 until 64)
          if (s(cell) * (3L * w * h) > tot * cnt(cell))
            refBands(cell / 16) |= 1L << (cell % 16)
        dw == w && dh == h && bands.sameElements(refBands) &&
          cnt.forall(_ > 0) // every grid cell populated for >= 8px sides
    }

  // ---- CdcCuts: the native rolling-hash boundary scan --------------

  /** Independent reference: DIRECT per-position polynomial sum (no
    * rolling update, no ring buffer) over the codepoint array — the
    * declarative boundary scan the native one-pass must equal. */
  private def refCdcCuts(s: String, w: Int, div: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val M = 1000000007L; val B = 257L
    val pw = Array.iterate(1L, w)(p => p * B % M) // pw(j) = B^j mod M
    (w to cps.length).flatMap { i =>
      var h = 0L
      var j = 0
      while (j < w) { h = (h + cps(i - 1 - j) * pw(j)) % M; j += 1 }
      if (h % div == 0) Some(i.toLong) else None
    }
  }

  // full Unicode incl. supplementary planes (surrogate range excluded)
  private val genCodepoint: Gen[Int] = Gen.frequency(
    8 -> Gen.choose(32, 126),
    2 -> Gen.choose(0x80, 0xD7FF),
    1 -> Gen.choose(0x10000, 0x10FFFF))
  private val genText: Gen[String] =
    Gen.listOf(genCodepoint).map(cps =>
      new String(cps.toArray, 0, cps.length))

  property("simhashShingle60: native signature equals an independent " +
      "reference (hex-string parse + BigInt bit tests) on arbitrary " +
      "text and shingle widths; empty weights tie to 0") =
    Prop.forAll(genText, Gen.choose(1, 5)) { (s, k) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.unsafe.types.UTF8String
      val got = graft.functions.SimHashShingle(
          Literal(UTF8String.fromString(s),
            org.apache.spark.sql.types.StringType), k)
        .eval(null).asInstanceOf[Long]
      // reference: features via sliding(), hash via the md5 HEX STRING
      // (15 chars parsed with parseLong) — a different path than the
      // implementation's byte assembly + >>> 4
      val toks = s.split(" ", -1).toSeq
      val feats =
        (if (toks.length < k) Seq(s)
         else toks.sliding(k).map(_.mkString(" ")).toSeq).distinct
      val md = java.security.MessageDigest.getInstance("MD5")
      val w = new Array[Int](60)
      feats.foreach { f =>
        val hex = md.digest(f.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16)
        for (i <- 0 until 60)
          w(i) += (if (((h >> i) & 1L) == 1L) 1 else -1)
      }
      val ref = (0 until 60).foldLeft(0L)((acc, i) =>
        if (w(i) > 0) acc | (1L << i) else acc)
      got == ref
    }

  property("cdcCuts: native one-pass rolling hash equals the direct " +
      "per-position polynomial on arbitrary Unicode text (positions in " +
      "codepoints), cuts ascending within [w, len]") =
    Prop.forAll(genText, Gen.choose(1, 12), Gen.choose(1, 32)) {
      (s, w, div) =>
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.unsafe.types.UTF8String
        val got = graft.functions.CdcCuts(
            Literal(UTF8String.fromString(s),
              org.apache.spark.sql.types.StringType), w, div)
          .eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray().toSeq
        val ref = refCdcCuts(s, w, div)
        val nCp = s.codePoints().count()
        got == ref &&
          got.forall(i => i >= w && i <= nCp) &&
          got.sliding(2).forall(p => p.length < 2 || p(0) < p(1))
    }
}
