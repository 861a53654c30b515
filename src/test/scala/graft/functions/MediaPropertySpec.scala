package graft.functions

import org.scalacheck.{Arbitrary, Gen, Prop, Properties}

/** Property checks for the media header parsers: parseMedia must be a
  * TOTAL function over arbitrary bytes (one corrupt blob in 100 TB must
  * degrade to an `unknown` row, never crash a decode task — the contract
  * the round-11 Long-bounds fix restored), and every synth container must
  * round-trip its fields exactly through the parser. */
object MediaPropertySpec extends Properties("Multimodal.parseMedia") {
  import Prop.forAll

  private val bytes: Gen[Array[Byte]] =
    Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray)

  // valid container prefixes followed by garbage — hits the chunk walks
  // with plausible-but-corrupt interiors, not just random noise
  private val riffish: Gen[Array[Byte]] = for {
    form <- Gen.oneOf("AVI ", "WAVE")
    size <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    tail <- Gen.listOf(Arbitrary.arbitrary[Byte])
  } yield "RIFF".getBytes("US-ASCII") ++
    Array((size & 0xff).toByte, ((size >> 8) & 0xff).toByte,
      ((size >> 16) & 0xff).toByte, ((size >> 24) & 0xff).toByte) ++
    form.getBytes("US-ASCII") ++ tail.toArray

  private def parses(b: Array[Byte]): Boolean = {
    val m = Multimodal.parseMedia(1L, b)
    m.format != null && m.checksum == Multimodal.fnv64(b)
  }

  property("total over arbitrary bytes") = forAll(bytes)(parses)

  property("total over corrupt RIFF interiors") = forAll(riffish)(parses)

  property("total over truncated valid containers") =
    forAll(Gen.chooseNum(1L, 5000L), Gen.chooseNum(0, 80)) { (id, n) =>
      val full = Multimodal.mediaFixture(id, id * 31 % 997)
      parses(full.take(n min full.length))
    }

  property("synth PNG/JPEG/GIF/AVI round-trip their dimension fields") =
    forAll(Gen.chooseNum(1, 4000), Gen.chooseNum(1, 4000),
        Gen.chooseNum(1, 29), Gen.chooseNum(1, 500)) { (w, h, com, fr) =>
      val png = Multimodal.parseMedia(1L, Multimodal.synthPng(w, h))
      val jpg = Multimodal.parseMedia(2L, Multimodal.synthJpeg(w, h, com))
      val gif = Multimodal.parseMedia(3L,
        Multimodal.synthGif(w min 65535, h min 65535))
      val avi = Multimodal.parseMedia(4L, Multimodal.synthAvi(w, h, fr))
      png.format == "png" && png.width == w && png.height == h &&
        jpg.format == "jpeg" && jpg.width == w && jpg.height == h &&
        gif.format == "gif" && gif.width == (w min 65535) &&
        gif.height == (h min 65535) &&
        avi.format == "avi" && avi.width == w && avi.height == h &&
        avi.frames == fr
    }

  property("synth WAV round-trips rate/channels/frames") =
    forAll(Gen.chooseNum(1000, 192000), Gen.chooseNum(1, 8),
        Gen.chooseNum(0, 2000)) { (rate, ch, fr) =>
      val m = Multimodal.parseMedia(5L, Multimodal.synthWav(rate, ch, 16, fr))
      m.format == "wav" && m.width == rate && m.height == ch && m.frames == fr
    }

  property("synth MP3 round-trips rate/channels/frame count") =
    forAll(Gen.chooseNum(0, 2), Gen.oneOf(true, false),
        Gen.chooseNum(1, 64), Gen.chooseNum(0, 127)) { (sr, stereo, fr, pad) =>
      val m = Multimodal.parseMedia(6L, Multimodal.synthMp3(sr, stereo, fr, pad))
      m.format == "mp3" &&
        m.width == Array(44100, 48000, 32000)(sr) &&
        m.height == (if (stereo) 2 else 1) && m.frames == fr
    }

  property("synth BMP round-trips dims; negative height reports magnitude") =
    forAll(Gen.chooseNum(1, 30000), Gen.chooseNum(1, 30000),
        Gen.oneOf(true, false)) { (w, h, topDown) =>
      val m = Multimodal.parseMedia(7L,
        Multimodal.synthBmp(w, if (topDown) -h else h))
      m.format == "bmp" && m.width == w && m.height == h && m.frames == 1
    }

  property("synth FLAC round-trips rate/channels/samples from packed bitfields") =
    forAll(Gen.chooseNum(1, 1048575), Gen.chooseNum(1, 8),
        Gen.chooseNum(0L, 68719476735L)) { (rate, ch, total) =>
      val m = Multimodal.parseMedia(9L, Multimodal.synthFlac(rate, ch, total))
      m.format == "flac" && m.width == rate && m.height == ch &&
        m.frames == math.min(total, Int.MaxValue.toLong).toInt
    }

  property("synth TIFF round-trips dims in both byte orders and value types") =
    forAll(Gen.chooseNum(1, 65535), Gen.chooseNum(1, 65535),
        Gen.oneOf(true, false), Gen.oneOf(true, false)) { (w, h, little, short) =>
      val m = Multimodal.parseMedia(10L, Multimodal.synthTiff(w, h, little, short))
      m.format == "tiff" && m.width == w && m.height == h
    }

  property("total over truncated FLAC/TIFF") =
    forAll(Gen.chooseNum(0, 50), Gen.oneOf(true, false)) { (cut, little) =>
      val flac = Multimodal.synthFlac(44100, 2, 1000L)
      val tiff = Multimodal.synthTiff(100, 100, little, useShort = true)
      parses(flac.take(cut min flac.length)) && parses(tiff.take(cut min tiff.length))
    }

  // truncated/corrupt MP3 and BMP variants must degrade, not crash or
  // miscount — the walk only counts hops that land on real sync words
  property("total over truncated MP3/BMP and mid-stream corruption") =
    forAll(Gen.chooseNum(0, 600), Gen.chooseNum(1, 8)) { (cut, fr) =>
      val mp3 = Multimodal.synthMp3(0, stereo = true, fr, 11)
      val bmp = Multimodal.synthBmp(100, 100)
      val cutMp3 = mp3.take(cut min mp3.length)
      // id3(10+11) + one 417-byte frame → 2nd frame's sync sits at 438;
      // zeroing it must truncate the count at 1, not crash or overcount
      val broken = mp3.clone()
      val secondSync = 21 + 417
      if (broken.length > secondSync) broken(secondSync) = 0
      parses(cutMp3) && parses(bmp.take(cut min bmp.length)) && {
        val m = Multimodal.parseMedia(8L, broken)
        if (fr >= 2) m.format == "mp3" && m.frames == 1
        else m.format == "mp3" && m.frames == fr
      }
    }

  // ---- content tier ----------------------------------------------------

  property("synthWavPcm round-trips header fields for any shape") =
    forAll(Gen.chooseNum(1, 2), Gen.chooseNum(1, 400),
      Gen.chooseNum(0L, 100000L), Gen.chooseNum(0, 7)) { (ch, frames, seed, ridx) =>
      val rate = 8000 + ridx * 1000
      val m = Multimodal.parseMedia(1L, Multimodal.synthWavPcm(rate, ch, frames, seed))
      m.format == "wav" && m.width == rate && m.height == ch && m.frames == frames
    }

  property("pcmSample stays in int16 range for fixture-shaped inputs") =
    forAll(Gen.chooseNum(0L, 1L << 31), Gen.chooseNum(0L, 1L << 20)) { (seed, j) =>
      val s = Multimodal.pcmSample(seed, j)
      s >= -32768 && s <= 32767
    }

  property("synthBmpPixels: dims round-trip; pixel bytes sit at the documented layout") =
    forAll(Gen.chooseNum(1, 40), Gen.chooseNum(1, 40),
      Gen.chooseNum(0L, 100000L)) { (w, h, seed) =>
      val b = Multimodal.synthBmpPixels(w, h, seed)
      val m = Multimodal.parseMedia(2L, b)
      val stride = (w * 3 + 3) & ~3
      val x = (seed % w).toInt; val y = (seed % h).toInt; val c = (seed % 3).toInt
      val got = b(54 + (h - 1 - y) * stride + x * 3 + c) & 0xff
      m.format == "bmp" && m.width == w && m.height == h &&
        got == Multimodal.bmpPixel(seed, x, y, c)
    }
}
