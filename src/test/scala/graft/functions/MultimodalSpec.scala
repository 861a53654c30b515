package graft.functions

import graft.SparkSpec

/** Anchors the real header parser against ground-truth bytes: a genuine
  * 1×1 PNG and the canonical smallest GIF89a (byte-for-byte the files any
  * encoder produces), a JPEG laid out differently from the synth fixture
  * (DQT before a progressive SOF2), and AVI spec offsets. These catch
  * endianness/offset bugs the gate oracle can't (the gate proves
  * parse ∘ synthesize = identity; this proves parse matches the format
  * specs independently of our synthesizer). */
class MultimodalSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** A real, complete 1×1 transparent PNG (RGBA, zlib IDAT, valid CRCs). */
  private val realPng = hex(
    "89504E470D0A1A0A 0000000D 49484452 00000001 00000001 0806000000 1F15C489" +
    "0000000A 49444154 789C636000000002 0001 E221BC33 00000000 49454E44 AE426082")

  /** The canonical smallest valid GIF89a: 1×1, 2-entry palette, one image. */
  private val realGif = hex(
    "474946383961 0100 0100 80 00 00 FFFFFF 000000" + // header + screen + GCT
    "21F904 01 0000 00 00" +                          // graphic control ext
    "2C 0000 0000 0100 0100 00" +                     // image descriptor 1×1
    "02 02 4401 00" +                                 // LZW data
    "3B")                                             // trailer

  test("real 1x1 PNG parses to 1x1 via IHDR big-endian fields") {
    val m = Multimodal.parseMedia(7L, realPng)
    assert(m.format == "png" && m.width == 1 && m.height == 1 && m.frames == 1)
  }

  test("canonical 1x1 GIF89a parses via little-endian screen descriptor") {
    val m = Multimodal.parseMedia(8L, realGif)
    assert(m.format == "gif" && m.width == 1 && m.height == 1)
  }

  test("JPEG marker walk finds SOF2 behind DQT (layout differs from synth)") {
    // SOI + DQT(65 bytes quant table) + SOF2 (progressive), h=45 w=123
    val dqt = Array(0xff, 0xdb).map(_.toByte) ++ Array[Byte](0, 67, 0) ++
      Array.fill(64)(1.toByte)
    val sof2 = Array(0xff, 0xc2).map(_.toByte) ++ Array[Byte](0, 11, 8) ++
      Array[Byte](0, 45, 0, 123, 1, 1, 0x11, 0)
    val bytes = Array(0xff, 0xd8).map(_.toByte) ++ dqt ++ sof2 ++
      Array(0xff, 0xd9).map(_.toByte)
    val m = Multimodal.parseMedia(9L, bytes)
    assert(m.format == "jpeg" && m.width == 123 && m.height == 45)
  }

  test("JPEG truncated before any SOF degrades to unknown, not garbage") {
    val m = Multimodal.parseMedia(1L, Array(0xff, 0xd8, 0xff, 0xe0, 0, 4, 0, 0).map(_.toByte))
    assert(m.format == "unknown" && m.width == 0)
  }

  test("AVI avih fields round-trip at AVIMAINHEADER spec offsets") {
    val m = Multimodal.parseMedia(3L, Multimodal.synthAvi(320, 240, 42))
    assert(m.format == "avi" && m.width == 320 && m.height == 240 && m.frames == 42)
  }

  test("hand-built canonical WAV parses fmt/data chunks; extra chunk skipped") {
    // 8000 Hz mono 16-bit, 3 sample frames (6 data bytes), with a LIST
    // chunk BEFORE fmt so the walk genuinely skips by size
    val hex = ("52494646" + "32000000" + "57415645" +   // RIFF size WAVE
      "4C495354" + "04000000" + "494E464F" +            // LIST(4) INFO
      "666D7420" + "10000000" +                         // fmt (16)
      "0100" + "0100" + "401F0000" + "803E0000" +       // PCM, 1ch, 8000, 16000
      "0200" + "1000" +                                 // block 2, 16 bit
      "64617461" + "06000000" + "000000000000")         // data(6)
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val m = Multimodal.parseMedia(9L, bytes)
    assert(m.format == "wav" && m.width == 8000 && m.height == 1 && m.frames == 3)
    // synth round-trip at spec offsets
    val s = Multimodal.parseMedia(10L, Multimodal.synthWav(44100, 2, 16, 480))
    assert(s.format == "wav" && s.width == 44100 && s.height == 2 && s.frames == 480)
    // truncated mid-header degrades to unknown, never garbage
    val t = Multimodal.parseMedia(11L, bytes.take(20))
    assert(t.format == "unknown" && t.frames == 0)
  }

  test("hand-built MP3: padded frame + ID3v2 skip, at ISO 11172-3 offsets") {
    // one Layer III frame, 128 kbps @ 44100, PADDING bit set (synthMp3
    // never sets it): frame length = 144·128000/44100 + 1 = 418
    val hdr = Array(0xff, 0xfb, 0x92, 0x00).map(_.toByte) // br=9 sr=0 pad=1, stereo
    val frame = hdr ++ Array.fill(414)(0.toByte)
    val m = Multimodal.parseMedia(1L, frame ++ frame)
    assert(m.format == "mp3" && m.width == 44100 && m.height == 2 && m.frames == 2)
    // ID3v2 with syncsafe size 0x81 (= 0x01 0x01 across 7-bit bytes)
    val id3 = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 0, 1, 1) ++
      Array.fill(129)(0.toByte)
    val t = Multimodal.parseMedia(2L, id3 ++ frame)
    assert(t.format == "mp3" && t.frames == 1)
    // free/bad bitrate index (0) degrades to unknown
    val bad = Array(0xff, 0xfb, 0x02, 0x00).map(_.toByte) ++ Array.fill(100)(0.toByte)
    assert(Multimodal.parseMedia(3L, bad).format == "unknown")
  }

  test("hand-built BMP: INFOHEADER and CORE header dims at spec offsets") {
    def le32b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)
    def le16b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val fileHdr = "BM".getBytes("US-ASCII") ++ le32b(54) ++ le32b(0) ++ le32b(54)
    val info = fileHdr ++ le32b(40) ++ le32b(640) ++ le32b(-480) ++
      le16b(1) ++ le16b(24) ++ Array.fill(24)(0.toByte)
    val m = Multimodal.parseMedia(4L, info)
    assert(m.format == "bmp" && m.width == 640 && m.height == 480) // |top-down|
    // ancient BITMAPCOREHEADER: biSize=12, le16 dims at 18/20
    val core = fileHdr ++ le32b(12) ++ le16b(320) ++ le16b(200) ++
      le16b(1) ++ le16b(8)
    val c = Multimodal.parseMedia(5L, core)
    assert(c.format == "bmp" && c.width == 320 && c.height == 200)
    // 'BM' magic but truncated before the dims → unknown
    assert(Multimodal.parseMedia(6L, info.take(20)).format == "unknown")
  }

  test("frameSamplePlan: unknown-format rows (frames=0) yield EMPTY index arrays") {
    import spark.implicits._
    val decoded = Seq(
      Multimodal.DecodedMedia(1L, "avi", 10, 10, 9, 0L),
      Multimodal.DecodedMedia(2L, "unknown", 0, 0, 0, 0L) // degrade path
    ).toDS()
    val out = Multimodal.frameSamplePlan(decoded, 4)
      .select("id", "frame_idx").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(out(1L) === Seq(0, 4, 8))
    assert(out(2L) === Seq.empty) // sequence(0,-1,4) would have thrown
  }

  test("corrupt RIFF chunk sizes near 2^31 degrade to unknown, never crash") {
    // chunk size 0x7FFFFFF0 would overflow Int bounds math and wrap pos
    // negative — the walk must treat it as out-of-bounds and give up
    def le32b(v: Long) = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val asciiB = (s: String) => s.getBytes("US-ASCII")
    val evilWav = asciiB("RIFF") ++ le32b(0x7ffffff0L) ++ asciiB("WAVE") ++
      asciiB("LIST") ++ le32b(0x7ffffff0L) ++ Array.fill(16)(0.toByte)
    val w = Multimodal.parseMedia(1L, evilWav)
    assert(w.format == "unknown" && w.frames == 0)
    val evilAvi = asciiB("RIFF") ++ le32b(0x7ffffff0L) ++ asciiB("AVI ") ++
      asciiB("LIST") ++ le32b(0x7ffffff0L) ++ Array.fill(16)(0.toByte)
    val a = Multimodal.parseMedia(2L, evilAvi)
    assert(a.format == "unknown" && a.frames == 0)
  }

  test("hand-built ISO-BMFF: mvhd/tkhd at 14496-12 offsets; corrupt sizes degrade") {
    // hand-assembled (not via synthMp4): ftyp + moov{mvhd(ts=1000,
    // dur=42) + trak{tkhd w=320 h=240}} — anchors the box offsets
    // independently of the synthesizer
    def be32b(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val asciiB = (s: String) => s.getBytes("US-ASCII")
    val ftyp = be32b(16) ++ asciiB("ftyp") ++ asciiB("isom") ++ be32b(0)
    val mvhd = be32b(108) ++ asciiB("mvhd") ++ be32b(0) ++ be32b(0) ++ be32b(0) ++
      be32b(1000) ++ be32b(42) ++ Array.fill(108 - 28)(0.toByte)
    val tkhd = be32b(92) ++ asciiB("tkhd") ++ Array.fill(84 - 8)(0.toByte) ++
      be32b(320L << 16) ++ be32b(240L << 16)
    val trak = be32b(100) ++ asciiB("trak") ++ tkhd
    val moov = be32b(8 + 108 + 100) ++ asciiB("moov") ++ mvhd ++ trak
    val m = Multimodal.parseMedia(9L, ftyp ++ moov)
    assert(m.format == "mp4" && m.width == 320 && m.height == 240 && m.frames == 42)
    // corrupt: moov size past the buffer → degrade to unknown, no crash
    val evil = ftyp ++ be32b(0x7ffffff0L) ++ asciiB("moov") ++ Array.fill(8)(0.toByte)
    val e = Multimodal.parseMedia(10L, evil)
    assert(e.format == "unknown" && e.frames == 0)
    // fixture round-trips per the documented formulas
    for (docId <- 0L to 5L; nChars <- Seq(7L, 2001L)) {
      val f = Multimodal.parseMedia(docId, Multimodal.mp4Fixture(docId, nChars))
      assert(f.format == "mp4" && f.width == 16 + nChars % 1920 &&
        f.height == 16 + (docId * 9) % 1080 && f.frames == 1 + docId % 240)
    }
  }

  test("hand-built WEBP/VP8X parses 24-bit LE dims; corrupt chunk degrades") {
    def le32b(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val asciiB = (s: String) => s.getBytes("US-ASCII")
    // canvas 70000×300: exercises the third width byte (70000 > 2^16)
    val vp8x = asciiB("VP8X") ++ le32b(10) ++ Array(0.toByte) ++
      Array.fill(3)(0.toByte) ++
      Array((69999 & 0xff).toByte, ((69999 >> 8) & 0xff).toByte,
        ((69999 >> 16) & 0xff).toByte) ++
      Array((299 & 0xff).toByte, ((299 >> 8) & 0xff).toByte, 0.toByte)
    val m = Multimodal.parseMedia(11L,
      asciiB("RIFF") ++ le32b(4 + vp8x.length) ++ asciiB("WEBP") ++ vp8x)
    assert(m.format == "webp" && m.width == 70000 && m.height == 300)
    val evil = asciiB("RIFF") ++ le32b(0x7ffffff0L) ++ asciiB("WEBP") ++
      asciiB("VP8X") ++ le32b(0x7ffffff0L) ++ Array.fill(10)(0.toByte)
    assert(Multimodal.parseMedia(12L, evil).format == "unknown")
    for (docId <- 0L to 3L; nChars <- Seq(5L, 5000L)) {
      val f = Multimodal.parseMedia(docId, Multimodal.webpFixture(docId, nChars))
      assert(f.format == "webp" && f.width == 1 + nChars % 4096 &&
        f.height == 1 + (docId * 17) % 2160)
    }
  }

  test("hand-built OGG: page hops by lacing values, EOS granule wins; corrupt degrades") {
    // three real pages per RFC 3533; fixture formulas round-trip
    for (docId <- 0L to 3L; nChars <- Seq(0L, 7L, 5000L)) {
      val m = Multimodal.parseMedia(docId, Multimodal.oggFixture(docId, nChars))
      assert(m.format == "ogg" && m.width == 8000 + (nChars % 6) * 6000 &&
        m.height == 1 + docId % 2 &&
        m.frames == 200 + (docId * 31) % 90000)
    }
    // middle-page hop is load-bearing: synthOgg's data page granule is
    // total/2 — a walk that stopped at page 2 would report half
    val whole = Multimodal.parseMedia(9L, Multimodal.synthOgg(44100, 2, 88200L))
    assert(whole.frames == 88200 && whole.width == 44100 && whole.height == 2)
    // truncated segment table degrades to unknown, never crashes
    val truncated = Multimodal.synthOgg(44100, 2, 1000L).take(30)
    assert(Multimodal.parseMedia(10L, truncated).format == "unknown")
    // an OggS stream whose first packet is not a Vorbis id header
    val noVorbis = "OggS".getBytes("US-ASCII") ++ Array.fill(23)(0.toByte) ++
      Array(1.toByte, 4.toByte) ++ Array.fill(4)(0x55.toByte)
    assert(Multimodal.parseMedia(11L, noVorbis).format == "unknown")
  }

  test("hand-built AIFF: 80-bit extended-float rate, decoy hop, truncation degrade") {
    // 44100 = 0x400E_AC44_0000... in extended form; round-trip via fixture
    for (docId <- 0L to 3L; nChars <- Seq(0L, 3L)) {
      val m = Multimodal.parseMedia(docId, Multimodal.aiffFixture(docId, nChars))
      assert(m.format == "aiff" && m.width == 11025 * (1 + nChars % 4) &&
        m.height == 1 + docId % 6 && m.frames == 100 + (docId * 17) % 5000)
    }
    // non-power-of-two rate exercises mantissa bits below the top byte
    val odd = Multimodal.parseMedia(7L, Multimodal.synthAiff(48000, 2, 555))
    assert(odd.width == 48000 && odd.height == 2 && odd.frames == 555)
    // truncated mid-COMM degrades, never crashes
    val t = Multimodal.synthAiff(44100, 2, 10).take(30)
    assert(Multimodal.parseMedia(8L, t).format == "unknown")
    // a FORM that is not AIFF (e.g. AIFC) is not claimed
    val aifc = Multimodal.synthAiff(44100, 2, 10)
    aifc(8) = 'A'; aifc(9) = 'I'; aifc(10) = 'F'; aifc(11) = 'C'
    assert(Multimodal.parseMedia(9L, aifc).format == "unknown")
  }

  test("fnv64 matches published FNV-1a test vectors") {
    assert(Multimodal.fnv64(Array.empty) == BigInt("cbf29ce484222325", 16).toLong)
    assert(Multimodal.fnv64("a".getBytes("UTF-8")) == BigInt("af63dc4c8601ec8c", 16).toLong)
  }

  test("mediaFixture round-trips through the parser per the documented formulas") {
    for (docId <- 0L to 11L; nChars <- Seq(3L, 499L, 1234L)) {
      val m = Multimodal.parseMedia(docId, Multimodal.mediaFixture(docId, nChars))
      (docId % 4) match {
        case 0 =>
          assert(m.format == "png" && m.width == 1 + nChars % 1000 &&
            m.height == 1 + (docId * 7) % 1000 && m.frames == 1)
        case 1 =>
          assert(m.format == "jpeg" && m.width == 1 + nChars % 1000 &&
            m.height == 1 + (docId * 7) % 1000 && m.frames == 1)
        case 2 =>
          assert(m.format == "gif" && m.width == 1 + nChars % 500 &&
            m.height == 1 + (docId * 3) % 500 && m.frames == 1)
        case _ =>
          assert(m.format == "avi" && m.width == 16 + nChars % 1920 &&
            m.height == 16 + (docId * 5) % 1080 && m.frames == 1 + docId % 120)
      }
    }
  }

  /** Hand-built 16-bit PCM WAV around explicit samples — independent of
    * [[Multimodal.synthWavPcm]] and its sample formula. */
  private def wavOf(channels: Int, samples: Seq[Int], bits: Int = 16): Array[Byte] = {
    def le16b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)
    val data = samples.flatMap(s => le16b(s & 0xffff)).toArray
    val block = channels * bits / 8
    "RIFF".getBytes("US-ASCII") ++ le32b(28 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32b(16) ++ le16b(1) ++ le16b(channels) ++
      le32b(8000) ++ le32b(8000 * block) ++ le16b(block) ++ le16b(bits) ++
      "data".getBytes("US-ASCII") ++ le32b(data.length) ++ data
  }

  test("pcmLoudness: exact integer stats over hand-built samples") {
    import spark.implicits._
    // mono 0, 100, -200, 300: peak 300, Σ|s| 600, Σs² 140000,
    // sign flips at j=2 and j=3, rms = ⌊√35000⌋ = 187
    val mono = Seq((1L, wavOf(1, Seq(0, 100, -200, 300)))).toDF("doc_id", "blob")
    val r = Multimodal.pcmLoudness(mono, "doc_id", "blob").collect().head
    assert(r.getAs[Long]("n_samples") == 4 && r.getAs[Long]("peak_abs") == 300 &&
      r.getAs[Long]("sum_abs") == 600 && r.getAs[Long]("sum_sq") == 140000L &&
      r.getAs[Long]("zero_cross") == 2 && r.getAs[Long]("rms") == 187)
    // stereo interleaved (100,-100)(−100,100): zero crossings compare at
    // CHANNEL stride — 2 crossings, not the 3 an interleaved walk would see
    val st = Seq((2L, wavOf(2, Seq(100, -100, -100, 100)))).toDF("doc_id", "blob")
    val r2 = Multimodal.pcmLoudness(st, "doc_id", "blob").collect().head
    assert(r2.getAs[Long]("zero_cross") == 2)
    // non-16-bit and truncated blobs degrade to the all-zero feature row
    val bad = Seq(
      (3L, wavOf(1, Seq(1, 2, 3), bits = 8)),
      (4L, wavOf(1, Seq(1, 2, 3)).take(20))).toDF("doc_id", "blob")
    val rows = Multimodal.pcmLoudness(bad, "doc_id", "blob").collect()
    assert(rows.forall(x => x.getAs[Long]("n_samples") == 0 &&
      x.getAs[Long]("peak_abs") == 0 && x.getAs[Long]("rms") == 0))
  }

  test("pcmSilence: frame-level runs (all channels below threshold)") {
    import spark.implicits._
    // mono, threshold 100: silent flags T T F F T T F T →
    // 5 silent, 2 active segments, longest silent run 2
    val mono = Seq((1L, wavOf(1, Seq(0, 50, 200, 300, 0, 0, 150, 0))))
      .toDF("doc_id", "blob")
    val r = Multimodal.pcmSilence(mono, "doc_id", "blob", threshold = 100)
      .collect().head
    assert(r.getAs[Long]("frames") == 8 && r.getAs[Long]("silent_frames") == 5 &&
      r.getAs[Long]("n_active_segments") == 2 &&
      r.getAs[Long]("longest_silence") == 2)
    // stereo: a frame is active if ANY channel is loud
    val st = Seq((2L, wavOf(2, Seq(0, 500, 400, 0, 0, 0)))).toDF("doc_id", "blob")
    val r2 = Multimodal.pcmSilence(st, "doc_id", "blob", threshold = 100)
      .collect().head
    assert(r2.getAs[Long]("frames") == 3 && r2.getAs[Long]("silent_frames") == 1 &&
      r2.getAs[Long]("n_active_segments") == 1 &&
      r2.getAs[Long]("longest_silence") == 1)
  }

  test("bmpPixelStats: stride + orientation; sums and box checksum exact") {
    import spark.implicits._
    def le16b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)
    // image-coordinate pixel bytes p(x,y,c) = x·10 + y·100 + c + 1
    def p(x: Int, y: Int, c: Int) = (x * 10 + y * 100 + c + 1).toByte
    def bmp(hRaw: Int): Array[Byte] = {
      val h = math.abs(hRaw)
      val stride = 8 // w=2 → 6 pixel bytes + 2 pad
      val px = new Array[Byte](stride * h)
      for (r <- 0 until h; x <- 0 until 2; c <- 0 until 3) {
        val y = if (hRaw > 0) h - 1 - r else r
        px(r * stride + x * 3 + c) = p(x, y, c)
      }
      "BM".getBytes("US-ASCII") ++ le32b(54 + px.length) ++ le32b(0) ++
        le32b(54) ++ le32b(40) ++ le32b(2) ++ le32b(hRaw) ++ le16b(1) ++
        le16b(24) ++ Array.fill(24)(0.toByte) ++ px
    }
    // sums: b 224, g 228, r 232; one 2×2 box → means 56/57/58,
    // weights 1/4/7 → checksum 690
    for (hRaw <- Seq(2, -2)) {
      val df = Seq((1L, bmp(hRaw))).toDF("doc_id", "blob")
      val r = Multimodal.bmpPixelStats(df, "doc_id", "blob").collect().head
      assert(r.getAs[Int]("width") == 2 && r.getAs[Int]("height") == 2)
      assert(r.getAs[Long]("sum_b") == 224 && r.getAs[Long]("sum_g") == 228 &&
        r.getAs[Long]("sum_r") == 232, s"hRaw=$hRaw")
      assert(r.getAs[Long]("down_checksum") == 690, s"hRaw=$hRaw")
    }
    // truncated pixel array degrades to the all-zero row
    val bad = Seq((2L, bmp(2).take(58))).toDF("doc_id", "blob")
    val rb = Multimodal.bmpPixelStats(bad, "doc_id", "blob").collect().head
    assert(rb.getAs[Int]("width") == 0 && rb.getAs[Long]("down_checksum") == 0)
  }

  test("pcmEnvelope: content fingerprint ignores the container label") {
    import spark.implicits._
    // ids 7 and 57 share seed 7 (same samples) but different n_chars →
    // different RATE labels, different raw bytes — envelopes must collide
    val docs = Seq((7L, 13L), (57L, 20L), (8L, 13L)).toDF("doc_id", "n_chars")
    val blobs = Multimodal.pcmDupBlobs(docs, "doc_id", "n_chars")
    val raw = blobs.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(!java.util.Arrays.equals(raw(7L), raw(57L)),
      "containers must differ byte-wise or the test proves nothing")
    val env = Multimodal.pcmEnvelope(blobs, "doc_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(env(7L) == env(57L), "same samples → same envelope")
    assert(env(7L) != env(8L), "different seed → different envelope")
    // hand-check: mono [100, -200, 300, -400] over 2 blocks → means
    // (100+200)/2=150 and (300+400)/2=350
    val tiny = Seq((1L, wavOf(1, Seq(100, -200, 300, -400)))).toDF("doc_id", "blob")
    val e = Multimodal.pcmEnvelope(tiny, "doc_id", "blob", blocks = 2)
      .collect().head
    assert(e.getString(2) == "150,350" && e.getLong(1) == 4)
    // degrade + short-stream zero blocks
    val bad = Seq((2L, Array[Byte](1, 2, 3)),
      (3L, wavOf(1, Seq(500)))).toDF("doc_id", "blob")
    val be = Multimodal.pcmEnvelope(bad, "doc_id", "blob", blocks = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(be(2L) == "" && be(3L) == "500,0")
  }

  test("PCM/pixel fixtures round-trip their closed forms; plans stay narrow") {
    import spark.implicits._
    val docs = Seq((7L, 13L), (8L, 20L)).toDF("doc_id", "n_chars")
    val loud = Multimodal.pcmLoudness(
      Multimodal.pcmBlobs(docs, "doc_id", "n_chars"), "doc_id", "blob")
    assert(!loud.queryExecution.executedPlan.toString.contains("Exchange"))
    val l7 = loud.collect().find(_.getAs[Long]("id") == 7L).get
    val n7 = (50 + 7 * 13 % 400) * 2 // stereo (7 % 2 = 1)
    assert(l7.getAs[Long]("n_samples") == n7)
    // recompute Σs² directly from the documented sample formula
    val expSq = (0 until n7.toInt)
      .map(j => { val s = Multimodal.pcmSample(7L, j.toLong).toLong; s * s }).sum
    assert(l7.getAs[Long]("sum_sq") == expSq)
    val pix = Multimodal.bmpPixelStats(
      Multimodal.bmpPixelBlobs(docs, "doc_id", "n_chars"), "doc_id", "blob")
    val p8 = pix.collect().find(_.getAs[Long]("id") == 8L).get
    assert(p8.getAs[Int]("width") == (4 + 2 * (8 % 14)) &&
      p8.getAs[Int]("height") == (4 + 2 * (8 * 7 % 14)))
  }

  test("fixtureBlobs + decode is a narrow pipeline (no shuffle)") {
    import spark.implicits._
    val docs = Seq((0L, 10L), (1L, 20L), (2L, 30L), (3L, 40L))
      .toDF("doc_id", "n_chars")
    val decoded = Multimodal.decode(
      Multimodal.fixtureBlobs(docs, "doc_id", "n_chars"), "doc_id", "blob")
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    val rows = decoded.collect().sortBy(_.id)
    assert(rows.map(_.format).toSeq == Seq("png", "jpeg", "gif", "avi"))
  }
}
