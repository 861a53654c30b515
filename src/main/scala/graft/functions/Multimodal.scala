package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The decode stage is a REAL container-header parser: PNG IHDR (big-endian
  * dimensions, PNG spec §11.2.2), JPEG SOFn marker walk (ITU T.81 §B.2.2 —
  * segments are length-prefixed, so the scan skips APPn/COM/DQT to the
  * frame header), GIF logical screen descriptor (little-endian, GIF89a
  * spec §18), and AVI `avih` main header (RIFF chunk walk; dwTotalFrames /
  * dwWidth / dwHeight at fixed offsets in the AVIMAINHEADER struct). These
  * are pure byte reads — no codec library — which is exactly what a
  * 100 TB metadata-extraction pass wants: dimensions and frame counts
  * without decompressing pixel data. Full pixel decode (JPEG IDCT, video
  * codecs) would slot into the same `mapPartitions` batch shape; the
  * libraries are not in this container, so unknown formats degrade to a
  * checksum-only row (width/height/frames = 0) rather than fake numbers.
  *
  * Reference analogue: minerva treats payloads it cannot type as opaque
  * text and extracts what its parsers can (src/minerva/storage/datatype.py
  * deduce_parser_config); here the binary analogue is header-typed
  * extraction with an explicit unknown fallback.
  */
object Multimodal {

  /** Typed metadata extracted without decoding: byte length, digest, magic
    * bytes — pure expressions, pushdown-friendly. */
  def binaryMetadata(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(binCol)).as("n_bytes"),
      md5(col(binCol)).as("digest"),
      hex(substring(col(binCol), 1, 4)).as("magic")
    )

  final case class DecodedMedia(
      id: Long, format: String, width: Int, height: Int, frames: Int, checksum: Long)

  // ---- byte readers ---------------------------------------------------
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, StandardCharsets.US_ASCII)

  /** FNV-1a 64-bit over the raw bytes — cheap dedup/change-detect key kept
    * for every row regardless of format. */
  def fnv64(bytes: Array[Byte]): Long =
    bytes.foldLeft(-3750763034362895579L /* 0xcbf29ce484222325 */ )(
      (h, b) => (h ^ (b & 0xffL)) * 1099511628211L)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && b.take(8).sameElements(PngSig) && fourcc(b, 12) == "IHDR"

  /** SOF0–SOF15 minus DHT (C4), JPG (C8), DAC (CC) — the frame headers that
    * carry image dimensions (T.81 table B.1). */
  private def isSofMarker(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** Walk JPEG segments from SOI to the first SOFn; every non-standalone
    * segment is big-endian length-prefixed, so the walk is O(#segments). */
  private def parseJpeg(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    var pos = 2
    while (pos + 4 <= b.length) {
      if (u8(b, pos) != 0xff) return unknown(id, cs) // desynced stream
      val m = u8(b, pos + 1)
      if (m == 0xff) pos += 1 // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) pos += 2 // standalone
      else {
        val len = be16(b, pos + 2)
        if (isSofMarker(m)) {
          if (pos + 9 > b.length) return unknown(id, cs)
          // segment: len(2) precision(1) height(2) width(2) ...
          return DecodedMedia(id, "jpeg", be16(b, pos + 7), be16(b, pos + 5), 1, cs)
        }
        pos += 2 + len
      }
    }
    unknown(id, cs)
  }

  /** Depth-first RIFF chunk walk to the `avih` AVIMAINHEADER; chunks are
    * (fourcc, le32 size, payload) word-aligned, LIST chunks nest. */
  private def findAvih(b: Array[Byte], from: Int, end: Int): Int = {
    var pos = from
    while (pos + 8 <= end) {
      val id = fourcc(b, pos)
      // widen to Long before bounds math: a corrupt size near 2^31 would
      // overflow Int, pass the guard, and crash the walk instead of
      // degrading to 'unknown' (the module's contract for bad bytes)
      val size = le32(b, pos + 4).toLong
      if (size < 0 || pos + 8L + size > end.toLong + 1) return -1
      if (id == "avih") return pos + 8
      if (id == "LIST") {
        val r = findAvih(b, pos + 12, math.min(end.toLong, pos + 8L + size).toInt)
        if (r >= 0) return r
      }
      pos = (pos + 8L + size + (size & 1)).toInt
    }
    -1
  }

  private def parseAvi(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    val avih = findAvih(b, 12, b.length)
    if (avih < 0 || avih + 40 > b.length) unknown(id, cs)
    else
      DecodedMedia(id, "avi",
        // clamp corrupt fields (dwTotalFrames >= 2^31 reads negative):
        // a negative frame count would crash downstream sequence() calls
        width = math.max(0, le32(b, avih + 32)),
        height = math.max(0, le32(b, avih + 36)),
        frames = math.max(0, le32(b, avih + 16)), checksum = cs)
  }

  /** RIFF/WAVE header parse (WAVE spec, public): linear chunk walk to
    * `fmt ` (channels le16@+2, sample rate le32@+4, block align le16@+12)
    * and `data` (payload size). The fixed DecodedMedia shape carries
    * audio as width = sample rate (Hz), height = channels, frames =
    * sample frames (dataSize / blockAlign) — documented mapping, same
    * no-codec byte-arithmetic contract as the image/video parsers. */
  private def parseWav(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    var pos = 12
    var fmt = -1
    var dataSize = -1
    var ok = true
    while (ok && pos + 8 <= b.length) {
      val cid = fourcc(b, pos)
      // Long bounds math — see findAvih: corrupt sizes must degrade, not
      // overflow Int and crash the decode task
      val size = le32(b, pos + 4).toLong
      if (size < 0 || pos + 8L + size > b.length.toLong + 1) ok = false
      else {
        if (cid == "fmt ") fmt = pos + 8
        if (cid == "data") dataSize = size.toInt
        pos = (pos + 8L + size + (size & 1)).toInt
      }
    }
    if (fmt < 0 || fmt + 16 > b.length) unknown(id, cs)
    else {
      val channels = le16(b, fmt + 2)
      val rate = le32(b, fmt + 4)
      val block = le16(b, fmt + 12)
      val frames = if (dataSize >= 0 && block > 0) dataSize / block else 0
      DecodedMedia(id, "wav", rate, channels, frames, cs)
    }
  }

  /** BMP (Windows bitmap): 'BM' magic + 14-byte file header, then either
    * BITMAPINFOHEADER (biSize=40+, le32 dims at 18/22 — height NEGATIVE
    * for top-down rows, magnitude reported) or the ancient
    * BITMAPCOREHEADER (biSize=12, le16 dims at 18/20). */
  private def parseBmp(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    if (b.length < 22) return unknown(id, cs)
    val biSize = le32(b, 14)
    if (biSize == 12)
      DecodedMedia(id, "bmp", le16(b, 18), le16(b, 20), 1, cs)
    else if (biSize >= 40 && b.length >= 26)
      DecodedMedia(id, "bmp", math.abs(le32(b, 18)), math.abs(le32(b, 22)), 1, cs)
    else unknown(id, cs)
  }

  // MPEG-1 Layer III (ISO 11172-3, public): bitrate table (kbps, index
  // 0/15 invalid) and sample-rate table for version 1.
  private val Mp3BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3SampleRateV1 = Array(44100, 48000, 32000, 0)

  /** ID3v2 prefix length ("ID3" + ver + flags + 4-byte SYNCSAFE size —
    * 7 bits per byte, ID3v2 spec §3.1), or 0 if absent. */
  private def id3v2Size(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      10 + ((u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9))
    else 0

  private def isMp3Sync(b: Array[Byte], pos: Int): Boolean =
    pos + 4 <= b.length && u8(b, pos) == 0xff && (u8(b, pos + 1) & 0xfe) == 0xfa
  // 0xfa mask: sync(3)=111, version=11 (MPEG1), layer=01 (III); CRC bit free.
  // JPEG's SOI 0xffd8 fails the mask (0xd8 & 0xfe = 0xd8), so the sniffs
  // cannot collide.

  /** MP3 frame walk: skip ID3v2, then hop frame to frame by the computed
    * frame length (144·bitrate/sampleRate + padding for Layer III v1) —
    * counting frames and reading rate/channel mode from the first header.
    * Real per-frame arithmetic, no decoder: the walk only succeeds if
    * every hop lands on a sync word, so a wrong table or length formula
    * degrades to `unknown` instead of returning plausible numbers.
    * DecodedMedia mapping (as WAV): width = sample rate, height =
    * channels, frames = MPEG frames. */
  private def parseMp3(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    var pos = id3v2Size(b)
    var frames = 0
    var rate = 0
    var channels = 0
    var ok = true
    while (ok && pos + 4 <= b.length) {
      if (!isMp3Sync(b, pos)) ok = false
      else {
        val brIdx = (u8(b, pos + 2) >> 4) & 0xf
        val srIdx = (u8(b, pos + 2) >> 2) & 0x3
        val padding = (u8(b, pos + 2) >> 1) & 0x1
        val mode = (u8(b, pos + 3) >> 6) & 0x3
        val br = Mp3BitrateV1L3(brIdx) * 1000
        val sr = Mp3SampleRateV1(srIdx)
        if (br == 0 || sr == 0) ok = false
        else {
          if (frames == 0) { rate = sr; channels = if (mode == 3) 1 else 2 }
          frames += 1
          pos += 144 * br / sr + padding
        }
      }
    }
    if (frames == 0) unknown(id, cs)
    else DecodedMedia(id, "mp3", rate, channels, frames, cs)
  }

  /** FLAC STREAMINFO (flac format spec, public): "fLaC" + metadata block
    * header (type 0 = STREAMINFO, 24-bit BE length), then the packed
    * bitfields — sample rate 20 bits @ byte 18, channels−1 3 bits,
    * bits/sample−1 5 bits, total samples 36 bits. Mapping (as WAV):
    * width = sample rate, height = channels, frames = total samples
    * (clamped to Int). */
  private def parseFlac(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    if (b.length < 26) return unknown(id, cs)
    val blockType = u8(b, 4) & 0x7f
    val blockLen = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
    if (blockType != 0 || blockLen < 34) return unknown(id, cs)
    val sr = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
    val channels = ((u8(b, 20) >> 1) & 0x7) + 1
    val totalHi = (u8(b, 21) & 0x0f).toLong << 32
    val total = totalHi | (be32(b, 22).toLong & 0xffffffffL)
    if (sr == 0) unknown(id, cs)
    else DecodedMedia(id, "flac", sr, channels,
      math.min(total, Int.MaxValue.toLong).toInt, cs)
  }

  /** TIFF baseline header (TIFF 6.0 spec, public): endianness from II/MM,
    * magic 42, IFD offset, then the IFD entry walk for ImageWidth (256)
    * and ImageLength (257) — SHORT(3)/LONG(4) values inline in the value
    * field per the spec's left-justification rule. Both byte orders. */
  private def parseTiff(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    if (b.length < 8) return unknown(id, cs)
    val little = b(0) == 'I' && b(1) == 'I'
    def r16(i: Int) = if (little) le16(b, i) else be16(b, i)
    def r32(i: Int) = if (little) le32(b, i) else be32(b, i)
    if (r16(2) != 42) return unknown(id, cs)
    val ifd = r32(4)
    if (ifd < 8 || ifd.toLong + 2 > b.length) return unknown(id, cs)
    val n = r16(ifd)
    var (w, h) = (0, 0)
    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12
      if (e + 12 > b.length) return unknown(id, cs)
      val tag = r16(e)
      val typ = r16(e + 2)
      // inline value: SHORT reads 2 bytes, LONG reads 4 (spec §2: values
      // shorter than 4 bytes are left-justified in the value field)
      val v = typ match {
        case 3 => r16(e + 8)
        case 4 => r32(e + 8)
        case _ => -1
      }
      if (tag == 256 && v >= 0) w = v
      if (tag == 257 && v >= 0) h = v
      i += 1
    }
    if (w > 0 && h > 0) DecodedMedia(id, "tiff", w, h, 1, cs)
    else unknown(id, cs)
  }

  /** ISO-BMFF (MP4/MOV) box walk: top-level boxes are size(be32) +
    * fourcc; `moov` nests `mvhd` (timescale be32@+20, duration be32@+24
    * for version 0) and `trak`/`tkhd` (16.16 fixed-point width be32@+84,
    * height be32@+88 for version 0 — the ISO/IEC 14496-12 layout,
    * public). Returns (w, h, duration) or null on any malformed size —
    * same degrade-to-unknown contract as the RIFF walks. */
  private def findMp4Meta(b: Array[Byte]): Array[Int] = {
    var w = 0; var h = 0; var dur = -1
    def walk(from: Int, end: Int, depth: Int): Unit = {
      var pos = from
      while (pos + 8 <= end) {
        val size = be32(b, pos).toLong
        val typ = fourcc(b, pos + 4)
        if (size < 8 || pos + size > end) return // corrupt: stop this level
        val boxEnd = (pos + size).toInt
        typ match {
          case "moov" | "trak" if depth < 4 => walk(pos + 8, boxEnd, depth + 1)
          case "mvhd" if pos + 28 <= boxEnd && u8(b, pos + 8) == 0 =>
            dur = math.max(0, be32(b, pos + 24))
          case "tkhd" if pos + 92 <= boxEnd && u8(b, pos + 8) == 0 =>
            w = math.max(w, be32(b, pos + 84) >>> 16)
            h = math.max(h, be32(b, pos + 88) >>> 16)
          case _ => ()
        }
        pos = boxEnd
      }
    }
    walk(0, b.length, 0)
    if (dur < 0) null else Array(w, h, dur)
  }

  /** WEBP (RIFF container, VP8X extended header — the WebP container
    * spec, public): canvas dimensions are 24-bit little-endian
    * (value − 1) at payload offsets 4 and 7 after the 1-byte flags +
    * 3 reserved bytes. Same RIFF chunk walk as WAV/AVI. */
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)

  private def parseWebp(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    var pos = 12
    while (pos + 8 <= b.length) {
      val cid = fourcc(b, pos)
      val size = le32(b, pos + 4).toLong
      if (size < 0 || pos + 8L + size > b.length) return unknown(id, cs)
      if (cid == "VP8X" && size >= 10)
        return DecodedMedia(id, "webp",
          1 + le24(b, pos + 12), 1 + le24(b, pos + 15), 1, cs)
      pos = (pos + 8L + size + (size & 1)).toInt
    }
    unknown(id, cs)
  }

  private def parseMp4(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    val m = findMp4Meta(b)
    if (m == null) unknown(id, cs)
    // frames carries the mvhd duration in timescale units — the field a
    // frame sampler divides by (timescale/fps); documented mapping like
    // WAV's rate/channels
    else DecodedMedia(id, "mp4", m(0), m(1), m(2), cs)
  }

  /** OGG page walk (RFC 3533, public) with a Vorbis identification
    * header (Vorbis I spec §4.2.2): each page is 27 bytes + segment
    * table + payload, so the walk hops page to page by summed lacing
    * values; the FIRST page's packet yields channels (byte 11) and
    * sample rate (le32 @ 12) when it starts "\\x01vorbis"; the LAST
    * page's granule position is the stream's total sample count.
    * Mapping as WAV/FLAC: width = rate, height = channels,
    * frames = total samples (clamped to Int). */
  private def le64(b: Array[Byte], i: Int): Long =
    (le32(b, i).toLong & 0xffffffffL) |
      ((le32(b, i + 4).toLong & 0xffffffffL) << 32)

  private def parseOgg(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    var pos = 0
    var rate = 0
    var channels = 0
    var lastGranule = 0L
    var first = true
    while (pos + 27 <= b.length && fourcc(b, pos) == "OggS") {
      val granule = le64(b, pos + 6)
      val nsegs = u8(b, pos + 26)
      if (pos + 27 + nsegs > b.length) return unknown(id, cs)
      var paylen = 0
      for (s <- 0 until nsegs) paylen += u8(b, pos + 27 + s)
      val payload = pos + 27 + nsegs
      if (payload + paylen > b.length) return unknown(id, cs)
      if (first && paylen >= 16 && u8(b, payload) == 0x01 &&
          fourcc(b, payload + 1) == "vorb") {
        channels = u8(b, payload + 11)
        rate = le32(b, payload + 12)
      }
      if (granule > 0) lastGranule = granule
      first = false
      pos += 27 + nsegs + paylen
    }
    if (pos == 0 || rate == 0) unknown(id, cs)
    else DecodedMedia(id, "ogg", rate, channels,
      math.min(lastGranule, Int.MaxValue.toLong).toInt, cs)
  }

  /** AIFF COMM chunk walk (Apple AIFF-1.3 spec, public; EA-IFF-85
    * container): big-endian chunks padded to even length; COMM carries
    * channels (be16), numSampleFrames (be32), sampleSize (be16) and the
    * sample rate as an 80-bit IEEE 754 EXTENDED float — 15-bit biased
    * exponent + 64-bit mantissa with an explicit integer bit — decoded
    * here in pure integer arithmetic (rate = mantissa >> (63 − e) for
    * e ≤ 63, exact for every real-world rate). Mapping as WAV/FLAC:
    * width = rate, height = channels, frames = numSampleFrames. */
  private def parseAiff(id: Long, b: Array[Byte], cs: Long): DecodedMedia = {
    var pos = 12
    while (pos + 8 <= b.length) {
      val id4 = fourcc(b, pos)
      val size = be32(b, pos + 4)
      if (size < 0 || pos + 8 + size > b.length) return unknown(id, cs)
      if (id4 == "COMM") {
        if (size < 18) return unknown(id, cs)
        val channels = be16(b, pos + 8)
        val frames = be32(b, pos + 10)
        val expRaw = be16(b, pos + 16)
        val e = (expRaw & 0x7fff) - 16383
        val mantHi = be32(b, pos + 18).toLong & 0xffffffffL
        val mantLo = be32(b, pos + 22).toLong & 0xffffffffL
        val mant = (mantHi << 32) | mantLo
        if (e < 0 || e > 62) return unknown(id, cs)
        val rate = (mant >>> (63 - e)).toInt
        return if (rate == 0) unknown(id, cs)
        else DecodedMedia(id, "aiff", rate, channels, frames, cs)
      }
      pos += 8 + size + (size & 1) // chunks pad to even length
    }
    unknown(id, cs)
  }

  private def unknown(id: Long, cs: Long): DecodedMedia =
    DecodedMedia(id, "unknown", 0, 0, 0, cs)

  /** Real header parse: format sniff on magic bytes, then the format's own
    * dimension/frame fields. Unknown formats keep the checksum and report
    * zero dimensions — never fabricated numbers. */
  def parseMedia(id: Long, bytes: Array[Byte]): DecodedMedia = {
    val cs = fnv64(bytes)
    if (isPng(bytes))
      DecodedMedia(id, "png", be32(bytes, 16), be32(bytes, 20), 1, cs)
    else if (bytes.length >= 4 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8)
      parseJpeg(id, bytes, cs)
    else if (bytes.length >= 13 &&
             (fourcc(bytes, 0) + new String(bytes, 4, 2, StandardCharsets.US_ASCII))
               .matches("GIF8[79]a"))
      DecodedMedia(id, "gif", le16(bytes, 6), le16(bytes, 8), 1, cs)
    else if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ")
      parseAvi(id, bytes, cs)
    else if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "WAVE")
      parseWav(id, bytes, cs)
    else if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "WEBP")
      parseWebp(id, bytes, cs)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      parseBmp(id, bytes, cs)
    else if (bytes.length >= 4 && fourcc(bytes, 0) == "fLaC")
      parseFlac(id, bytes, cs)
    else if (bytes.length >= 4 &&
             ((bytes(0) == 'I' && bytes(1) == 'I') || (bytes(0) == 'M' && bytes(1) == 'M')))
      parseTiff(id, bytes, cs)
    else if (bytes.length >= 27 && fourcc(bytes, 0) == "OggS")
      parseOgg(id, bytes, cs)
    else if (bytes.length >= 12 && fourcc(bytes, 0) == "FORM" &&
             fourcc(bytes, 8) == "AIFF")
      parseAiff(id, bytes, cs)
    else if (bytes.length >= 12 && fourcc(bytes, 4) == "ftyp")
      parseMp4(id, bytes, cs)
    else if (id3v2Size(bytes) > 0 || isMp3Sync(bytes, 0))
      parseMp3(id, bytes, cs)
    else unknown(id, cs)
  }

  /** Batch decode: mapPartitions so per-partition setup (a real pixel codec,
    * if added) is amortized across the batch — the `mapInPandas` shape. */
  def decode(df: DataFrame, idCol: String, binCol: String): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes) => parseMedia(id, bytes) }
      }
  }

  /** "Resize"/feature-extract stage over decoded media — real scale
    * arithmetic with the pipeline shape (narrow, no shuffle). */
  def thumbnailPlan(decoded: Dataset[DecodedMedia], maxDim: Int): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { m =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(m.width, m.height))
      (m.id, (m.width * scale).toInt.max(1), (m.height * scale).toInt.max(1))
    }.toDF("id", "thumb_w", "thumb_h")
  }

  /** Frame sampling over decoded video: every `everyK`-th frame index per
    * media item (the row-per-frame shape a real frame extractor feeds into
    * the vision encoder). Expression-only — `sequence` builds the index
    * array, no decode round-trip. Narrow (no shuffle). */
  def frameSamplePlan(decoded: Dataset[DecodedMedia], everyK: Int): DataFrame =
    decoded.toDF()
      .select(col("id"), col("frames"),
        // frames <= 0 is the unknown-format degrade path (and the clamp
        // for corrupt counts): an EMPTY index array, not a crash —
        // sequence(0, -1, k) throws at runtime
        when(col("frames") > 0,
          sequence(lit(0), col("frames") - 1, lit(everyK)))
          .otherwise(array().cast("array<int>")).as("frame_idx"))

  // ---- deterministic fixture synthesis --------------------------------
  // The driver testdata carries no real media bytes, so the gate queries
  // synthesize format-conformant containers from document columns and then
  // run the REAL parser over them. The oracle recomputes the same
  // dimensions arithmetically — a parser reading the wrong offset or
  // endianness breaks the gate, and MultimodalSpec anchors the parser
  // against genuine image bytes (a real 1×1 PNG) independently.

  private def be16b(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32b(v: Int) =
    Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32b(v: Int) =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)
  private def ascii(s: String) = s.getBytes(StandardCharsets.US_ASCII)

  def synthPng(w: Int, h: Int): Array[Byte] =
    PngSig ++ be32b(13) ++ ascii("IHDR") ++ be32b(w) ++ be32b(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32b(0) // bit depth/color/... + (unchecked) CRC

  /** SOI + APP0(JFIF) + variable-length COM + SOF0 + EOI — the COM segment
    * varies per doc so the marker walk genuinely has to skip by length. */
  def synthJpeg(w: Int, h: Int, comLen: Int): Array[Byte] = {
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16b(16) ++ ascii("JFIF") ++
      Array[Byte](0, 1, 1, 0) ++ be16b(1) ++ be16b(1) ++ Array[Byte](0, 0)
    val com = Array(0xff, 0xfe).map(_.toByte) ++ be16b(2 + comLen) ++
      Array.fill(comLen)('x'.toByte)
    val sof = Array(0xff, 0xc0).map(_.toByte) ++ be16b(17) ++ Array[Byte](8) ++
      be16b(h) ++ be16b(w) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    Array(0xff, 0xd8).map(_.toByte) ++ app0 ++ com ++ sof ++ Array(0xff, 0xd9).map(_.toByte)
  }

  def synthGif(w: Int, h: Int): Array[Byte] =
    ascii("GIF89a") ++ le16b(w) ++ le16b(h) ++ Array[Byte](0, 0, 0, 0x3b)

  /** RIFF/AVI with a LIST(hdrl) holding the 56-byte AVIMAINHEADER. */
  def synthAvi(w: Int, h: Int, frames: Int): Array[Byte] = {
    val avihPayload = le32b(33333) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++
      le32b(frames) ++ le32b(0) ++ le32b(1) ++ le32b(0) ++
      le32b(w) ++ le32b(h) ++ Array.fill(16)(0.toByte)
    val avih = ascii("avih") ++ le32b(avihPayload.length) ++ avihPayload
    val hdrl = ascii("LIST") ++ le32b(4 + avih.length) ++ ascii("hdrl") ++ avih
    ascii("RIFF") ++ le32b(4 + hdrl.length) ++ ascii("AVI ") ++ hdrl
  }

  /** Canonical PCM WAV: RIFF/WAVE + 16-byte `fmt ` + `data` with a real
    * zero payload of frames·blockAlign bytes, so the parser's
    * dataSize/blockAlign arithmetic reads genuine chunk fields. */
  def synthWav(rate: Int, channels: Int, bitsPerSample: Int, frames: Int): Array[Byte] = {
    val block = channels * bitsPerSample / 8
    val dataSize = frames * block
    val fmt = ascii("fmt ") ++ le32b(16) ++ le16b(1) ++ le16b(channels) ++
      le32b(rate) ++ le32b(rate * block) ++ le16b(block) ++ le16b(bitsPerSample)
    val data = ascii("data") ++ le32b(dataSize) ++ Array.fill(dataSize)(0.toByte)
    ascii("RIFF") ++ le32b(4 + fmt.length + data.length) ++ ascii("WAVE") ++
      fmt ++ data
  }

  /** BITMAPINFOHEADER BMP; negative `h` encodes a top-down bitmap (the
    * parser reports the magnitude). Header-only — no pixel array, like
    * the other stills. */
  def synthBmp(w: Int, h: Int): Array[Byte] =
    ascii("BM") ++ le32b(54) ++ le32b(0) ++ le32b(54) ++ // file header
      le32b(40) ++ le32b(w) ++ le32b(h) ++ le16b(1) ++ le16b(24) ++
      Array.fill(24)(0.toByte)

  /** MPEG-1 Layer III stream: optional ID3v2 tag (syncsafe-sized zero
    * padding), then `frames` frames at 128 kbps — frame length
    * 144·128000/rate (417/384/576 bytes for 44100/48000/32000), header
    * bytes real, payload zeros. The walk in [[parseMp3]] must hop every
    * one of them to count right. */
  def synthMp3(srIdx: Int, stereo: Boolean, frames: Int, id3Pad: Int): Array[Byte] = {
    require(srIdx >= 0 && srIdx <= 2 && frames > 0 && id3Pad >= 0)
    val sr = Mp3SampleRateV1(srIdx)
    val flen = 144 * 128000 / sr
    val hdr = Array(0xff.toByte, 0xfb.toByte,
      ((9 << 4) | (srIdx << 2)).toByte, // bitrate idx 9 = 128k, no padding
      (if (stereo) 0x00 else 0xc0).toByte) // mode 0 = stereo, 3 = mono
    val id3 =
      if (id3Pad == 0) Array.empty[Byte]
      else ascii("ID3") ++ Array[Byte](4, 0, 0) ++
        Array(((id3Pad >> 21) & 0x7f).toByte, ((id3Pad >> 14) & 0x7f).toByte,
          ((id3Pad >> 7) & 0x7f).toByte, (id3Pad & 0x7f).toByte) ++
        Array.fill(id3Pad)(0.toByte)
    id3 ++ Array.fill(frames)(hdr ++ Array.fill(flen - 4)(0.toByte)).flatten
  }

  /** MP3 fixture, recomputable from (doc_id, n_chars):
    *   srIdx = doc_id % 3 → rate ∈ {44100, 48000, 32000},
    *   stereo ⇔ n_chars even, frames = 1 + doc_id % 24,
    *   ID3v2 pad = (doc_id · 13) % 100. */
  def mp3Fixture(docId: Long, nChars: Long): Array[Byte] =
    synthMp3(srIdx = (docId % 3).toInt, stereo = nChars % 2 == 0,
      frames = (1 + docId % 24).toInt, id3Pad = ((docId * 13) % 100).toInt)

  /** Shared blob-column builder: (id, blob) from a deterministic
    * (docId, nChars) fixture function — one narrow map, the shape
    * [[decode]] consumes. */
  private def blobsOf(docs: DataFrame, idCol: String, nCharsCol: String)(
      fixture: (Long, Long) => Array[Byte]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(nCharsCol).cast("long"))
      .as[(Long, Long)]
      .map { case (id, n) => (id, fixture(id, n)) }
      .toDF(idCol, "blob")
  }

  def mp3Blobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(mp3Fixture)

  /** Canonical minimal ISO-BMFF: ftyp(isom) + moov{ mvhd v0 (timescale,
    * duration) + trak{ tkhd v0 with 16.16 width/height } } — every size
    * and offset per ISO/IEC 14496-12, so the parser walks genuine box
    * structure. */
  def synthMp4(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
    val ftyp = be32b(24) ++ ascii("ftyp") ++ ascii("isom") ++ be32b(0) ++
      ascii("isom") ++ ascii("mp42")
    val mvhd = be32b(108) ++ ascii("mvhd") ++ be32b(0) /*v0+flags*/ ++
      be32b(0) ++ be32b(0) ++ be32b(timescale) ++ be32b(duration) ++
      be32b(0x00010000) ++ be16b(0x0100) ++ Array.fill(10)(0.toByte) ++
      (Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .flatMap(be32b).toArray) ++ Array.fill(24)(0.toByte) ++ be32b(2)
    val tkhd = be32b(92) ++ ascii("tkhd") ++ be32b(0) ++
      be32b(0) ++ be32b(0) ++ be32b(1) /*track id*/ ++ be32b(0) ++
      be32b(duration) ++ Array.fill(8)(0.toByte) ++ be16b(0) ++ be16b(0) ++
      be16b(0) ++ be16b(0) ++
      (Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .flatMap(be32b).toArray) ++
      be32b(w << 16) ++ be32b(h << 16)
    val trak = be32b(8 + tkhd.length) ++ ascii("trak") ++ tkhd
    val moov = be32b(8 + mvhd.length + trak.length) ++ ascii("moov") ++
      mvhd ++ trak
    ftyp ++ moov
  }

  /** MP4 fixture: w = 16 + n_chars % 1920, h = 16 + (doc_id·9) % 1080,
    * duration = 1 + doc_id % 240 at timescale 600. */
  def mp4Fixture(docId: Long, nChars: Long): Array[Byte] =
    synthMp4((16 + nChars % 1920).toInt, (16 + (docId * 9) % 1080).toInt,
      600, (1 + docId % 240).toInt)

  def mp4Blobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(mp4Fixture)

  /** Canonical WEBP/VP8X: RIFF + 'WEBP' + VP8X chunk (flags, 3 reserved,
    * 24-bit LE canvas width−1 / height−1) per the container spec. */
  def synthWebp(w: Int, h: Int): Array[Byte] = {
    def le24b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
    val vp8x = ascii("VP8X") ++ le32b(10) ++
      Array(0.toByte) ++ Array.fill(3)(0.toByte) ++
      le24b(w - 1) ++ le24b(h - 1)
    ascii("RIFF") ++ le32b(4 + vp8x.length) ++ ascii("WEBP") ++ vp8x
  }

  /** WEBP fixture: w = 1 + n_chars % 4096, h = 1 + (doc_id·17) % 2160. */
  def webpFixture(docId: Long, nChars: Long): Array[Byte] =
    synthWebp((1 + nChars % 4096).toInt, (1 + (docId * 17) % 2160).toInt)

  def webpBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(webpFixture)

  /** BMP fixture: w = 1 + n_chars % 2000; h = ±(1 + (doc_id·11) % 1200),
    * negative (top-down) for odd doc_id — the parser must report |h|. */
  def bmpFixture(docId: Long, nChars: Long): Array[Byte] = {
    val h = (1 + (docId * 11) % 1200).toInt
    synthBmp((1 + nChars % 2000).toInt, if (docId % 2 == 1) -h else h)
  }

  def bmpBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(bmpFixture)

  /** FLAC with a real packed STREAMINFO (16 bits/sample); frame/block
    * size fields zero — the parser only reads the documented bitfields. */
  def synthFlac(rate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    require(rate < (1 << 20) && channels >= 1 && channels <= 8 && totalSamples >= 0)
    val bps = 16
    val si = new Array[Byte](34)
    si(10) = ((rate >> 12) & 0xff).toByte
    si(11) = ((rate >> 4) & 0xff).toByte
    si(12) = (((rate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bps - 1) >> 4) & 1)).toByte
    si(13) = ((((bps - 1) & 0xf) << 4) | ((totalSamples >> 32) & 0xf).toInt).toByte
    val lo = totalSamples & 0xffffffffL
    si(14) = ((lo >> 24) & 0xff).toByte
    si(15) = ((lo >> 16) & 0xff).toByte
    si(16) = ((lo >> 8) & 0xff).toByte
    si(17) = (lo & 0xff).toByte
    ascii("fLaC") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ si
  }

  /** Baseline TIFF: 8-byte header + one IFD with width/length (SHORT or
    * LONG type) plus a Compression entry the walk must skip; both byte
    * orders. */
  def synthTiff(w: Int, h: Int, little: Boolean, useShort: Boolean): Array[Byte] = {
    def p16(v: Int) = if (little) le16b(v) else be16b(v)
    def p32(v: Int) = if (little) le32b(v) else be32b(v)
    val typ = if (useShort) 3 else 4
    def value(v: Int): Array[Byte] =
      if (useShort) p16(v) ++ Array[Byte](0, 0) else p32(v)
    def entry(tag: Int, v: Int): Array[Byte] =
      p16(tag) ++ p16(typ) ++ p32(1) ++ value(v)
    val order = if (little) "II" else "MM"
    ascii(order) ++ p16(42) ++ p32(8) ++
      p16(3) ++ entry(256, w) ++ entry(259, 1) ++ entry(257, h) ++ p32(0)
  }

  /** FLAC fixture: rate = 16000 + (n_chars % 5)·8000, channels =
    * 1 + doc_id % 8, samples = 100 + doc_id % 1000. */
  def flacFixture(docId: Long, nChars: Long): Array[Byte] =
    synthFlac(16000 + (nChars % 5).toInt * 8000, 1 + (docId % 8).toInt,
      100 + docId % 1000)

  def flacBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(flacFixture)

  /** OGG/Vorbis stream with three REAL pages (RFC 3533 layout): BOS page
    * carrying the 30-byte Vorbis identification header, a middle data
    * page the walk must hop over by its lacing values, and an EOS page
    * whose granule position is the total sample count. CRCs are zero
    * (the metadata walk does not checksum payloads, as with the RIFF
    * fixtures). */
  private def le64b(v: Long): Array[Byte] =
    le32b((v & 0xffffffffL).toInt) ++ le32b(((v >> 32) & 0xffffffffL).toInt)

  private def oggPage(
      headerType: Int, granule: Long, seq: Int,
      payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= 255, "single-segment fixture page")
    val nsegs: Array[Byte] =
      if (payload.isEmpty) Array(0.toByte)
      else Array(1.toByte, payload.length.toByte)
    ascii("OggS") ++ Array(0.toByte, headerType.toByte) ++
      le64b(granule) ++ le32b(0x6772616f) ++ le32b(seq) ++ le32b(0) ++
      nsegs ++ payload
  }

  def synthOgg(rate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    require(rate > 0 && channels >= 1 && channels <= 255 && totalSamples >= 0)
    val idHeader = Array(1.toByte) ++ ascii("vorbis") ++ le32b(0) ++
      Array(channels.toByte) ++ le32b(rate) ++
      le32b(0) ++ le32b(0) ++ le32b(0) ++ Array(0xb8.toByte, 1.toByte)
    oggPage(0x02, 0L, 0, idHeader) ++
      oggPage(0x00, totalSamples / 2, 1, Array.fill(5)(0.toByte)) ++
      oggPage(0x04, totalSamples, 2, Array.empty[Byte])
  }

  def oggFixture(docId: Long, nChars: Long): Array[Byte] =
    synthOgg(8000 + (nChars % 6).toInt * 6000, 1 + (docId % 2).toInt,
      200 + (docId * 31) % 90000)

  def oggBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(oggFixture)

  /** AIFF with a real COMM chunk: the sample rate encoded as a genuine
    * 80-bit extended float (explicit-integer-bit mantissa), preceded by
    * a decoy chunk the walk must hop (odd size → even padding). */
  def synthAiff(rate: Int, channels: Int, frames: Int): Array[Byte] = {
    require(rate > 0 && channels >= 1 && frames >= 0)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong).toInt
    val mant = rate.toLong << (63 - e)
    val expRaw = e + 16383
    val comm = ascii("COMM") ++ be32b(18) ++ be16b(channels) ++
      be32b(frames) ++ be16b(16) ++ be16b(expRaw) ++
      be32b((mant >>> 32).toInt) ++ be32b((mant & 0xffffffffL).toInt)
    val decoy = ascii("ANNO") ++ be32b(3) ++ ascii("odd") ++
      Array(0.toByte) // odd-size chunk pads to even
    val body = ascii("AIFF") ++ decoy ++ comm
    ascii("FORM") ++ be32b(body.length) ++ body
  }

  def aiffFixture(docId: Long, nChars: Long): Array[Byte] =
    synthAiff(11025 * (1 + (nChars % 4)).toInt, 1 + (docId % 6).toInt,
      (100 + (docId * 17) % 5000).toInt)

  def aiffBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(aiffFixture)

  /** TIFF fixture: little-endian for even doc_id, SHORT values for even
    * n_chars; w = 1 + n_chars % 4000, h = 1 + (doc_id·13) % 3000. */
  def tiffFixture(docId: Long, nChars: Long): Array[Byte] =
    synthTiff((1 + nChars % 4000).toInt, (1 + (docId * 13) % 3000).toInt,
      little = docId % 2 == 0, useShort = nChars % 2 == 0)

  def tiffBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(tiffFixture)

  /** Audio fixture: 16-bit PCM, rate/channels/frames derived from
    * (doc_id, n_chars) so the oracle recomputes them without bytes.
    *   rate = 8000 + (n_chars % 8)·1000, channels = 1 + doc_id % 2,
    *   frames = 1 + doc_id % 480 */
  def audioFixture(docId: Long, nChars: Long): Array[Byte] =
    synthWav(rate = 8000 + (nChars % 8).toInt * 1000,
      channels = 1 + (docId % 2).toInt, bitsPerSample = 16,
      frames = (1 + docId % 480).toInt)

  /** [[fixtureBlobs]] for the audio gate: (id, blob) WAV column. */
  def audioBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(audioFixture)

  // ---- audio CONTENT (PCM sample decode) -------------------------------
  // Header parsing answers "what is this"; the content tier answers "what
  // does it sound like" — loudness and silence structure over the real
  // 16-bit frames, all in integer arithmetic so the result is exact and
  // layout-invariant (the 100 TB contract: per-blob one-pass map, fixed-
  // size feature rows out, no codec, no shuffle).

  /** Deterministic 16-bit sample stream: sample j of blob `seed` is
    * ((seed·7919 + j·104729) mod 65536) − 32768 ∈ [−32768, 32767].
    * Pure BIGINT arithmetic — the oracle replays it with generate_series. */
  def pcmSample(seed: Long, j: Long): Int =
    (((seed * 7919L + j * 104729L) % 65536L) - 32768L).toInt

  /** Canonical PCM WAV with a REAL sample payload: interleaved int16-LE
    * frames from [[pcmSample]]. Same chunk layout as [[synthWav]]. */
  def synthWavPcm(rate: Int, channels: Int, frames: Int, seed: Long): Array[Byte] = {
    val n = frames * channels
    val data = new Array[Byte](n * 2)
    var j = 0
    while (j < n) {
      val s = pcmSample(seed, j.toLong)
      data(2 * j) = (s & 0xff).toByte
      data(2 * j + 1) = ((s >> 8) & 0xff).toByte
      j += 1
    }
    val block = channels * 2
    val fmt = ascii("fmt ") ++ le32b(16) ++ le16b(1) ++ le16b(channels) ++
      le32b(rate) ++ le32b(rate * block) ++ le16b(block) ++ le16b(16)
    ascii("RIFF") ++ le32b(4 + fmt.length + 8 + data.length) ++ ascii("WAVE") ++
      fmt ++ ascii("data") ++ le32b(data.length) ++ data
  }

  /** PCM fixture, recomputable from (doc_id, n_chars):
    *   rate = 8000 + (n_chars % 8)·1000, channels = 1 + doc_id % 2,
    *   frames = 50 + (doc_id·13) % 400, sample seed = doc_id. */
  def pcmFixture(docId: Long, nChars: Long): Array[Byte] =
    synthWavPcm(rate = 8000 + (nChars % 8).toInt * 1000,
      channels = 1 + (docId % 2).toInt,
      frames = (50 + (docId * 13) % 400).toInt, seed = docId)

  def pcmBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(pcmFixture)

  /** Locate the `fmt ` and `data` chunks of a RIFF/WAVE blob; returns
    * (channels, dataOff, nSamples) for 16-bit PCM, None otherwise. */
  private def wavPcmLayout(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE") return None
    var pos = 12
    var fmt = -1
    var dataOff = -1
    var dataSize = -1
    var ok = true
    while (ok && pos + 8 <= b.length) {
      val cid = fourcc(b, pos)
      val size = le32(b, pos + 4).toLong
      if (size < 0 || pos + 8L + size > b.length.toLong + 1) ok = false
      else {
        if (cid == "fmt ") fmt = pos + 8
        if (cid == "data") { dataOff = pos + 8; dataSize = size.toInt }
        pos = (pos + 8L + size + (size & 1)).toInt
      }
    }
    if (fmt < 0 || fmt + 16 > b.length || dataOff < 0 || dataSize < 2) None
    else {
      val channels = le16(b, fmt + 2)
      val bits = le16(b, fmt + 14)
      if (bits != 16 || channels < 1) None
      // the RIFF walk tolerates a 1-byte truncation (missing pad byte), so
      // clamp the sample count to the payload bytes actually present —
      // degrade, never index past b.length
      else Some((channels, dataOff, math.min(dataSize, b.length - dataOff) / 2))
    }
  }

  /** One signed int16-LE sample at index j of the data chunk. */
  private def s16(b: Array[Byte], dataOff: Int, j: Int): Int =
    ((u8(b, dataOff + 2 * j) | (u8(b, dataOff + 2 * j + 1) << 8)) << 16) >> 16

  final case class PcmStats(
      id: Long, n_samples: Long, peak_abs: Long, sum_abs: Long, sum_sq: Long,
      zero_cross: Long, rms: Long)

  /** Loudness over the decoded 16-bit frames: peak |s|, Σ|s|, Σs² (exact
    * BIGINT), per-channel-stride zero crossings ((s<0) flips vs the same
    * channel's previous frame), and RMS = ⌊√(Σs² div n)⌋. The mean square
    * is < 2³⁰, where IEEE-754 sqrt is correctly rounded and the floor is
    * provably exact (√(k²−1) sits 1/(2k) ≈ 2⁻¹⁶ below k, far beyond a
    * half-ulp), so even the RMS column is engine-invariant — same
    * convention as the repeated-IEEE-sqrt gates. Unparseable or non-16-bit
    * blobs degrade to an all-zero feature row, mirroring [[parseMedia]]'s
    * unknown fallback. One pass per blob, narrow, no shuffle. */
  def pcmLoudness(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        wavPcmLayout(b) match {
          case None => PcmStats(id, 0L, 0L, 0L, 0L, 0L, 0L)
          case Some((channels, dataOff, n)) =>
            var peak = 0L; var sumAbs = 0L; var sumSq = 0L; var zc = 0L
            var j = 0
            while (j < n) {
              val s = s16(b, dataOff, j).toLong
              val a = math.abs(s)
              if (a > peak) peak = a
              sumAbs += a
              sumSq += s * s
              if (j >= channels &&
                  (s < 0) != (s16(b, dataOff, j - channels) < 0)) zc += 1
              j += 1
            }
            val msq = sumSq / n
            PcmStats(id, n.toLong, peak, sumAbs, sumSq, zc,
              math.floor(math.sqrt(msq.toDouble)).toLong)
        }
      }).toDF()
  }

  /** PCM fixture with PLANTED duplicates: content (channels, frames,
    * samples) keys off doc_id mod 50 while the container RATE still
    * varies with n_chars — every ~50th doc carries the same audio in a
    * differently-labelled container, which byte-digest dedup (q25)
    * cannot see and content fingerprinting must. */
  def pcmDupFixture(docId: Long, nChars: Long): Array[Byte] = {
    val seed = docId % 50
    synthWavPcm(rate = 8000 + (nChars % 8).toInt * 1000,
      channels = 1 + (seed % 2).toInt,
      frames = (50 + (seed * 13) % 400).toInt, seed = seed)
  }

  def pcmDupBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(pcmDupFixture)

  final case class PcmEnvelope(id: Long, n_samples: Long, env: String)

  /** Content fingerprint of the decoded samples: the |s| loudness
    * envelope over `blocks` equal spans (block of sample j is
    * j·blocks div n; per-block mean = Σ|s| div count — all integer, so
    * the envelope string is engine-exact and md5-able on both sides).
    * Headers are NOT hashed: a re-containered copy (different rate
    * label, same samples) fingerprints identically. Unparseable blobs
    * degrade to the empty envelope. */
  def pcmEnvelope(df: DataFrame, idCol: String, binCol: String,
      blocks: Int = 8): DataFrame = {
    require(blocks >= 1, s"pcmEnvelope: blocks >= 1, got $blocks")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        wavPcmLayout(b) match {
          case None => PcmEnvelope(id, 0L, "")
          case Some((_, dataOff, n)) =>
            val sums = new Array[Long](blocks)
            val cnts = new Array[Long](blocks)
            var j = 0
            while (j < n) {
              val k = (j.toLong * blocks / n).toInt
              sums(k) += math.abs(s16(b, dataOff, j).toLong)
              cnts(k) += 1
              j += 1
            }
            PcmEnvelope(id, n.toLong,
              (0 until blocks) // n < blocks leaves empty blocks → mean 0
                .map(k => if (cnts(k) == 0) 0L else sums(k) / cnts(k))
                .mkString(","))
        }
      }).toDF()
  }

  final case class PcmSilence(
      id: Long, frames: Long, silent_frames: Long, n_active_segments: Long,
      longest_silence: Long)

  /** Silence segmentation: a FRAME is silent iff every channel's |s| <
    * `threshold`; reports silent-frame count, the number of maximal
    * non-silent runs, and the longest silent run — the voice-activity
    * shape an audio-corpus filter keys on. Run-length state is a plain
    * per-blob scan (blobs are independent; the cross-frame dependency
    * never leaves one task). */
  def pcmSilence(df: DataFrame, idCol: String, binCol: String, threshold: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        wavPcmLayout(b) match {
          case None => PcmSilence(id, 0L, 0L, 0L, 0L)
          case Some((channels, dataOff, n)) =>
            val frames = n / channels
            var silent = 0L; var segs = 0L; var longest = 0L
            var run = 0L; var prevSilent = true
            var f = 0
            while (f < frames) {
              var frameSilent = true
              var c = 0
              while (frameSilent && c < channels) {
                if (math.abs(s16(b, dataOff, f * channels + c)) >= threshold)
                  frameSilent = false
                c += 1
              }
              if (frameSilent) {
                silent += 1; run += 1
                if (run > longest) longest = run
              } else {
                if (prevSilent) segs += 1
                run = 0
              }
              prevSilent = frameSilent
              f += 1
            }
            PcmSilence(id, frames.toLong, silent, segs, longest)
        }
      }).toDF()
  }

  // ---- image CONTENT (BMP pixel decode + box downsample) ---------------
  // BMP 24-bit is the one mainstream image container whose pixel array is
  // raw bytes — content ops need no codec, so "decode / resize" can be
  // REAL here (the codec formats keep the header-only + stub contract).

  /** Deterministic pixel byte: channel byte c (BGR physical order) of
    * image-coordinate pixel (x, y) is (seed·31 + y·509 + x·127 + c·8191)
    * mod 256 — pure BIGINT, oracle-replayable. */
  def bmpPixel(seed: Long, x: Long, y: Long, c: Long): Int =
    ((seed * 31L + y * 509L + x * 127L + c * 8191L) % 256L).toInt

  /** Bottom-up 24-bit BITMAPINFOHEADER BMP with a REAL pixel array:
    * rows padded to 4 bytes per the spec, file row r holding image row
    * h−1−r — the parser has to get stride and orientation right. */
  def synthBmpPixels(w: Int, h: Int, seed: Long): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val px = new Array[Byte](stride * h)
    var r = 0
    while (r < h) {
      val y = h - 1 - r // bottom-up
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px(r * stride + x * 3 + c) = bmpPixel(seed, x.toLong, y.toLong, c.toLong).toByte
          c += 1
        }
        x += 1
      }
      r += 1
    }
    ascii("BM") ++ le32b(54 + px.length) ++ le32b(0) ++ le32b(54) ++
      le32b(40) ++ le32b(w) ++ le32b(h) ++ le16b(1) ++ le16b(24) ++
      Array.fill(24)(0.toByte) ++ px
  }

  /** Pixel fixture: EVEN dims (so the 2×2 downsample tiles exactly),
    *   w = 4 + 2·(doc_id % 14), h = 4 + 2·((doc_id·7) % 14), seed = doc_id. */
  def bmpPixelFixture(docId: Long, nChars: Long): Array[Byte] =
    synthBmpPixels((4 + 2 * (docId % 14)).toInt, (4 + 2 * ((docId * 7) % 14)).toInt, docId)

  def bmpPixelBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(bmpPixelFixture)

  final case class BmpPixelStats(
      id: Long, width: Int, height: Int, sum_b: Long, sum_g: Long, sum_r: Long,
      down_checksum: Long)

  /** Decode the pixel array (stride + bottom-up handled) and emit exact
    * per-channel byte sums plus a weighted checksum of the 2×2 integer
    * box downsample (each output channel = mean-div-4 of its 4 source
    * bytes, weighted 1 + (bx + 2·by + 3·c) mod 13 so a transposed or
    * mis-strided read cannot cancel out). The real "resize" a vision
    * pipeline runs, in one narrow pass. */
  def bmpPixelStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val ok = b.length >= 54 && b(0) == 'B' && b(1) == 'M' &&
          le32(b, 14) >= 40 && le16(b, 28) == 24
        if (!ok) BmpPixelStats(id, 0, 0, 0L, 0L, 0L, 0L)
        else {
          val off = le32(b, 10)
          val w = le32(b, 18)
          val hRaw = le32(b, 22)
          val h = math.abs(hRaw)
          // Long stride math: a corrupt w near 2^30 overflows w*3 in Int
          // to a NEGATIVE stride that slips past the bounds check and
          // crashes the task — same degrade-not-crash contract as the
          // RIFF walks
          val stride = ((w.toLong * 3 + 3) & ~3L).toInt
          if (w <= 0 || h <= 0 || off < 0 ||
              off + w.toLong * 3 * h > b.length || off + stride.toLong * h > b.length)
            BmpPixelStats(id, 0, 0, 0L, 0L, 0L, 0L)
          else {
            // image row y lives at file row (h-1-y) when bottom-up
            def px(x: Int, y: Int, c: Int): Int = {
              val r = if (hRaw > 0) h - 1 - y else y
              u8(b, off + r * stride + x * 3 + c)
            }
            val sums = new Array[Long](3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var c = 0
                while (c < 3) { sums(c) += px(x, y, c); c += 1 }
                x += 1
              }
              y += 1
            }
            var checksum = 0L
            var by = 0
            while (2 * by + 1 < h) {
              var bx = 0
              while (2 * bx + 1 < w) {
                var c = 0
                while (c < 3) {
                  val m = (px(2 * bx, 2 * by, c) + px(2 * bx + 1, 2 * by, c) +
                    px(2 * bx, 2 * by + 1, c) + px(2 * bx + 1, 2 * by + 1, c)) / 4
                  checksum += m.toLong * (1L + (bx + 2L * by + 3L * c) % 13L)
                  c += 1
                }
                bx += 1
              }
              by += 1
            }
            BmpPixelStats(id, w, h, sums(0), sums(1), sums(2), checksum)
          }
        }
      }).toDF()
  }

  /** Per-doc fixture: format rotates on doc_id % 4; dimensions derive from
    * (doc_id, n_chars) so the oracle can recompute them without bytes.
    *   0 → PNG  w = 1 + n_chars % 1000, h = 1 + (doc_id·7) % 1000
    *   1 → JPEG same dims, COM length 1 + doc_id % 29
    *   2 → GIF  w = 1 + n_chars % 500,  h = 1 + (doc_id·3) % 500
    *   3 → AVI  w = 16 + n_chars % 1920, h = 16 + (doc_id·5) % 1080,
    *            frames = 1 + doc_id % 120 */
  def mediaFixture(docId: Long, nChars: Long): Array[Byte] = (docId % 4) match {
    case 0 => synthPng((1 + nChars % 1000).toInt, (1 + (docId * 7) % 1000).toInt)
    case 1 => synthJpeg((1 + nChars % 1000).toInt, (1 + (docId * 7) % 1000).toInt,
                        (1 + docId % 29).toInt)
    case 2 => synthGif((1 + nChars % 500).toInt, (1 + (docId * 3) % 500).toInt)
    case _ => synthAvi((16 + nChars % 1920).toInt, (16 + (docId * 5) % 1080).toInt,
                       (1 + docId % 120).toInt)
  }

  /** Synthesize the media blob column from a documents frame (gate fixture
    * path — a real deployment reads an existing binary column instead).
    * Narrow map, no shuffle: yields exactly the (id, blob) shape `decode`
    * consumes. */
  def fixtureBlobs(docs: DataFrame, idCol: String, nCharsCol: String): DataFrame =
    blobsOf(docs, idCol, nCharsCol)(mediaFixture)
}
