package graft.analytics

/** REAL decoders for the uncompressed media formats that need no codec
  * library — pure byte parsing, so they run in this container and on any
  * executor with zero native dependencies:
  *
  *  - PPM (P6): `"P6" <ws> width <ws> height <ws> maxval \n raster` with
  *    `#` comments; 8-bit RGB raster, row-major.
  *  - WAV (RIFF/PCM 16-bit): `"RIFF" size "WAVE"` + chunk walk to
  *    `fmt ` (must be audioFormat=1, 16-bit) and `data`; little-endian
  *    interleaved samples.
  *
  * Compressed formats (JPEG/PNG/MP3/...) still go through the loudly
  * marked stub in [[MultimodalOps]] — decoding those without a codec
  * library is not honestly possible here. The dispatch is by magic bytes
  * ([[isPpm]]/[[isPcmWav]]), so a corpus can mix real and stub payloads
  * and each row takes its right path.
  */
object MediaCodecs {

  def isPpm(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'P' && b(1) == '6' && Character.isWhitespace(b(2))

  def isPcmWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Decode a P6 PPM. Returns (width, height, channels=3, raster bytes).
    * Fails loudly on truncation/garbage — a malformed "P6" payload is
    * poison, not silently-wrong pixels.
    */
  def decodePpm(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    var i = 2 // past "P6"
    def skipWsAndComments(): Unit = {
      var go = true
      while (go) {
        while (i < b.length && Character.isWhitespace(b(i))) i += 1
        if (i < b.length && b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else go = false
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      require(i < b.length && b(i) >= '0' && b(i) <= '9', s"PPM: expected integer at byte $i")
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(maxval > 0 && maxval < 256, s"PPM: only 8-bit maxval supported, got $maxval")
    require(i < b.length && Character.isWhitespace(b(i)), "PPM: missing raster separator")
    i += 1 // exactly ONE whitespace before the raster (per spec)
    val n = w * h * 3
    require(b.length - i >= n, s"PPM: raster truncated (${b.length - i} of $n bytes)")
    (w, h, 3, java.util.Arrays.copyOfRange(b, i, i + n))
  }

  /** Decode a PCM-16 WAV. Returns (sampleRate, channels, samples) with
    * interleaved channel samples as signed 16-bit values.
    */
  def decodePcmWav(b: Array[Byte]): (Int, Int, Array[Short]) = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    var i = 12 // past RIFF header
    var fmt: Option[(Int, Int)] = None // (sampleRate, channels)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = le32(i + 4)
      require(len >= 0 && i + 8 + len <= b.length, s"WAV: chunk '$id' overruns payload")
      if (id == "fmt ") {
        require(le16(i + 8) == 1, "WAV: only PCM (audioFormat=1) supported")
        require(le16(i + 8 + 14) == 16, "WAV: only 16-bit samples supported")
        fmt = Some((le32(i + 8 + 4), le16(i + 8 + 2)))
      } else if (id == "data") data = Some((i + 8, len))
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    val (rate, ch) = fmt.getOrElse(throw new IllegalArgumentException("WAV: no fmt chunk"))
    val (off, len) = data.getOrElse(throw new IllegalArgumentException("WAV: no data chunk"))
    val samples = Array.tabulate(len / 2)(k => le16(off + 2 * k).toShort)
    (rate, ch, samples)
  }
}
