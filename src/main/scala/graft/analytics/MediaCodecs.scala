package graft.analytics

/** REAL decoders for the media formats decodable with zero external
  * dependencies, so they run in this container and on any executor:
  *
  *  - PPM (P6): `"P6" <ws> width <ws> height <ws> maxval \n raster` with
  *    `#` comments; 8-bit RGB raster, row-major — pure byte parsing.
  *  - WAV (RIFF/PCM 16-bit): `"RIFF" size "WAVE"` + chunk walk to
  *    `fmt ` (must be audioFormat=1, 16-bit) and `data`; little-endian
  *    interleaved samples — pure byte parsing.
  *  - PNG / JPEG / BMP / GIF: decoded through the JDK's BUILT-IN
  *    `javax.imageio` readers ([[decodeImageIo]]) — real rasters, still
  *    no external codec library (the readers ship with Java SE and run
  *    headless). Lossless formats round-trip exact pixels
  *    (spec-verified); JPEG is lossy by nature, so its raster is
  *    deterministic per JVM but not byte-pinned by the format.
  *
  * Formats with no JDK reader (MP3/MP4/WebP/...) still go through the
  * loudly marked stub in [[MultimodalOps]]. The dispatch is by magic
  * bytes ([[isPpm]]/[[isPcmWav]]/[[isImageIoFormat]]), so a corpus can
  * mix real and stub payloads and each row takes its right path.
  */
object MediaCodecs {

  def isPpm(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'P' && b(1) == '6' && Character.isWhitespace(b(2))

  def isPcmWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  /** Any format the JDK's bundled ImageIO readers handle. */
  def isImageIoFormat(b: Array[Byte]): Boolean =
    isPng(b) || isJpeg(b) || isBmp(b) || isGif(b)

  /** Decode EVERY frame of an animated (or single-frame) GIF via the
    * JDK's ImageIO sequence API: `(width, height, channels, raster)` per
    * frame, in presentation order. Frames are decoded independently
    * (no inter-frame composition — each frame's own raster, which is the
    * per-frame feature-extraction contract; a player-accurate compositor
    * would layer disposal methods on top). Fails loudly on a payload the
    * GIF reader rejects.
    */
  def decodeGifFrames(b: Array[Byte]): Seq[(Int, Int, Int, Array[Byte])] = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(it.hasNext, "ImageIO: no GIF reader registered")
    val reader = it.next()
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      reader.setInput(in, false, true)
      val n = reader.getNumImages(true)
      require(n >= 1, "GIF: no frames")
      (0 until n).map { i =>
        val img = reader.read(i)
        val w = img.getWidth
        val h = img.getHeight
        val c = if (img.getColorModel.hasAlpha) 4 else 3
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val out = new Array[Byte](w * h * c)
        var p = 0
        var o = 0
        while (p < argb.length) {
          val v = argb(p)
          out(o) = ((v >> 16) & 0xff).toByte
          out(o + 1) = ((v >> 8) & 0xff).toByte
          out(o + 2) = (v & 0xff).toByte
          if (c == 4) out(o + 3) = ((v >>> 24) & 0xff).toByte
          p += 1
          o += c
        }
        (w, h, c, out)
      }
    } finally {
      reader.dispose()
      in.close()
    }
  }

  /** Decode PNG/JPEG/BMP/GIF via the JDK's `javax.imageio`. Returns
    * (width, height, channels, 8-bit interleaved raster) — channels = 4
    * (RGBA) when the image carries alpha, else 3 (RGB; grayscale expands
    * to r=g=b, the sRGB normalization `getRGB` defines). Fails loudly on
    * a payload no reader accepts — like the PPM path, a malformed image
    * is poison, not silently-wrong pixels.
    */
  def decodeImageIo(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "ImageIO: no registered reader accepted the payload")
    val w = img.getWidth
    val h = img.getHeight
    val c = if (img.getColorModel.hasAlpha) 4 else 3
    // one bulk sRGB conversion — deterministic for 8-bit images, and the
    // normalization step every downstream feature stage wants anyway
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Byte](w * h * c)
    var i = 0
    var o = 0
    while (i < argb.length) {
      val v = argb(i)
      out(o) = ((v >> 16) & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = (v & 0xff).toByte
      if (c == 4) out(o + 3) = ((v >>> 24) & 0xff).toByte
      i += 1
      o += c
    }
    (w, h, c, out)
  }

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

  /** Decode any WAV the JDK understands: the hand-rolled PCM-16 fast
    * path first (zero-copy chunk walk), then `javax.sound.sampled`
    * conversion for the rest of the RIFF family (8-bit PCM, µ-law,
    * a-law — the readers and converters ship with Java SE). Returns
    * (sampleRate, channels, interleaved signed 16-bit samples) either
    * way, so downstream feature code is encoding-agnostic.
    */
  def decodeWav(b: Array[Byte]): (Int, Int, Array[Short]) =
    try decodePcmWav(b)
    catch { case _: IllegalArgumentException => decodeWavViaAudioSystem(b) }

  private def decodeWavViaAudioSystem(b: Array[Byte]): (Int, Int, Array[Short]) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val f = in.getFormat
      val pcm = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
        f.getSampleRate, false)
      val conv = javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, in)
      try {
        val bytes = conv.readAllBytes()
        val samples = Array.tabulate(bytes.length / 2)(k =>
          ((bytes(2 * k) & 0xff) | (bytes(2 * k + 1) << 8)).toShort)
        (f.getSampleRate.toInt, f.getChannels, samples)
      } finally conv.close()
    } finally in.close()
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
