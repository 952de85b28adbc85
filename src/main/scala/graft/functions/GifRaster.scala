package graft.functions

/** Zero-dependency GIF raster decode — every frame's RAW stored raster
  * as integer LUMA, straight from the spec (GIF89a, CompuServe 1990):
  * Logical Screen Descriptor → global color table → block walk
  * (extensions skipped by their sub-block framing, image descriptors
  * decoded) → per-frame LZW decompression → palette luma mapping →
  * interlace reordering. Replaces the JDK ImageIO path in
  * [[GifDhash]]/[[GifFrameDhashes]]: ImageIO spends ~1 ms/frame on
  * metadata plumbing, color-model setup and BufferedImage allocation
  * for 72×64 rasters the LZW decode itself handles in tens of µs —
  * measured 2.3 → ~1 s on the mm_frames_gif walk at sf0.1. ImageIO
  * stays as the REFERENCE in the specs: PropertySpec-style sweeps pin
  * `GifRaster` luma-identical to the JDK decoder on ImageIO-written
  * images.
  *
  * The luma map is the shared percept-space formula
  * ((77R+150G+29B)>>8, weights summing to 256 so gray palettes map to
  * their gray value exactly) — bit-identical to
  * [[JpegDhash.dhashOfImage]]'s BufferedImage path, which is what the
  * published oracle hashes replay.
  *
  * Raw-raster contract (same as the ImageIO path had): frames hash
  * their STORED rasters at their own dimensions — no canvas
  * compositing, no disposal method application; transparent indices
  * keep their palette color (alpha is not part of the hash space).
  * Hostile bounds: every read is length-checked, palette indices must
  * be inside the active palette, LZW codes inside the dictionary,
  * caps on frames and pixels enforced by the caller per frame — any
  * violation returns null, never junk pixels.
  */
object GifRaster {

  /** One decoded frame: stored-raster dims + luma pixels. */
  final class Frame(val w: Int, val h: Int, val luma: Array[Int])

  /** Decode up to `maxFrames` frames, each gated at `maxPixels`.
    * Null on any malformation; empty array for a trailer-only GIF. */
  def frames(blob: Array[Byte], maxFrames: Int, maxPixels: Long): Array[Frame] = {
    if (blob == null || blob.length < 13) return null
    if (blob(0) != 'G' || blob(1) != 'I' || blob(2) != 'F' ||
        blob(3) != '8' || (blob(4) != '7' && blob(4) != '9') ||
        blob(5) != 'a') return null
    def u16(p: Int): Int = (blob(p) & 0xff) | ((blob(p + 1) & 0xff) << 8)
    val packed = blob(10) & 0xff
    var p = 13
    // global color table → luma palette
    var global: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      global = readPalette(blob, p, n)
      if (global == null) return null
      p += 3 * n
    }
    val out = new java.util.ArrayList[Frame](4)
    while (true) {
      if (p >= blob.length) return null // missing trailer
      (blob(p) & 0xff) match {
        case 0x3b => // trailer
          return out.toArray(Array.empty[Frame])
        case 0x21 => // extension: label + sub-blocks
          p += 2
          p = skipSubBlocks(blob, p)
          if (p < 0) return null
        case 0x2c => // image descriptor
          if (out.size() >= maxFrames) return out.toArray(Array.empty[Frame])
          if (p + 10 > blob.length) return null
          val w = u16(p + 5)
          val h = u16(p + 7)
          val ipk = blob(p + 9) & 0xff
          p += 10
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return null
          var pal = global
          if ((ipk & 0x80) != 0) {
            val n = 1 << ((ipk & 7) + 1)
            pal = readPalette(blob, p, n)
            if (pal == null) return null
            p += 3 * n
          }
          if (pal == null) return null // no active palette: malformed
          if (p >= blob.length) return null
          val minCode = blob(p) & 0xff
          p += 1
          if (minCode < 1 || minCode > 11) return null
          // concatenate the LZW sub-block payloads
          val dataEnd = skipSubBlocks(blob, p)
          if (dataEnd < 0) return null
          val idx = lzw(blob, p, dataEnd, minCode, w * h)
          if (idx == null) return null
          p = dataEnd
          val luma = new Array[Int](w * h)
          val interlaced = (ipk & 0x40) != 0
          if (!interlaced) {
            var i = 0
            while (i < luma.length) {
              val v = idx(i) & 0xff
              if (v >= pal.length) return null
              luma(i) = pal(v)
              i += 1
            }
          } else {
            // 4-pass interlace: rows 0,8,16… then 4,12… then 2,6… then 1,3…
            var src = 0
            var pass = 0
            val starts = Array(0, 4, 2, 1)
            val steps = Array(8, 8, 4, 2)
            while (pass < 4) {
              var y = starts(pass)
              while (y < h) {
                var x = 0
                while (x < w) {
                  val v = idx(src) & 0xff
                  if (v >= pal.length) return null
                  luma(y * w + x) = pal(v)
                  src += 1; x += 1
                }
                y += steps(pass)
              }
              pass += 1
            }
          }
          out.add(new Frame(w, h, luma))
        case _ => return null // unknown block introducer
      }
    }
    null // unreachable
  }

  /** 3-byte RGB entries → luma palette; null on overrun. */
  private def readPalette(blob: Array[Byte], p: Int, n: Int): Array[Int] = {
    if (p + 3 * n > blob.length) return null
    val pal = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = blob(p + 3 * i) & 0xff
      val g = blob(p + 3 * i + 1) & 0xff
      val b = blob(p + 3 * i + 2) & 0xff
      pal(i) = (77 * r + 150 * g + 29 * b) >> 8
      i += 1
    }
    pal
  }

  /** Step past a sub-block chain (len byte + payload, 0 terminates);
    * negative sentinel on overrun. */
  private def skipSubBlocks(blob: Array[Byte], from: Int): Int = {
    var p = from
    while (true) {
      if (p >= blob.length) return -1
      val len = blob(p) & 0xff
      p += 1
      if (len == 0) return p
      p += len
    }
    -1 // unreachable
  }

  /** GIF-variant LZW over the sub-block chain [from, end): LSB-first
    * codes, clear/EOI, dictionary growth to 12 bits with the deferred
    * -clear cap. Exactly `nPixels` indices or null. */
  private def lzw(blob: Array[Byte], from: Int, end: Int,
                  minCode: Int, nPixels: Int): Array[Byte] = {
    val out = new Array[Byte](nPixels)
    var outPos = 0
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Short](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var next = eoi + 1
    var codeSize = minCode + 1
    var prev = -1
    // bit reader over the sub-block payloads
    var p = from
    var blockLeft = 0
    var bits = 0
    var nBits = 0
    var done = false
    while (!done) {
      // fill bits
      while (nBits < codeSize && !done) {
        if (blockLeft == 0) {
          if (p >= end) { done = true }
          else {
            blockLeft = blob(p) & 0xff
            p += 1
            if (blockLeft == 0) done = true // terminator before EOI
          }
        }
        if (!done && blockLeft > 0) {
          bits |= (blob(p) & 0xff) << nBits
          nBits += 8
          p += 1
          blockLeft -= 1
        }
      }
      if (nBits < codeSize) {
        // ran out of data; valid only if the raster is already full
        return if (outPos == nPixels) out else null
      }
      val code = bits & ((1 << codeSize) - 1)
      bits >>>= codeSize
      nBits -= codeSize
      if (code == clear) {
        next = eoi + 1
        codeSize = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return if (outPos == nPixels) out else null
      } else if (prev < 0) {
        // first code after (re)initialization must be a literal
        if (code >= clear) return null
        out(outPos) = code.toByte
        outPos += 1
        if (outPos == nPixels) return out
        prev = code
      } else {
        if (code > next) return null
        // expand into the stack, reversed. KwKwK (code == next): the
        // entry is expansion(prev) ++ firstOf(prev) — push the first
        // byte below, then walk prev's chain on top of it.
        var sp = 0
        var c = if (code == next) prev else code
        if (code == next) { stack(sp) = firstOf(prev, prefix, suffix, clear); sp += 1 }
        while (c >= clear + 2) { // composite codes
          stack(sp) = suffix(c); sp += 1
          c = prefix(c) & 0xffff
        }
        if (c >= clear) return null // chain must bottom out at a literal
        stack(sp) = c.toByte; sp += 1
        if (outPos + sp > nPixels) return null
        var i = sp - 1
        while (i >= 0) { out(outPos) = stack(i); outPos += 1; i -= 1 }
        if (next < 4096) {
          prefix(next) = prev.toShort
          suffix(next) = stack(sp - 1) // first byte of the emitted entry
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
        // raster complete; trailing EOI/terminator may follow — accept
        if (outPos == nPixels) return out
      }
    }
    if (outPos == nPixels) out else null
  }

  /** First byte of a code's expansion. */
  private def firstOf(code: Int, prefix: Array[Short], suffix: Array[Byte],
                      clear: Int): Byte = {
    var c = code
    while (c >= clear + 2) c = prefix(c) & 0xffff
    c.toByte
  }
}
