package graft.multimodal

/** Deterministic planted WELL-FORMED media payloads (r15 verdict #3):
  * structurally valid PNG (real CRC32 chunks) and BMP
  * (BITMAPINFOHEADER + pixel array) files built byte-by-byte from the
  * public format specs, with their TRUE dimensions declared alongside.
  * q_mm_meta unions these (negative ids — disjoint from every corpus)
  * with the corpus payloads, so the driver's oracle-checked row is
  * live evidence that [[Multimodal.HeaderCodec]] parses real byte
  * formats, not just that the stub formula agrees with itself; the
  * oracle carries the same rows as literals built FROM THIS SEQ (one
  * source of truth, zero drift).
  */
object MmFixture {

  final case class Planted(id: Long, format: String, width: Int,
      height: Int, channels: Int, bytes: Array[Byte])

  private def be32(v: Int): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def le32(v: Int): Array[Byte] = Array(
    v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  /** Minimal structurally valid PNG: signature + IHDR + IEND, each
    * chunk with its real CRC32 over tag+data.
    */
  def png(w: Int, h: Int, colorType: Int, bitDepth: Int = 8): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val td = tag.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32(); crc.update(td)
      be32(data.length) ++ td ++ be32(crc.getValue.toInt)
    }
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](bitDepth.toByte, colorType.toByte, 0, 0, 0)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IEND", Array.empty[Byte])
  }

  /** Minimal valid BMP: BITMAPFILEHEADER + BITMAPINFOHEADER(40) + a
    * zeroed pixel array of the correct 4-byte-aligned row size.
    * Negative `h` encodes top-down row order (a real BMP feature the
    * parser must abs()).
    */
  def bmp(w: Int, h: Int, bpp: Int): Array[Byte] = {
    val rowSize = ((bpp * w + 31) / 32) * 4
    val dataSize = rowSize * math.abs(h)
    Array[Byte]('B', 'M') ++ le32(54 + dataSize) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(bpp) ++ le32(0) ++
      le32(dataSize) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      new Array[Byte](dataSize)
  }

  /** The planted set: every PNG color-type channel mapping, both BMP
    * pixel depths that matter at training scale, and a top-down BMP.
    */
  val planted: Seq[Planted] = Seq(
    Planted(-1L, "png", 640, 480, 3, png(640, 480, colorType = 2)),
    Planted(-2L, "png", 17, 1, 1, png(17, 1, colorType = 0)),
    Planted(-3L, "png", 2, 3, 4, png(2, 3, colorType = 6)),
    Planted(-4L, "png", 31, 9, 2, png(31, 9, colorType = 4)),
    Planted(-5L, "bmp", 800, 600, 3, bmp(800, 600, 24)),
    Planted(-6L, "bmp", 13, 7, 4, bmp(13, 7, 32)),
    Planted(-7L, "bmp", 16, 16, 1, bmp(16, -16, 8)))

  /** The planted rows as SQL literals for the oracle side — built from
    * [[planted]] itself so the two engines share one definition.
    */
  val plantedMetaSql: String = planted.map(p =>
    s"SELECT '${p.format}' AS format, ${p.width} AS width, " +
      s"${p.height} AS height, ${p.channels} AS channels").mkString("\n  UNION ALL ")

  /** The planted rows as (doc_id, len, w, h, c) literals for the
    * q_mm_resize oracle: only the DECODED INPUTS are literal — the
    * fit-dimension arithmetic runs in SQL exactly as for corpus rows,
    * so the row cross-checks the engine's fitDims on real decoded
    * dims rather than echoing precomputed answers.
    */
  val plantedResizeSql: String = planted.map(p =>
    s"SELECT CAST(${p.id} AS BIGINT) AS doc_id, ${p.bytes.length} AS len, " +
      s"${p.width} AS w, ${p.height} AS h, ${p.channels} AS c")
    .mkString("\n  UNION ALL ")
}
