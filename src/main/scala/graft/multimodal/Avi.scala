package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/AVI container codec for Motion-JPEG video — the one
  * video format decodable with nothing but the JDK, because each frame
  * is an ordinary JPEG (`javax.imageio`) and the container is plain
  * RIFF chunk framing. This turns the engine's video path from a
  * byte-histogram stub into a REAL decode: parse the container, pull
  * the `##dc`/`##db` frame chunks, decode each as a JPEG.
  *
  * Container layout follows the public AVI RIFF spec (Microsoft
  * "AVI RIFF File Reference"): a `RIFF:AVI ` file holds an `hdrl` LIST
  * (`avih` main header + one `strl` per stream with `strh`/`strf`), a
  * `movi` LIST whose sub-chunks are the frames (optionally wrapped in
  * `rec ` LISTs), and an optional `idx1` index. All integers are
  * little-endian; chunks are padded to even offsets.
  *
  * Reference capability mirrored: the reference SDK has no video
  * decode either (SURVEY §2 — m1 carries image/audio); this closes the
  * training-data-pipeline gap flagged in round 7 ("m1 video decode
  * remains stubbed") for the MJPEG subset a pure-JVM cluster can
  * actually run. Exotic codecs still fall back to the declared stub.
  */
object Avi {

  /** True when the payload carries the 12-byte `RIFF....AVI ` magic —
    * the content sniff the kernels use to dispatch, so the real path
    * triggers even when no metadata struct travels with the bytes.
    */
  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  // ---------------------------------------------------------------- decode

  /** Parse an AVI payload and return the raw frame payloads (JPEG bytes
    * for MJPEG) in container order, or None when the bytes are not a
    * well-formed AVI. Walks the chunk tree iteratively; only the `movi`
    * LIST (and any `rec ` LISTs inside it) is descended into — header
    * chunks are skipped wholesale. Defensive against truncated or
    * corrupt sizes: any out-of-bounds read aborts to None rather than
    * throwing, matching the null-features quarantine contract of the
    * other decode kernels.
    */
  def decodeFrames(bytes: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (!isAvi(bytes)) return None
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val riffEnd = math.min(8L + (bb.getInt(4) & 0xffffffffL), bytes.length.toLong).toInt
      val frames = Vector.newBuilder[Array[Byte]]
      // stack of (pos, end) scan ranges; start after "RIFF<size>AVI "
      var ranges = List((12, riffEnd))
      while (ranges.nonEmpty) {
        var (pos, end) = ranges.head
        ranges = ranges.tail
        while (pos + 8 <= end) {
          val id = fourcc(bytes, pos)
          val size = bb.getInt(pos + 4) & 0xffffffffL
          val dataStart = pos + 8
          val dataEnd = dataStart + size
          if (dataEnd > end || size > Int.MaxValue) { pos = end } // corrupt size: stop this range
          else {
            if (id == "LIST" && size >= 4) {
              val listType = fourcc(bytes, dataStart)
              if (listType == "movi" || listType == "rec ")
                ranges = ((dataStart + 4, dataEnd.toInt)) :: ranges
            } else if (isFrameChunk(id) && size > 0) {
              frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd.toInt)
            }
            pos = (dataEnd + (size & 1L)).toInt // chunks pad to even
          }
        }
      }
      val out = frames.result()
      if (out.isEmpty) None else Some(out)
    } catch { case _: Exception => None }
  }

  /** Frame chunks are `##dc` (compressed video) / `##db` (uncompressed);
    * `##` is the two-digit stream number.
    */
  private def isFrameChunk(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      ((id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')))

  private def fourcc(bytes: Array[Byte], pos: Int): String =
    new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)

  // ---------------------------------------------------------------- encode

  /** Assemble JPEG frames into a minimal spec-conformant MJPEG AVI
    * (single `vids`/`MJPG` stream, `avih` + `strh`/`strf` headers,
    * `movi` with one `00dc` chunk per frame, `idx1` keyframe index).
    * Used by the fixture synthesizer — every byte is deterministic, so
    * packed payloads are bit-stable across runs and partitionings.
    */
  def encode(frames: Seq[Array[Byte]], width: Int, height: Int, fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    val maxFrame = frames.map(_.length).max
    val strf = chunk("strf", le32(40, width, height) ++ le16(1, 24) ++
      fourccBytes("MJPG") ++ le32(width * height * 3, 0, 0, 0, 0))
    val strh = chunk("strh", fourccBytes("vids") ++ fourccBytes("MJPG") ++
      le32(0, 0, 0, 1, fps, 0, frames.length, maxFrame, -1, 0) ++
      le16(0, 0, width, height))
    val avih = chunk("avih", le32(
      1000000 / math.max(fps, 1), // dwMicroSecPerFrame
      maxFrame * fps,             // dwMaxBytesPerSec
      0,                          // dwPaddingGranularity
      0x10,                       // dwFlags: AVIF_HASINDEX
      frames.length, 0, 1, maxFrame, width, height, 0, 0, 0, 0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val moviBody = new ByteArrayOutputStream()
    val idxBody = new ByteArrayOutputStream()
    var offset = 4 // idx1 offsets are relative to the 'movi' fourcc
    frames.foreach { f =>
      moviBody.write(chunk("00dc", f))
      idxBody.write(fourccBytes("00dc"))
      idxBody.write(le32(0x10, offset, f.length)) // AVIIF_KEYFRAME
      offset += 8 + f.length + (f.length & 1)
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = chunk("idx1", idxBody.toByteArray)
    val body = fourccBytes("AVI ") ++ hdrl ++ movi ++ idx1
    fourccBytes("RIFF") ++ le32(body.length) ++ body
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourccBytes(listType) ++ body)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if ((body.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray
    fourccBytes(id) ++ le32(body.length) ++ body ++ pad
  }

  private def fourccBytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def le32(vs: Int*): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putInt)
    bb.array()
  }

  private def le16(vs: Int*): Array[Byte] = {
    val bb = ByteBuffer.allocate(2 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }
}
