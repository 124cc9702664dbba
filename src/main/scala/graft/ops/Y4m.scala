package graft.ops

/**
 * Pure-JVM Y4M (YUV4MPEG2, mono colorspace) codec — the m-family's THIRD
 * real modality beside [[Pgm]] images and [[Wav]] audio. Y4M is chosen
 * the same way: a real, widely-produced container (ffmpeg/mjpegtools
 * write it as the uncompressed video interchange format), exactly
 * implementable with zero native libraries, and `Cmono` luma planes are
 * plain unsigned bytes — so decode → frame-sample / scene-cut stays
 * bit-exact and DuckDB-replayable, keeping video rows inside the same
 * hash-checked correctness gate as image and audio rows.
 *
 * Container layout (yuv4mpeg spec):
 *   `YUV4MPEG2 W<w> H<h> F<num>:<den> [I.. A..:.. C<space> X..]\n`
 *   then per frame: `FRAME[ params]\n` + the raw plane bytes
 *   (Cmono ⇒ exactly w·h luma bytes per frame, no chroma planes).
 * Unknown stream/frame parameters are tolerated per the spec; everything
 * malformed — wrong magic, missing W/H/F, a non-mono colorspace, a
 * truncated frame, trailing bytes — throws loudly (the [[Pgm.decode]]
 * codec contract).
 *
 * Scale: per-row CPU inside `mapPartitions` — no shuffle, no state; a
 * production swap-in for H.264/VP9 replaces [[decode]]'s body behind the
 * same signature (frames out as byte planes), everything downstream
 * (sampling, SAD deltas, digests) is format-agnostic.
 */
object Y4m {

  /** Decoded clip: `frames` row-major luma planes, one SIGNED byte per
    * pixel (read via `& 0xff`). */
  final case class Video(width: Int, height: Int, fpsNum: Int,
                         fpsDen: Int, frames: Array[Array[Byte]])

  /** Serialize to YUV4MPEG2 bytes: canonical header with `Cmono`. */
  def encode(v: Video): Array[Byte] = {
    require(v.width > 0 && v.height > 0, s"bad dims ${v.width}x${v.height}")
    require(v.width.toLong * v.height <= Int.MaxValue,
      s"plane ${v.width}x${v.height} overflows the byte-array bound")
    require(v.fpsNum > 0 && v.fpsDen > 0,
      s"bad frame rate ${v.fpsNum}:${v.fpsDen}")
    val n = v.width * v.height
    v.frames.foreach(f => require(f.length == n,
      s"frame plane ${f.length} != ${v.width}x${v.height}"))
    val header = (s"YUV4MPEG2 W${v.width} H${v.height} " +
      s"F${v.fpsNum}:${v.fpsDen} Ip A1:1 Cmono\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val fm = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    // Long total: frames·(marker+plane) wraps Int for ~2^20 frames of a
    // 4 KB plane — fail loudly instead of a negative/short allocation
    val totalL = header.length.toLong +
      v.frames.length.toLong * (fm.length + n)
    require(totalL <= Int.MaxValue,
      s"${v.frames.length} frames of ${v.width}x${v.height} " +
        s"($totalL bytes) overflow the byte-array bound")
    val out = new Array[Byte](totalL.toInt)
    var pos = 0
    System.arraycopy(header, 0, out, pos, header.length); pos += header.length
    v.frames.foreach { f =>
      System.arraycopy(fm, 0, out, pos, fm.length); pos += fm.length
      System.arraycopy(f, 0, out, pos, n); pos += n
    }
    out
  }

  /** Parse YUV4MPEG2 bytes (parameter-tolerant header per the spec,
    * mono-plane only). Throws IllegalArgumentException on anything
    * malformed. */
  def decode(bytes: Array[Byte]): Video = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed Y4M: $msg")
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      if (pos >= bytes.length) fail("unterminated header line")
      val s = new String(bytes, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
      pos += 1
      s
    }
    val hdr = line().split(' ')
    if (hdr.isEmpty || hdr(0) != "YUV4MPEG2") fail("missing YUV4MPEG2 magic")
    var w = -1; var h = -1; var fn = -1; var fd = -1; var mono = false
    var cSeen = false
    hdr.drop(1).filter(_.nonEmpty).foreach { p =>
      def num(s: String): Int =
        try s.toInt catch { case _: NumberFormatException =>
          fail(s"non-numeric header param '$p'") }
      p.head match {
        case 'W' => w = num(p.tail)
        case 'H' => h = num(p.tail)
        case 'F' => p.tail.split(':') match {
          case Array(a, b) => fn = num(a); fd = num(b)
          case _ => fail(s"bad frame rate '$p'")
        }
        case 'C' => cSeen = true; mono = p.tail == "mono"
        case _ => () // I/A/X params tolerated per the spec
      }
    }
    if (w <= 0 || h <= 0) fail(s"missing/bad dims W$w H$h")
    // Int-overflow guard: W65536 H65536 would wrap w*h to 0 and the
    // frame loop would silently accept empty planes — a malformed
    // container must throw, not decode (the codec contract).
    if (w.toLong * h > Int.MaxValue) fail(s"plane ${w}x$h overflows")
    if (fn <= 0 || fd <= 0) fail("missing/bad frame rate")
    if (!cSeen) fail("missing colorspace (default C420 is not mono)")
    if (!mono) fail("non-mono colorspace")
    val n = w * h
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (pos < bytes.length) {
      val fl = line()
      if (fl != "FRAME" && !fl.startsWith("FRAME "))
        fail(s"expected FRAME marker, got '${fl.take(16)}'")
      // Long compare: pos + n wraps Int when a crafted header claims a
      // near-2^31 plane, sailing past this check into a raw copy error
      if (pos.toLong + n > bytes.length)
        fail(s"truncated frame ${frames.size}: ${bytes.length - pos} of $n bytes")
      frames += java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
    }
    Video(w, h, fn, fd, frames.toArray)
  }
}
