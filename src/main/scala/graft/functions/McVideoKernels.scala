package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow

/** Pure-JVM MOTION-COMPENSATED TRANSFORM video codec — the MPEG-1-style
  * I/P-frame seam the MS-RLE8 delta codec left open
  * ([[RleVideoKernels]] carries unchanged pixels forward; this codec
  * carries MOVED content forward): 8×8 block DCT with uniform
  * quantization, forward motion compensation with an integer-pel
  * full-search against the previous RECONSTRUCTED frame, and per-block
  * inter/intra mode decision — the essential mechanics of
  * ISO/IEC 11172-2 (MPEG-1 Video), in an honestly SELF-SPECIFIED
  * bitstream (documented below) rather than a conformance claim: real
  * MPEG-1 entropy coding is a large VLC-table surface orthogonal to the
  * motion/transform machinery this seam exists to ship. The container is
  * a real AVI ('GMC1' stream fourcc through the same RIFF walk as
  * MJPG/MRLE).
  *
  * Frames are single-plane 8-bit (luminance); dimensions are padded up
  * to block multiples with edge replication and cropped after decode
  * (the standard macroblock-padding convention). Frame 0 is always an
  * I-frame; later frames are P-frames predicting from their
  * predecessor's reconstruction.
  *
  * Bitstream, per frame:
  *   byte 0: 'I' or 'P'
  *   I-frame: per 8×8 block (raster order over the padded canvas), the
  *     quantized DCT coefficients of the level-shifted block as zigzag
  *     (run, level) pairs — run byte (0–63 zeros before the level),
  *     level as 2-byte little-endian signed — terminated by an EOB byte
  *     0xFF. An all-zero block is a bare EOB.
  *   P-frame: per block a MODE byte:
  *     0 = skip            (MV (0,0), zero residual — copy previous)
  *     1 = MC only         (+ mvx, mvy signed bytes; zero residual)
  *     2 = MC + residual   (+ mvx, mvy, then residual coefficients)
  *     3 = intra           (+ intra coefficients, as in an I-frame)
  *
  * RECONSTRUCTION IS THE CONTRACT: encoder and decoder run the identical
  * predict + dequantize + IDCT + round + clamp arithmetic, so the
  * decoded frame is BIT-EQUAL to the encoder's own reconstruction
  * (certified as `recon_exact` — the exact half of the certification),
  * while the reconstruction differs from the SOURCE only by the
  * quantization error (certified against [[JpegKernels.ErrBound]] — the
  * lossy half). Same defensive contract as every codec here: decoders
  * return null on malformed/truncated input (wrong frame type, a P
  * frame with no reference, coefficient overruns, a motion vector
  * pointing off the canvas, trailing bytes), never throw.
  */
object McVideoKernels {

  private val QuantZig = Array.fill(64)(JpegKernels.Q)
  /** Motion search range (integer pel, full search, ±). */
  final val SearchRange = 4

  @inline private[functions] def pad8(v: Int): Int = (v + 7) & ~7

  /** Edge-replicate `src` (w×h, top-down) onto the padded W×H canvas. */
  private[graft] def padCanvas(src: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val W = pad8(w); val H = pad8(h)
    val out = new Array[Byte](W * H)
    var y = 0
    while (y < H) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < W) {
        out(y * W + x) = src(sy * w + math.min(x, w - 1))
        x += 1
      }
      y += 1
    }
    out
  }

  private[functions] def cropCanvas(padded: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val W = pad8(w)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(padded, y * W, out, y * w, w)
      y += 1
    }
    out
  }

  /** Zigzag run-level coding of one quantized coefficient block
    * (natural-order input), EOB-terminated. */
  private def writeCoefs(out: java.io.ByteArrayOutputStream,
                         coef: Array[Int]): Unit = {
    var run = 0
    var z = 0
    while (z < 64) {
      val v = coef(JpegKernels.Zig(z))
      if (v == 0) run += 1
      else {
        out.write(run)
        out.write(v & 0xff)
        out.write((v >> 8) & 0xff)
        run = 0
      }
      z += 1
    }
    out.write(0xff) // EOB
  }

  /** Parse one coefficient block into `coef` (natural order, zeroed
    * first). Returns the next offset, or -1 on malformation. */
  private def readCoefs(data: Array[Byte], start: Int,
                        coef: Array[Int]): Int = {
    java.util.Arrays.fill(coef, 0)
    var p = start
    var z = 0
    while (p < data.length) {
      val b0 = data(p) & 0xff
      p += 1
      if (b0 == 0xff) return p // EOB
      if (b0 > 63 || z + b0 >= 64 || p + 2 > data.length) return -1
      z += b0
      val lv = ((data(p) & 0xff) | (data(p + 1) << 8)).toShort.toInt
      p += 2
      if (lv == 0) return -1 // a zero level is never coded
      coef(JpegKernels.Zig(z)) = lv
      z += 1
    }
    -1 // ran out before EOB: truncated
  }

  /** Dequantize + IDCT `coef` and add onto the prediction, rounding and
    * clamping — THE shared reconstruction arithmetic (encoder and
    * decoder both call exactly this). `predBase` is 128.0 for intra
    * blocks (the level shift) or the MC prediction for inter blocks. */
  private[functions] def reconstructBlock(coef: Array[Int], pred: (Int, Int) => Double,
                               canvas: Array[Byte], W: Int,
                               bx: Int, by: Int): Unit = {
    val res = new Array[Double](64)
    JpegKernels.idctDequantWith(coef, QuantZig, res)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val v = math.round(pred(x, y) + res(y * 8 + x)).toInt
        canvas((by + y) * W + bx + x) =
          math.max(0, math.min(255, v)).toByte
        x += 1
      }
      y += 1
    }
  }

  /** One block's coding decision, serialization-agnostic — the hand-off
    * between the mode/motion/transform machinery and a bitstream coder
    * (the self-specified byte coder below, or [[McVlcKernels]]'s
    * Annex-B-shaped VLC coder — both serialize the SAME plan, so their
    * reconstruction chains are identical by construction).
    * `mode`: -1 I-frame intra block (coef = intra coefficients),
    * 0 skip, 1 MC only, 2 MC+residual (coef = residual), 3 P-intra.
    * `intraCoef` carries the block's INTRA coefficients for every
    * P-frame block (the mode decision computes them anyway) — the
    * all-intra alternative any serializer can price without a second
    * planning pass; equals `coef` for mode 3 and for I-frame blocks. */
  private[graft] final class BlockPlan(val mode: Int, val mx: Int,
                                       val my: Int, val coef: Array[Int],
                                       val intraCoef: Array[Int])

  /** Plan one frame: mode decision, motion search, quantized
    * coefficients, and the reconstruction — everything EXCEPT
    * serialization. `cur` is the PADDED W×H source canvas; `prevRecon`
    * the PADDED previous reconstruction (null ⇒ I-frame). The mode
    * decision prices alternatives with the BYTE coder's costs (the
    * codec's fixed cost model; the VLC coder inherits the same
    * decisions, keeping the two bitstreams reconstruction-equal).
    * `mvUsed` (length ≥ 1) reports whether any nonzero motion vector
    * was chosen (index 0, OR-ed). The third result is the byte size an
    * ALL-INTRA byte coding of this frame would have cost — the mode
    * decision intra-codes every P block anyway, so the `inter_saves`
    * baseline falls out of the same pass free. */
  private[graft] def planFrame(cur: Array[Byte], prevRecon: Array[Byte],
                               W: Int, H: Int, mvUsed: Array[Boolean])
      : (Array[BlockPlan], Array[Byte], Long) = {
    val recon = new Array[Byte](W * H)
    val isI = prevRecon == null
    val plans = new Array[BlockPlan]((W / 8) * (H / 8))
    var bi = 0
    var intraAlt = 1L
    val blockIn = new Array[Double](64)
    var by = 0
    while (by < H) {
      var bx = 0
      while (bx < W) {
        if (isI) {
          val coef = new Array[Int](64)
          intraCode(cur, W, bx, by, blockIn, coef)
          plans(bi) = new BlockPlan(-1, 0, 0, coef, coef)
          reconstructBlock(coef, (_, _) => 128.0, recon, W, bx, by)
        } else {
          // full-search integer-pel MC against the previous recon,
          // (0,0) seeded so ties keep the zero vector
          var bestSad = sad(cur, prevRecon, W, H, bx, by, 0, 0)
          var bmx = 0; var bmy = 0
          var my = -SearchRange
          while (my <= SearchRange) {
            var mx = -SearchRange
            while (mx <= SearchRange) {
              if ((mx != 0 || my != 0) &&
                  bx + mx >= 0 && bx + mx + 8 <= W &&
                  by + my >= 0 && by + my + 8 <= H) {
                val s = sad(cur, prevRecon, W, H, bx, by, mx, my)
                if (s < bestSad) { bestSad = s; bmx = mx; bmy = my }
              }
              mx += 1
            }
            my += 1
          }
          // residual after MC, quantized
          val coef = new Array[Int](64)
          var i = 0
          while (i < 64) {
            val x = i & 7; val y = i >> 3
            blockIn(i) = (cur((by + y) * W + bx + x) & 0xff).toDouble -
              (prevRecon((by + y + bmy) * W + bx + x + bmx) & 0xff).toDouble
            i += 1
          }
          JpegKernels.fdctQuant(blockIn, coef)
          val interBody = new java.io.ByteArrayOutputStream(32)
          writeCoefs(interBody, coef)
          val interZero = coef.forall(_ == 0)
          // candidate intra coding of the same block
          val intraCoef = new Array[Int](64)
          intraCode(cur, W, bx, by, blockIn, intraCoef)
          val intraBody = new java.io.ByteArrayOutputStream(32)
          writeCoefs(intraBody, intraCoef)
          val interCost =
            if (interZero) (if (bmx == 0 && bmy == 0) 1 else 3)
            else 3 + interBody.size
          val intraCost = 1 + intraBody.size
          intraAlt += intraBody.size // the I-frame coding of this block
          if (interCost <= intraCost) {
            if (bmx != 0 || bmy != 0) mvUsed(0) = true
            plans(bi) =
              if (interZero && bmx == 0 && bmy == 0)
                new BlockPlan(0, 0, 0, null, intraCoef)
              else if (interZero) new BlockPlan(1, bmx, bmy, null, intraCoef)
              else new BlockPlan(2, bmx, bmy, coef, intraCoef)
            val (pmx, pmy) = (bmx, bmy)
            val cf = if (interZero) zeroCoef else coef
            reconstructBlock(cf,
              (x, y) => (prevRecon((by + y + pmy) * W + bx + x + pmx) & 0xff).toDouble,
              recon, W, bx, by)
          } else {
            plans(bi) = new BlockPlan(3, 0, 0, intraCoef, intraCoef)
            reconstructBlock(intraCoef, (_, _) => 128.0, recon, W, bx, by)
          }
        }
        bi += 1
        bx += 8
      }
      by += 8
    }
    (plans, recon, if (isI) -1L else intraAlt)
  }

  /** Serialize a frame plan with the self-specified BYTE coder (the
    * bitstream documented above). */
  private[graft] def serializeBytes(isI: Boolean,
                                    plans: Array[BlockPlan]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(plans.length * 8 + 16)
    out.write(if (isI) 'I' else 'P')
    var bi = 0
    while (bi < plans.length) {
      val p = plans(bi)
      p.mode match {
        case -1 => writeCoefs(out, p.coef)
        case 0 => out.write(0)
        case 1 =>
          out.write(1); out.write(p.mx & 0xff); out.write(p.my & 0xff)
        case 2 =>
          out.write(2); out.write(p.mx & 0xff); out.write(p.my & 0xff)
          writeCoefs(out, p.coef)
        case 3 =>
          out.write(3); writeCoefs(out, p.coef)
      }
      bi += 1
    }
    out.toByteArray
  }

  /** Encode one frame with the byte coder: [[planFrame]] +
    * [[serializeBytes]]. Returns (bitstream, reconstruction, all-intra
    * alternative size) — see [[planFrame]]. */
  private[graft] def mcEncodeFrame(cur: Array[Byte], prevRecon: Array[Byte],
                                   W: Int, H: Int, mvUsed: Array[Boolean])
      : (Array[Byte], Array[Byte], Long) = {
    val (plans, recon, intraAlt) = planFrame(cur, prevRecon, W, H, mvUsed)
    val bits = serializeBytes(prevRecon == null, plans)
    (bits, recon, if (prevRecon == null) bits.length.toLong else intraAlt)
  }

  private[functions] val zeroCoef = new Array[Int](64)

  private def intraCode(cur: Array[Byte], W: Int, bx: Int, by: Int,
                        blockIn: Array[Double], coef: Array[Int]): Unit = {
    var i = 0
    while (i < 64) {
      val x = i & 7; val y = i >> 3
      blockIn(i) = (cur((by + y) * W + bx + x) & 0xff) - 128.0
      i += 1
    }
    JpegKernels.fdctQuant(blockIn, coef)
  }

  private def sad(cur: Array[Byte], ref: Array[Byte], W: Int, H: Int,
                  bx: Int, by: Int, mx: Int, my: Int): Int = {
    var s = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        s += math.abs((cur((by + y) * W + bx + x) & 0xff) -
          (ref((by + y + my) * W + bx + x + mx) & 0xff))
        x += 1
      }
      y += 1
    }
    s
  }

  /** Decode one frame over the previous PADDED reconstruction (null ⇒
    * the stream must be an I-frame). Returns the new padded
    * reconstruction, or null on ANY malformation: wrong/unknown frame
    * type, a P-frame without a reference, a coefficient stream that
    * overruns or lacks its EOB, a motion vector pointing off the
    * canvas, an unknown block mode, or trailing bytes after the last
    * block. */
  def mcDecodeFrame(data: Array[Byte], prevRecon: Array[Byte],
                    W: Int, H: Int): Array[Byte] = {
    if (data == null || data.length < 1 || W <= 0 || H <= 0 ||
        (W & 7) != 0 || (H & 7) != 0 ||
        (prevRecon != null && prevRecon.length != W * H)) return null
    val isI = data(0) == 'I'
    if (!isI && data(0) != 'P') return null
    if (!isI && prevRecon == null) return null
    val recon = new Array[Byte](W * H)
    val coef = new Array[Int](64)
    var p = 1
    var by = 0
    while (by < H) {
      var bx = 0
      while (bx < W) {
        if (isI) {
          p = readCoefs(data, p, coef)
          if (p < 0) return null
          reconstructBlock(coef, (_, _) => 128.0, recon, W, bx, by)
        } else {
          if (p >= data.length) return null
          val mode = data(p) & 0xff
          p += 1
          mode match {
            case 0 =>
              val (cbx, cby) = (bx, by)
              reconstructBlock(zeroCoef,
                (x, y) => (prevRecon((cby + y) * W + cbx + x) & 0xff).toDouble,
                recon, W, bx, by)
            case 1 | 2 =>
              if (p + 2 > data.length) return null
              val mx = data(p).toInt; val my = data(p + 1).toInt
              p += 2
              if (bx + mx < 0 || bx + mx + 8 > W ||
                  by + my < 0 || by + my + 8 > H) return null
              if (mode == 2) {
                p = readCoefs(data, p, coef)
                if (p < 0) return null
              } else java.util.Arrays.fill(coef, 0)
              val (cbx, cby) = (bx, by)
              reconstructBlock(coef,
                (x, y) => (prevRecon((cby + y + my) * W + cbx + x + mx) & 0xff).toDouble,
                recon, W, bx, by)
            case 3 =>
              p = readCoefs(data, p, coef)
              if (p < 0) return null
              reconstructBlock(coef, (_, _) => 128.0, recon, W, bx, by)
            case _ => return null
          }
        }
        bx += 8
      }
      by += 8
    }
    if (p != data.length) return null // trailing garbage
    recon
  }

  /** Synthesize `nFrames` of GLOBAL planted motion: each frame is a
    * w×h window into one STATIC smooth scene (seed-keyed sums of
    * StrictMath sinusoids — smooth content is what transform coding is
    * built for; hash noise would defeat both the DCT and the SAD
    * search), sliding by (2, 1) per frame. Every frame is therefore an
    * exact (2, 1) translation of its predecessor — the motion search's
    * only correct interior answer is mv = (2, 1), with the few pixels
    * entering at the leading edges left to residual/intra coding
    * (unlike [[RleVideoKernels.synthMotionFrames]]'s static-background
    * shape, where delta coding wins but motion vectors stay zero). */
  private[graft] def synthGlobalMotion(seed: Long, w: Int, h: Int,
                                           nFrames: Int): Array[Array[Byte]] = {
    val a = (seed % 97).toDouble * 0.07
    def scene(x: Int, y: Int): Byte = {
      // three bands, the highest with a ~7px period so no 8×8 block is
      // ever flat (a flat window would make skip-everywhere legal and
      // the mv_engaged attestation vacuous); amplitudes sum to 120, so
      // 128 ± 120 never clips
      val v = 128.0 +
        55.0 * StrictMath.sin(0.31 * x + a) * StrictMath.cos(0.23 * y - a) +
        40.0 * StrictMath.sin(0.11 * (x + 2 * y) + 0.5 * a) +
        25.0 * StrictMath.sin(0.9 * x - 0.7 * y + a)
      math.max(0, math.min(255, math.round(v).toInt)).toByte
    }
    Array.tabulate(nFrames) { f =>
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = scene(x + 2 * f, y + f)
          x += 1
        }
        y += 1
      }
      px
    }
  }

  /** Encode planted-global-motion frames as a 'GMC1' AVI (frame 0
    * I-frame, the rest P-frames against the reconstruction chain),
    * decode the container back, chain-decode, and certify:
    * `struct<width, height, fps, n_frames, err_in_bound, recon_exact,
    * mv_engaged, inter_saves, trunc_rejected>` —
    *  - `err_in_bound`: every decoded pixel within
    *    [[JpegKernels.ErrBound]] of its SOURCE (the lossy path's bound;
    *    P-frame quantization error does not accumulate because
    *    prediction runs on reconstructions, the closed-loop property
    *    MPEG-1 shares),
    *  - `recon_exact`: decoder output BIT-EQUAL to the encoder's own
    *    reconstruction on every frame (the exact half),
    *  - `mv_engaged`: at least one P-block chose a nonzero motion
    *    vector (the planted translation makes anything else a defect),
    *  - `inter_saves`: the P-frames' coded bytes are strictly smaller
    *    than intra-coding the same frames,
    *  - `trunc_rejected`: a truncated container AND a truncated frame
    *    stream both decode to null.
    * Null if anything fails to decode. */
  def mcRoundTripStats(seed: Long, width: Int, height: Int,
                       nFrames: Int, fps: Int): InternalRow = {
    if (nFrames <= 1 || nFrames > 256 || width <= 0 || height <= 0 ||
        width.toLong * height * nFrames > (1 << 24)) return null
    val W = pad8(width); val H = pad8(height)
    val src = synthGlobalMotion(seed, width, height, nFrames)
    val padded = src.map(padCanvas(_, width, height))
    val enc = new Array[Array[Byte]](nFrames)
    val encRecons = new Array[Array[Byte]](nFrames)
    val mvUsed = new Array[Boolean](1)
    var interBytes = 0L
    var intraBytes = 0L
    var prevRecon: Array[Byte] = null
    var f = 0
    while (f < nFrames) {
      val (bits, recon, intraAlt) =
        mcEncodeFrame(padded(f), prevRecon, W, H, mvUsed)
      enc(f) = bits
      encRecons(f) = recon
      if (f > 0) {
        interBytes += bits.length
        intraBytes += intraAlt // the same pass already intra-coded every block
      }
      prevRecon = recon
      f += 1
    }
    val avi = AviKernels.aviEncodeGmc(width, height, fps, enc)
    if (avi == null) return null
    val vid = AviKernels.aviDecodeGmc(avi)
    if (vid == null || vid.width != width || vid.height != height ||
        vid.frames.length != nFrames) return null
    // decode chain, certified against the encoder-side recon chain
    var errInBound = true
    var reconExact = true
    var decPrev: Array[Byte] = null
    f = 0
    while (f < nFrames) {
      val dec = mcDecodeFrame(vid.frames(f), decPrev, W, H)
      if (dec == null) return null
      if (!java.util.Arrays.equals(dec, encRecons(f))) reconExact = false
      val cropped = cropCanvas(dec, width, height)
      var i = 0
      while (i < cropped.length) {
        if (math.abs((cropped(i) & 0xff) - (src(f)(i) & 0xff)) >
            JpegKernels.ErrBound) errInBound = false
        i += 1
      }
      decPrev = dec
      f += 1
    }
    val truncFrame = mcDecodeFrame(
      java.util.Arrays.copyOf(enc(0), enc(0).length - 1), null, W, H) == null
    val truncRejected =
      AviKernels.aviDecodeGmc(
        java.util.Arrays.copyOf(avi, avi.length / 2)) == null && truncFrame
    val r = new GenericInternalRow(9)
    r.setInt(0, vid.width); r.setInt(1, vid.height); r.setInt(2, vid.fps)
    r.setInt(3, vid.frames.length)
    r.setBoolean(4, errInBound)
    r.setBoolean(5, reconExact)
    r.setBoolean(6, mvUsed(0))
    r.setBoolean(7, interBytes < intraBytes)
    r.setBoolean(8, truncRejected)
    r
  }
}
