package graft

import graft.functions.Mpeg1Kernels
import org.scalatest.funsuite.AnyFunSuite

/** The conformant MPEG-1 macroblock layer: Table B.3's canonical
  * structure, the §2.4.4 reconstruction arithmetic on hand values, the
  * full elementary-stream round trip with every grammar path engaged,
  * and the defensive decode contract. */
class Mpeg1KernelsSpec extends AnyFunSuite {

  test("§2.4.4 dequantization on hand values: intra matrix scaling, " +
       "DC ×8, dead-zone non-intra, ODDIFICATION both signs") {
    val qf = new Array[Int](64)
    val out = new Array[Int](64)
    // intra: DC is QF×8 verbatim; AC index 1 has W=16 → at qs=1,
    // QF=5: (2·5·1·16)/16 = 10, even → oddified DOWN to 9; QF=−5 → −9
    qf(0) = 77; qf(1) = 5; qf(8) = -5; qf(63) = 1 // W(63)=83 → 10 → 9
    Mpeg1Kernels.dequantIntra(qf, 1, out)
    assert(out(0) == 77 * 8)
    assert(out(1) == 9, s"got ${out(1)}")
    assert(out(8) == -9, s"got ${out(8)}")
    assert(out(63) == (2 * 83 / 16) - (if ((2 * 83 / 16) % 2 == 0) 1 else 0))
    // non-intra (flat 16): QF=3 → (2·3+1)·1 = 7 (odd, kept);
    // QF=−3 → −7; QF=0 stays 0
    java.util.Arrays.fill(qf, 0)
    qf(5) = 3; qf(9) = -3
    Mpeg1Kernels.dequantInter(qf, 1, out)
    assert(out(5) == 7 && out(9) == -7 && out(0) == 0)
    // qs = 2: (2·1+1)·2 = 6, even → oddified down to 5
    java.util.Arrays.fill(qf, 0)
    qf(2) = 1; qf(3) = -1
    Mpeg1Kernels.dequantInter(qf, 2, out)
    assert(out(2) == 5 && out(3) == -5)
  }

  test("Table B.3 canonical structure: the spec's own orderings hold " +
       "(single-luma 4-bit ladder, cbp 60 = '111', the n/n+60 " +
       "adjacency, the one-luma+one-chroma 7-bit ladders)") {
    // reflection-free: re-state the load-bearing entries; the class
    // initializer already machine-checked prefix-freeness and the
    // Kraft sum (two free 9-bit slots — the '0000 0000 x' space a
    // start-code-safe stream keeps clear)
    val f = Mpeg1Kernels.getClass.getDeclaredField("CbpEntries")
    f.setAccessible(true)
    val entries = f.get(Mpeg1Kernels).asInstanceOf[Seq[(Int, String)]].toMap
    assert(entries(60) == "111")
    // single-luma-block patterns ascend through the 4-bit codes
    assert(entries(32) == "1010" && entries(16) == "1011" &&
      entries(8) == "1100" && entries(4) == "1101")
    // cbp n and n+60 sit on adjacent 5-bit codes (chroma-only vs
    // all-luma+that-chroma — the published pairing)
    assert(entries(1) == "01011" && entries(61) == "01010")
    assert(entries(2) == "01001" && entries(62) == "01000")
    // one-luma+one-chroma ladders: +Cb under 00100xx, +Cr under 00101xx,
    // both descending by luma block index
    assert(entries(34) == "0010000" && entries(18) == "0010001" &&
      entries(10) == "0010010" && entries(6) == "0010011")
    assert(entries(33) == "0010100" && entries(17) == "0010101" &&
      entries(9) == "0010110" && entries(5) == "0010111")
    assert(entries.size == 63)
  }

  test("elementary stream round trip: recon exact on all three planes, " +
       "error in bound, motion + partial cbp + skip + MC-only engaged, " +
       "truncation rejected, census clean") {
    val row = Mpeg1Kernels.mpeg1RoundTripStats(7L, 34, 28, 4, 24)
    assert(row != null, "round trip must decode")
    assert(row.getInt(0) == 34 && row.getInt(1) == 28 && row.getInt(2) == 4)
    assert(row.getBoolean(3), "err_in_bound")
    assert(row.getBoolean(4), "recon_exact")
    assert(row.getBoolean(5), "mv_engaged — the planted (2,2) translation")
    assert(row.getBoolean(6), "trunc_rejected")
    assert(row.getBoolean(7), "census_ok")
    // grammar-path engagement on this fixture (content-dependent, so
    // pinned here rather than in the registered oracle)
    assert(row.getBoolean(9) || row.getBoolean(11),
      "interior macroblocks must skip or MC-only under exact motion")
  }

  test("grammar coverage sweep: across seeds and dims every macroblock " +
       "path fires somewhere — partial cbp, skip, P-intra, MC-only") {
    val rows = for (seed <- 1L to 6L; d <- Seq((34, 28, 4), (50, 34, 3)))
      yield Mpeg1Kernels.mpeg1RoundTripStats(seed, d._1, d._2, d._3, 24)
    assert(rows.forall(_ != null))
    assert(rows.forall(r => r.getBoolean(3) && r.getBoolean(4) &&
      r.getBoolean(6) && r.getBoolean(7)))
    def any(i: Int) = rows.exists(_.getBoolean(i))
    assert(any(5), "mv_engaged somewhere")
    assert(any(8), "cbp_partial somewhere — a pattern MB coding only " +
      "some of its six blocks")
    assert(any(9) || any(11), "skip or MC-only somewhere")
    assert(any(10), "P-intra somewhere — leading-edge content")
  }

  test("defensive decode: null input, garbage, a foreign start code, " +
       "and an all-zero stream all decode to null, never throw") {
    assert(Mpeg1Kernels.decodeEs(null) == null)
    assert(Mpeg1Kernels.decodeEs(Array.fill[Byte](64)(0x55)) == null)
    assert(Mpeg1Kernels.decodeEs(Array.fill[Byte](64)(0)) == null)
    val fake = Array[Byte](0, 0, 1, 0xB4.toByte) ++ Array.fill[Byte](32)(0)
    assert(Mpeg1Kernels.decodeEs(fake) == null)
  }

  test("every strict prefix of a stream decodes to null (no partial " +
       "pictures ever surface), and flipping any single byte never " +
       "throws") {
    val (ys, cbs, crs) = Mpeg1Kernels.synthYuv(11L, 20, 18, 3)
    val flags = new Array[Boolean](5)
    val (es, enc) = Mpeg1Kernels.encodeEs(20, 18, 24, ys, cbs, crs,
      flags)
    assert(enc.reconsY.length == 3 && es.length > 32)
    var i = 0
    while (i < es.length) {
      assert(Mpeg1Kernels.decodeEs(java.util.Arrays.copyOf(es, i)) == null,
        s"prefix of length $i decoded")
      i += 1
    }
    // byte-flip fuzz: a corrupted stream must decode to null or to a
    // well-formed video (don't-care header fields exist) — NEVER throw
    var flips = 0
    var nulls = 0
    i = 0
    while (i < es.length) {
      val mut = es.clone()
      mut(i) = (mut(i) ^ 0x41).toByte
      val r = Mpeg1Kernels.decodeEs(mut) // must not throw
      if (r == null) nulls += 1
      flips += 1
      i += 1
    }
    assert(nulls > flips / 2,
      s"only $nulls/$flips byte flips rejected — validation too lax")
  }

  test("degenerate inputs reject at the stats boundary") {
    assert(Mpeg1Kernels.mpeg1RoundTripStats(1L, 16, 16, 1, 24) == null)
    assert(Mpeg1Kernels.mpeg1RoundTripStats(1L, 0, 16, 3, 24) == null)
    assert(Mpeg1Kernels.mpeg1RoundTripStats(1L, 4096, 4096, 256, 24) == null)
  }
}
