package graft.formats

import org.scalatest.funsuite.AnyFunSuite

/** [[Dsp]] pinned against CLOSED-FORM fixtures — impulse/constant/sine
  * frames whose spectra are hand-derivable from the DFT definition, the
  * DCT-II of trivial vectors, the HTK mel-scale anchor points, and an
  * independent filterbank reimplementation (per-bin weight scan vs the
  * production per-filter loop).
  */
class DspSpec extends AnyFunSuite {

  private val eps = 1e-9

  private def approx(a: Double, b: Double, e: Double = eps): Boolean =
    math.abs(a - b) <= e

  test("fft: impulse has a flat spectrum (hand case)") {
    // x = [1,0,0,0] → X_k = 1 for all k → one-sided power = [1,1,1]
    val p = Dsp.powerSpectrum(Array(1.0, 0.0, 0.0, 0.0))
    assert(p.length == 3)
    assert(p.forall(approx(_, 1.0)))
  }

  test("fft: constant frame is DC-only (hand case)") {
    // x = [2,2,2,2] → X_0 = 8, X_k = 0 → power = [64, 0, 0]
    val p = Dsp.powerSpectrum(Array(2.0, 2.0, 2.0, 2.0))
    assert(approx(p(0), 64.0) && approx(p(1), 0.0) && approx(p(2), 0.0))
  }

  test("fft: single sine lands in its own bin (hand case)") {
    // x_t = sin(2πt/8), n = 8 → X_1 = -4i, X_7 = 4i → power bin 1 = 16
    val x = Array.tabulate(8)(t => math.sin(2 * math.Pi * t / 8))
    val p = Dsp.powerSpectrum(x)
    assert(approx(p(1), 16.0, 1e-8))
    Seq(0, 2, 3, 4).foreach(k => assert(approx(p(k), 0.0, 1e-8), s"bin $k"))
  }

  test("fft: zero-padding to the next power of two") {
    // 25-sample frame (the m12 window) pads to 32 → 17 one-sided bins;
    // Parseval on the padded frame: sum|x|² = (1/N)·sum|X|²
    val x = Array.tabulate(25)(t => math.sin(0.7 * t) + 0.3 * math.cos(1.1 * t))
    val p = Dsp.powerSpectrum(x)
    assert(p.length == 17)
    val full = p(0) + p(16) + 2 * p.slice(1, 16).sum // mirror the inner bins
    assert(approx(full / 32.0, x.map(v => v * v).sum, 1e-8))
  }

  test("dct2: orthonormal hand cases") {
    // DCT-II of [1,1,1,1]: c_0 = 4·√(1/4) = 2, rest 0
    val a = Dsp.dct2(Array(1.0, 1.0, 1.0, 1.0))
    assert(approx(a(0), 2.0) && a.drop(1).forall(approx(_, 0.0)))
    // DCT-II of [1,0]: c_0 = √(1/2), c_1 = cos(π/4)·√(2/2) = √2/2
    val b = Dsp.dct2(Array(1.0, 0.0))
    assert(approx(b(0), math.sqrt(0.5)) && approx(b(1), math.sqrt(2.0) / 2))
  }

  test("dct2 is orthonormal: energy is preserved") {
    val x = Array(0.3, -1.2, 2.5, 0.0, 1.1, -0.4, 0.9, 3.3)
    val y = Dsp.dct2(x)
    assert(approx(x.map(v => v * v).sum, y.map(v => v * v).sum, 1e-9))
  }

  test("mel scale: HTK anchor points and round trip") {
    // mel(700) = 2595·log10(2); mel(0) = 0
    assert(approx(Dsp.mel(0.0), 0.0))
    assert(approx(Dsp.mel(700.0), 2595.0 * math.log10(2.0)))
    Seq(100.0, 1000.0, 4000.0, 8000.0).foreach(f =>
      assert(approx(Dsp.melInv(Dsp.mel(f)), f, 1e-6), s"round trip $f"))
  }

  test("mel filterbank: adjacent triangles partition unity between centers") {
    // unnormalized shared-edge triangles: for any bin between centers
    // c_f and c_(f+1), w_f + w_(f+1) = 1 — so a FLAT spectrum's total
    // filterbank energy equals the number of interior bins (fractional
    // edge effects only at the first/last half-triangles)
    val nBins = 257 // fftSize 512
    val flat = Array.fill(nBins)(1.0)
    val fb = Dsp.melFilterbank(flat, 8000, 12)
    assert(fb.forall(_ >= 0.0))
    // independent reimplementation: scan BINS, accumulate into filters
    val sr = 8000; val nF = 12; val fftSize = (nBins - 1) * 2
    val maxMel = Dsp.mel(sr / 2.0)
    val edges = Array.tabulate(nF + 2)(i =>
      Dsp.melInv(maxMel * i / (nF + 1)) * fftSize / sr)
    val alt = new Array[Double](nF)
    for (k <- 0 until nBins; f <- 0 until nF) {
      val (lo, c, hi) = (edges(f), edges(f + 1), edges(f + 2))
      val w =
        if (k > lo && k < c) (k - lo) / (c - lo)
        else if (k == c) 1.0
        else if (k > c && k < hi) (hi - k) / (hi - c)
        else 0.0
      alt(f) += w * flat(k)
    }
    fb.zip(alt).zipWithIndex.foreach { case ((a, b), i) =>
      assert(approx(a, b, 1e-9), s"filter $i: $a vs $b") }
  }

  test("mfcc: constant (DC) frame concentrates in c0; silence hits the floor") {
    val dc = Dsp.mfcc(Array.fill(25)(100.0), 8000, 12, 4)
    val silence = Dsp.mfcc(Array.fill(25)(0.0), 8000, 12, 4)
    assert(dc.length == 4 && silence.length == 4)
    // DC energy lives in the lowest mel filter, so log-mel is far above
    // the silence floor ONLY there — c0 (the mean) must separate them
    assert(dc(0) > silence(0))
    // silence: every filter at the log floor → DCT concentrates in c0
    assert(silence.drop(1).forall(approx(_, 0.0, 1e-6)))
  }
}
