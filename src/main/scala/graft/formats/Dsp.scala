package graft.formats

/** Audio feature DSP for the multimodal pipeline (m12): power spectrum →
  * mel filterbank → MFCC, from scratch against the public definitions
  * (Davis & Mermelstein 1980 for MFCC; the HTK mel scale
  * `mel(f) = 2595·log10(1 + f/700)`; DCT-II for the cepstrum) — the
  * frame-level features a speech/audio training pipeline extracts before
  * tokenizing audio into patch ids.
  *
  * Float features are NOT hash-comparable across engines, so the m12
  * GATE quantizes frames on the integer-energy path both engines replay
  * bit-for-bit (m03's arithmetic); this module is the real filterbank
  * leg, pinned in DspSpec against hand-computed fixtures (impulse/
  * constant/single-sine frames with closed-form spectra).
  */
object Dsp {

  /** In-place iterative radix-2 Cooley–Tukey FFT (re, im arrays). */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"FFT size must be a power of 2, got $n")
    // bit reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val er = re(base + k); val ei = im(base + k)
          val or_ = re(base + k + len / 2); val oi = im(base + k + len / 2)
          val pr = or_ * cr - oi * ci
          val pi = or_ * ci + oi * cr
          re(base + k) = er + pr; im(base + k) = ei + pi
          re(base + k + len / 2) = er - pr; im(base + k + len / 2) = ei - pi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** One-sided power spectrum of a real frame, zero-padded to the next
    * power of two: bins 0..N/2, `|X_k|²` (no window — framing is the
    * caller's concern; fixtures pin the unwindowed math).
    */
  def powerSpectrum(frame: Array[Double]): Array[Double] = {
    var n = 1
    while (n < frame.length) n <<= 1
    if (n < 2) n = 2
    val re = java.util.Arrays.copyOf(frame, n)
    val im = new Array[Double](n)
    fft(re, im)
    Array.tabulate(n / 2 + 1)(k => re(k) * re(k) + im(k) * im(k))
  }

  /** HTK mel scale and its inverse. */
  def mel(hz: Double): Double = 2595.0 * math.log10(1.0 + hz / 700.0)
  def melInv(m: Double): Double = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** Triangular mel filterbank energies over a one-sided power spectrum:
    * `nFilters` filters with centers equally spaced on the mel axis from
    * 0 Hz to Nyquist, each triangle spanning its neighbors' centers —
    * the standard construction every MFCC front end uses.
    */
  def melFilterbank(power: Array[Double], sampleRate: Int,
      nFilters: Int): Array[Double] = {
    val nBins = power.length // fftSize/2 + 1
    val fftSize = (nBins - 1) * 2
    val maxMel = mel(sampleRate / 2.0)
    // nFilters + 2 edge points on the mel axis → Hz → fractional bins
    val binOf = Array.tabulate(nFilters + 2) { i =>
      melInv(maxMel * i / (nFilters + 1)) * fftSize / sampleRate
    }
    Array.tabulate(nFilters) { f =>
      val (lo, c, hi) = (binOf(f), binOf(f + 1), binOf(f + 2))
      var e = 0.0
      var k = math.max(0, math.ceil(lo).toInt)
      val end = math.min(nBins - 1, math.floor(hi).toInt)
      while (k <= end) {
        val w =
          if (k < c) (k - lo) / (c - lo)
          else if (hi == c) 0.0
          else (hi - k) / (hi - c)
        if (w > 0) e += w * power(k)
        k += 1
      }
      e
    }
  }

  /** DCT-II (orthonormal) of a vector — the cepstral transform. */
  def dct2(x: Array[Double]): Array[Double] = {
    val n = x.length
    Array.tabulate(n) { k =>
      var s = 0.0
      var i = 0
      while (i < n) { s += x(i) * math.cos(math.Pi * k * (2 * i + 1) / (2.0 * n)); i += 1 }
      val scale = if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      s * scale
    }
  }

  /** MFCC of one frame: power spectrum → mel filterbank → log → DCT-II,
    * first `nCoeffs` coefficients. `floor` guards log(0) on silence.
    */
  def mfcc(frame: Array[Double], sampleRate: Int, nFilters: Int,
      nCoeffs: Int, floor: Double = 1e-10): Array[Double] = {
    val fb = melFilterbank(powerSpectrum(frame), sampleRate, nFilters)
    dct2(fb.map(e => math.log(math.max(e, floor)))).take(nCoeffs)
  }
}
