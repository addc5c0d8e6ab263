package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** AudioCodec: real javax.sound.sampled decode, validated by
  * encode→decode round-trips over generated PCM (WAV is lossless for
  * 16-bit PCM, so sample statistics must agree exactly) plus rejection
  * of non-audio payloads.
  */
class AudioCodecSpec extends AnyFunSuite {

  private def expected(channels: Int, nFrames: Int,
                       sample: (Int, Int) => Short): (Long, Int) = {
    var sum = 0L; var peak = 0
    for (t <- 0 until nFrames; c <- 0 until channels) {
      val s = sample(c, t).toInt
      sum += s
      peak = math.max(peak, math.abs(s))
    }
    (sum, peak)
  }

  test("mono encode→decode round-trip is exact") {
    def s(c: Int, t: Int): Short = ((t * 1299721 % 65536) - 32768).toShort
    val bytes = AudioCodec.encodeWav(1, 8000, 50, s)
    assert(AudioCodec.looksLikeAudio(bytes))
    val d = AudioCodec.decode(bytes).get
    assert(d.channels == 1 && d.sampleRate == 8000 && d.nFrames == 50L)
    assert(d.durationMs == 50L * 1000 / 8000)
    val (sum, peak) = expected(1, 50, s)
    assert(d.sumSamples == sum && d.peakAbs == peak)
  }

  test("stereo interleave decodes per-channel samples in frame order") {
    def s(c: Int, t: Int): Short =
      (((c * 104729 + t * 7919) % 65536) - 32768).toShort
    val bytes = AudioCodec.encodeWav(2, 44100, 333, s)
    val d = AudioCodec.decode(bytes).get
    assert(d.channels == 2 && d.sampleRate == 44100 && d.nFrames == 333L)
    val (sum, peak) = expected(2, 333, s)
    assert(d.sumSamples == sum && d.peakAbs == peak)
  }

  test("extreme sample values (-32768, 32767) survive the round-trip") {
    def s(c: Int, t: Int): Short = if (t % 2 == 0) Short.MinValue else Short.MaxValue
    val d = AudioCodec.decode(AudioCodec.encodeWav(1, 16000, 4, s)).get
    assert(d.peakAbs == 32768) // |-32768|
    assert(d.sumSamples == 2L * Short.MinValue + 2L * Short.MaxValue)
  }

  test("zero-frame clip decodes to empty statistics") {
    val d = AudioCodec.decode(AudioCodec.encodeWav(1, 8000, 0, (_, _) => 0)).get
    assert(d.nFrames == 0L && d.sumSamples == 0L && d.peakAbs == 0 && d.durationMs == 0L)
  }

  test("non-audio payloads are rejected cheaply, not decoded") {
    assert(AudioCodec.decode(null).isEmpty)
    assert(AudioCodec.decode(Array.empty[Byte]).isEmpty)
    assert(AudioCodec.decode("not audio at all, truly".getBytes).isEmpty)
    // PNG magic must not be sniffed as audio
    assert(!AudioCodec.looksLikeAudio(ImageCodec.encodePng(2, 2, (_, _) => 0)))
  }

  test("truncated WAV (header only, frames cut) does not throw") {
    val full = AudioCodec.encodeWav(2, 8000, 100, (_, _) => 1234)
    val cut = java.util.Arrays.copyOf(full, 61) // mid-frame truncation
    val d = AudioCodec.decode(cut)
    // either rejected or partial frames — must not throw, never a lie about frames
    d.foreach(x => assert(x.nFrames <= 100L))
  }

  test("decimateWav keeps frames 0, N, 2N... and halves the declared rate") {
    def s(c: Int, t: Int): Short = ((c * 1000 + t * 7) % 30000).toShort
    val wav = AudioCodec.encodeWav(2, 16000, 9, s)
    val out = AudioCodec.decimateWav(wav, 2).get
    val dec = AudioCodec.decode(out).get
    assert(dec.channels == 2 && dec.sampleRate == 8000)
    assert(dec.nFrames == 5L) // ceil(9/2): t = 0,2,4,6,8
    val expSum = (for (t <- Seq(0, 2, 4, 6, 8); c <- 0 to 1) yield s(c, t).toLong).sum
    assert(dec.sumSamples == expSum)
    // everyN=1 is an exact round-trip
    val same = AudioCodec.decode(AudioCodec.decimateWav(wav, 1).get).get
    assert(same.nFrames == 9L && same.sumSamples ==
      AudioCodec.decode(wav).get.sumSamples)
    assert(AudioCodec.decimateWav("nope".getBytes, 2).isEmpty)
  }
}
