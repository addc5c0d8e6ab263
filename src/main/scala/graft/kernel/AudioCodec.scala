package graft.kernel

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Pure-JVM audio decode for the multimodal pipeline — no Spark
  * dependencies, no native libraries: `javax.sound.sampled` ships in
  * the JDK and reads WAV/AIFF/AU PCM, which covers the audio leg of
  * the multimodal surface with zero egress (the same move that made
  * the image leg real via `javax.imageio` in ImageCodec). Video has
  * no JDK codec and remains the one stubbed modality in Multimodal.
  */
object AudioCodec {

  /** Decoded audio features — deterministic functions of the PCM
    * samples, so an oracle that KNOWS the generative sample formula
    * can re-derive them without ever touching WAV bytes (how l22 pins
    * this end-to-end; PCM is lossless, so equality is exact).
    *
    * `sumSamples`/`peakAbs` accumulate over all channels in frame
    * order as exact integers; means are one double division away and
    * bit-reproducible.
    */
  final case class Decoded(
      channels: Int, sampleRate: Int, nFrames: Long, durationMs: Long,
      sumSamples: Long, peakAbs: Int)

  /** RIFF/WAVE ("RIFF....WAVE"), AIFF ("FORM....AIFF"), AU (".snd")
    * magic sniff — cheap pre-filter so non-audio payloads skip
    * AudioSystem's provider probing.
    */
  def looksLikeAudio(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 && {
      (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') ||
      (bytes(0) == 'F' && bytes(1) == 'O' && bytes(2) == 'R' && bytes(3) == 'M' &&
        bytes(8) == 'A' && bytes(9) == 'I' && bytes(10) == 'F') ||
      (bytes(0) == '.' && bytes(1) == 's' && bytes(2) == 'n' && bytes(3) == 'd')
    }

  /** Decode audio bytes to format + exact sample statistics. None when
    * the payload is not decodable 8/16-bit PCM (the caller falls back
    * to byte-level features). Reads through `AudioSystem` — the real
    * JDK codec, not a hand-rolled RIFF parser — so container quirks
    * (extra chunks, WAVE_FORMAT_EXTENSIBLE) are handled the way any
    * JVM consumer of the file would see them.
    */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (!looksLikeAudio(bytes)) return None
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val channels = fmt.getChannels
      val enc = fmt.getEncoding
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
      if (!(signed || unsigned) || (bits != 8 && bits != 16) || channels <= 0)
        return None
      val sampleRate = math.round(fmt.getSampleRate)
      if (sampleRate <= 0) return None
      val frameSize = fmt.getFrameSize
      if (frameSize != channels * (bits / 8)) return None

      val buf = new Array[Byte](8192 - 8192 % frameSize)
      var nFrames = 0L
      var sum = 0L
      var peak = 0
      val bigEndian = fmt.isBigEndian
      var read = ais.read(buf)
      while (read > 0) {
        var i = 0
        while (i + frameSize <= read) {
          var c = 0
          while (c < channels) {
            val off = i + c * (bits / 8)
            val s =
              if (bits == 8) {
                if (signed) buf(off).toInt else (buf(off) & 0xff) - 128
              } else {
                val lo = if (bigEndian) buf(off + 1) else buf(off)
                val hi = if (bigEndian) buf(off) else buf(off + 1)
                val v = ((hi & 0xff) << 8) | (lo & 0xff)
                val sv = v.toShort.toInt
                if (signed) sv else v - 32768
              }
            sum += s
            val a = math.abs(s)
            if (a > peak) peak = a
            c += 1
          }
          nFrames += 1
          i += frameSize
        }
        read = ais.read(buf)
      }
      val durationMs = nFrames * 1000L / sampleRate
      Some(Decoded(channels, sampleRate, nFrames, durationMs, sum, peak))
    } catch {
      case _: Exception => None
    } finally ais.close()
  }

  /** K-bucket energy-envelope signature — the audio counterpart of
    * ImageCodec.dHash56 for perceptual-ish dedup: per frame t, the
    * cross-channel |amplitude| sum; frames bucket by k = (t·K)/n
    * (integer division, the same arithmetic an oracle re-derives);
    * bit k of the signature is set iff the bucket's energy exceeds
    * its pro-rata share of the total — compared CROSS-MULTIPLIED
    * (bucketSum·nFrames > totalSum·bucketLen), so the rule is exact
    * integer arithmetic with no division. None when the payload is
    * not decodable PCM or has zero frames.
    *
    * Magnitudes: |amp| ≤ 32768·channels per frame; totalSum ≤ that
    * ·nFrames; the cross-product stays far under 2⁶³ for any audio
    * that fits in a row.
    */
  def envelopeSig(bytes: Array[Byte], buckets: Int): Option[java.lang.Long] = {
    require(buckets >= 1 && buckets <= 62)
    if (!looksLikeAudio(bytes)) return None
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val channels = fmt.getChannels
      val enc = fmt.getEncoding
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
      if (!(signed || unsigned) || (bits != 8 && bits != 16) || channels <= 0)
        return None
      val frameSize = fmt.getFrameSize
      if (frameSize != channels * (bits / 8)) return None
      val frameAbs = scala.collection.mutable.ArrayBuffer.empty[Long]
      val buf = new Array[Byte](8192 - 8192 % frameSize)
      val bigEndian = fmt.isBigEndian
      var read = ais.read(buf)
      while (read > 0) {
        var i = 0
        while (i + frameSize <= read) {
          var c = 0
          var fa = 0L
          while (c < channels) {
            val off = i + c * (bits / 8)
            val s =
              if (bits == 8) {
                if (signed) buf(off).toInt else (buf(off) & 0xff) - 128
              } else {
                val lo = if (bigEndian) buf(off + 1) else buf(off)
                val hi = if (bigEndian) buf(off) else buf(off + 1)
                val v = ((hi & 0xff) << 8) | (lo & 0xff)
                val sv = v.toShort.toInt
                if (signed) sv else v - 32768
              }
            fa += math.abs(s)
            c += 1
          }
          frameAbs += fa
          i += frameSize
        }
        read = ais.read(buf)
      }
      val n = frameAbs.length
      if (n == 0) return None
      val bucketSum = new Array[Long](buckets)
      val bucketLen = new Array[Long](buckets)
      var total = 0L
      var t = 0
      while (t < n) {
        val k = ((t.toLong * buckets) / n).toInt
        bucketSum(k) += frameAbs(t)
        bucketLen(k) += 1
        total += frameAbs(t)
        t += 1
      }
      var sig = 0L
      var k = 0
      while (k < buckets) {
        if (bucketSum(k) * n > total * bucketLen(k)) sig |= (1L << k)
        k += 1
      }
      Some(java.lang.Long.valueOf(sig))
    } catch {
      case _: Exception => None
    } finally ais.close()
  }

  /** Encode a 16-bit signed PCM sample function to WAV bytes
    * (lossless — decode returns exactly these samples). `sample(ch, t)`
    * is evaluated for t in [0, nFrames) per channel and interleaved in
    * frame order. Used by the l22 fixture generator and tests; real
    * pipelines bring their own audio bytes.
    */
  def encodeWav(channels: Int, sampleRate: Int, nFrames: Int,
                sample: (Int, Int) => Short): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nFrames >= 0)
    val pcm = new Array[Byte](nFrames * channels * 2)
    var t = 0
    var off = 0
    while (t < nFrames) {
      var c = 0
      while (c < channels) {
        val s = sample(c, t)
        pcm(off) = (s & 0xff).toByte        // little-endian
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
        off += 2
      }
      t += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decimation resample, re-encoded as WAV: keep frames 0, N, 2N, …
    * (ceil(n/N) survive) and divide the declared sample rate by N
    * (integer floor) — conventions an external oracle re-derives with
    * plain `//` arithmetic, so the l50 compare exercises the real
    * decode→sample→re-encode path. 16-bit signed PCM only (what
    * [[encodeWav]] emits); anything else → None.
    */
  def decimateWav(bytes: Array[Byte], everyN: Int): Option[Array[Byte]] = {
    require(everyN > 0, "everyN must be positive")
    if (!looksLikeAudio(bytes)) return None
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || fmt.getChannels <= 0) return None
      val channels = fmt.getChannels
      val frameSize = fmt.getFrameSize
      if (frameSize != channels * 2) return None
      val rate = math.round(fmt.getSampleRate)
      if (rate <= 0) return None
      val bigEndian = fmt.isBigEndian
      val raw = ais.readAllBytes()
      val nFrames = raw.length / frameSize
      def sampleAt(t: Int, c: Int): Short = {
        val off = t * frameSize + c * 2
        val lo = if (bigEndian) raw(off + 1) else raw(off)
        val hi = if (bigEndian) raw(off) else raw(off + 1)
        ((((hi & 0xff) << 8) | (lo & 0xff)).toShort)
      }
      val kept = (nFrames + everyN - 1) / everyN
      Some(encodeWav(channels, math.max(1, rate / everyN), kept,
        (c, t) => sampleAt(t * everyN, c)))
    } finally ais.close()
  }
}
