package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-style properties for the real-codec tier over RANDOM
  * content ids — the fixed-id round-trip specs pin specific corpora;
  * these pin the codec paths across the whole id space (no Spark
  * session: the codecs are per-record JVM functions).
  */
class CodecPropertySpec extends AnyFunSuite {

  /** deterministic sampler (the PropertySpec pattern — no
    * scalatestplus bridge in the offline cache) */
  def forAll[A](gen: Gen[A], n: Int = 40)(check: A => Any): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check(_))
    }

  // bounded so the pcm2/videoPx Long products cannot overflow
  private val idGen: Gen[Long] = Gen.choose(0L, 1000000L)

  test("GIF sequence round-trip is frame- and pixel-exact for arbitrary ids") {
    forAll(idGen) { id =>
      val frames = MultiModal.decodeGifFrames(MultiModal.encodeGif(id)).get
      assert(frames.length == MultiModal.videoFrameCount(id))
      frames.zipWithIndex.foreach { case (img, f) =>
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
          assert((img.getRGB(x, y) & 0xff) == MultiModal.videoPx(id, f, x, y),
            s"id=$id frame=$f ($x,$y)")
      }
    }
  }

  test("WAV round-trip is sample-exact for arbitrary content keys") {
    forAll(idGen) { ck =>
      val s = MultiModal.decodeWavSamples(MultiModal.encodeContentWav(ck)).get
      assert(s.length == MultiModal.audioLen2(ck))
      s.indices.foreach(t => assert(s(t) == MultiModal.pcm2(ck, t),
        s"ck=$ck t=$t"))
    }
  }

  test("acoustic fingerprint: pure function of content, in range, length-sensitive") {
    val Mod = 1000000007L
    forAll(idGen, n = 30) { ck =>
      val pcm = MultiModal.decodeWavSamples(
        MultiModal.encodeContentWav(ck)).get
      val f1 = MultiModal.audioFingerprint(pcm)
      assert(f1 == MultiModal.audioFingerprint(pcm.clone()), "not pure")
      assert(f1 >= 0 && f1 < Mod, s"out of range: $f1")
      // truncating to fewer whole frames changes the seed (frame
      // count) — a prefix recording must not collide by construction
      if (pcm.length > 256) {
        val f2 = MultiModal.audioFingerprint(
          java.util.Arrays.copyOfRange(pcm, 0, pcm.length - 256))
        assert(f1 != f2, s"prefix collided for ck=$ck")
      }
    }
  }

  test("JPEG distortion envelope holds for arbitrary ids (smooth content)") {
    forAll(idGen, n = 25) { id =>
      val dec = MultiModal.decode(
        MultiModal.encodeJpeg(MultiModal.renderSmooth(id), 0.9f)).get
      val seed = MultiModal.seedOf(id)
      assert(dec.getWidth == MultiModal.widthOf(seed))
      assert(dec.getHeight == MultiModal.heightOf(seed))
      val (mae, psnr) = MultiModal.jpegDistortion(id, dec)
      assert(mae <= 8.0, s"id=$id MAE $mae")
      assert(psnr >= 25.0, s"id=$id PSNR $psnr")
    }
  }
}
