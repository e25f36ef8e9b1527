package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.functions.{AviWalk, ImagePackedDims, PngRgb, TarEntries, WavInfo}
import graft.sources.{MediaCorpus, TarShards}

/** Generative fuzz for the byte-walk expression family (VERDICT r12
  * #5): the hand-crafted hostile-bytes tests in AviSpec/PixelSpec/
  * WavSpec/TarSpec each pin ONE known attack; these properties pin
  * the whole contract — for ANY bytes (random, random with valid
  * magics spliced on, single-byte mutations of valid fixtures,
  * truncations of valid fixtures), every walker returns null or a
  * sane salvaged value, never throws, never loops. Every input is
  * cross-fed to EVERY walker (WAV bytes into the AVI walk, tar blocks
  * into the PNG decoder, …), because a mis-sniffed modality is
  * exactly how hostile bytes reach the wrong parser in a real corpus.
  *
  * The walkers are pure JVM functions (the expressions' shared
  * interpreted/codegen kernels), so the sample counts can be high
  * without Spark-job cost. A genuine infinite loop fails the suite
  * via its timeout; the per-call wall bound below catches the
  * quadratic-not-quite-hung shapes.
  */
object ByteWalkProps extends Properties("bytewalk") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(300)

  private val rnd = new scala.util.Random(0xb17e)

  // ---- fixtures (all valid; built by the corpus writers) ----------
  private lazy val fixtures: IndexedSeq[Array[Byte]] = {
    val (pw, ph) = MediaCorpus.pngDims(1)
    val (jw, jh) = MediaCorpus.jpegDims(2)
    IndexedSeq(
      MediaCorpus.pngBytes(pw, ph),
      MediaCorpus.pngPixelBytes(2),
      MediaCorpus.jpegBytes(jw, jh, MediaCorpus.jpegComLen(2)),
      MediaCorpus.wavBytes(1),
      MediaCorpus.aviBytes(1),
      MediaCorpus.aviDibBytes(1),
      TarShards.shardBytes(0))
  }

  private def walkAll(b: Array[Byte]): Prop = {
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r =
        try f
        catch {
          case e: Throwable =>
            throw new AssertionError(
              s"$name threw on ${b.length} bytes: $e", e)
        }
      val ms = (System.nanoTime() - t0) / 1e6
      if (ms > 5000)
        throw new AssertionError(s"$name took ${ms}ms on ${b.length} bytes")
      r
    }
    val packed = timed("ImagePackedDims")(ImagePackedDims.packed(b))
    val dimsOk = packed == -1L ||
      ((packed >>> 32) > 0 && (packed & 0xffffffffL) > 0)
    val rgb = timed("PngRgb")(PngRgb.decode(b))
    val rgbOk = rgb == null || rgb.length % 3 == 0
    val wav = timed("WavInfo")(WavInfo.parse(b))
    val wavOk = wav == null || {
      val a = wav.toLongArray()
      a.length == 7 && a(0) > 0 && a(1) > 0 && a(2) == 16 &&
        a(3) >= 0 && a(4) >= 0 && a(5) >= 0 && a(6) >= 0 && a(6) <= a(3) * a(1)
    }
    val avim = timed("AviMeta")(AviWalk.meta(b))
    val avimOk = avim == null || {
      val a = avim.toLongArray()
      a.length == 5 && a(0) > 0 && a(1) > 0 && a(2) >= 0 && a(3) > 0 && a(4) > 0
    }
    val avif = timed("AviFrames")(AviWalk.frames(b))
    val avifOk = avif == null || {
      val n = avif.numElements()
      (0 until n).forall { i =>
        val row = avif.getStruct(i, 3)
        val (idx, off, size) = (row.getLong(0), row.getLong(1), row.getLong(2))
        idx == i && off >= 0 && size >= 0 && off + size <= b.length
      }
    }
    val tar = timed("TarEntries")(TarEntries.entries(b))
    val tarOk = tar == null || {
      val n = tar.numElements()
      (0 until n).forall { i =>
        val row = tar.getStruct(i, 3)
        val (off, size) = (row.getLong(1), row.getLong(2))
        off >= 512 && off % 512 == 0 && size >= 0 && off + size <= b.length
      }
    }
    (Prop(dimsOk) :| s"dims $packed") && (Prop(rgbOk) :| "png plane % 3") &&
      (Prop(wavOk) :| "wav fields") && (Prop(avimOk) :| "avi meta fields") &&
      (Prop(avifOk) :| "avi frame extents") &&
      (Prop(tarOk) :| "tar member extents")
  }

  private val genRandom: Gen[Array[Byte]] =
    Gen.choose(0, 2048).map { n =>
      val a = new Array[Byte](n); rnd.nextBytes(a); a
    }

  // random tails behind genuine magic prefixes reach the deep walk
  // paths plain random bytes bounce off at the signature check
  private val genSpliced: Gen[Array[Byte]] =
    for {
      fi <- Gen.choose(0, fixtures.length - 1)
      keep <- Gen.choose(4, 64)
      tailLen <- Gen.choose(0, 1024)
    } yield {
      val f = fixtures(fi)
      val head = f.take(math.min(keep, f.length))
      val tail = new Array[Byte](tailLen); rnd.nextBytes(tail)
      head ++ tail
    }

  private val genMutated: Gen[Array[Byte]] =
    for {
      fi <- Gen.choose(0, fixtures.length - 1)
      nMut <- Gen.choose(1, 8)
      seed <- Gen.choose(Int.MinValue, Int.MaxValue)
    } yield {
      val r = new scala.util.Random(seed)
      val a = fixtures(fi).clone()
      (0 until nMut).foreach { _ =>
        if (a.nonEmpty) a(r.nextInt(a.length)) = r.nextInt(256).toByte
      }
      a
    }

  private val genTruncated: Gen[Array[Byte]] =
    for {
      fi <- Gen.choose(0, fixtures.length - 1)
      seed <- Gen.choose(Int.MinValue, Int.MaxValue)
    } yield {
      val f = fixtures(fi)
      f.take(new scala.util.Random(seed).nextInt(f.length + 1))
    }

  property("random bytes: null or sane, never throw") =
    Prop.forAll(genRandom)(walkAll)

  property("magic-spliced random tails: null or sane, never throw") =
    Prop.forAll(genSpliced)(walkAll)

  property("mutated valid fixtures: null or salvaged prefix, never throw") =
    Prop.forAll(genMutated)(walkAll)

  property("truncated valid fixtures: null or salvaged prefix, never throw") =
    Prop.forAll(genTruncated)(walkAll)

  private val genPlane: Gen[(Array[Byte], Int, Int)] =
    for {
      n <- Gen.choose(0, 4096)
      w <- Gen.choose(-4, 64)
      h <- Gen.choose(-4, 64)
    } yield { val a = new Array[Byte](n); rnd.nextBytes(a); (a, w, h) }

  property("plane ops (dims-taking): exact-size output or null, never throw") =
    Prop.forAll(genPlane) { case (b, w, h) =>
      import graft.functions.RgbOps
      val crop = RgbOps.centerCrop(b, w, h)
      val side = math.min(w, h)
      val cropOk = crop == null || crop.length == side * side * 3
      val rz = RgbOps.resize(b, w, h, 4, 4)
      val rzOk = rz == null || rz.length == 4 * 4 * 3
      val dib = RgbOps.dibToRgb(b, w, h)
      val dibOk = dib == null || dib.length == w * h * 3
      val st = RgbOps.stats(b)
      val stOk = st == null || st.numElements() == 8
      (Prop(cropOk) :| "crop size") && (Prop(rzOk) :| "resize size") &&
        (Prop(dibOk) :| "dib size") && (Prop(stOk) :| "stats arity")
    }

  property("unmutated fixtures parse in their own modality") = Prop {
    val (pw, ph) = MediaCorpus.pngDims(1)
    ImagePackedDims.packed(fixtures(0)) == ((pw.toLong << 32) | ph.toLong) &&
      PngRgb.decode(fixtures(1)) != null &&
      WavInfo.parse(fixtures(3)) != null &&
      AviWalk.meta(fixtures(4)) != null &&
      AviWalk.frames(fixtures(4)).numElements() > 0 &&
      AviWalk.meta(fixtures(5)) != null &&
      AviWalk.frames(fixtures(5)).numElements() > 0 &&
      TarEntries.entries(fixtures(6)).numElements() > 0
  }
}
