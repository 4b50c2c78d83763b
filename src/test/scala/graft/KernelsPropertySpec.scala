package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based checks for the kernels whose correctness the operators
  * lean on: the bounded top-k heap against a sort-based reference, and the
  * MinHash estimator against true Jaccard. Run by sbt's native ScalaCheck
  * framework support. */
object KernelsPropertySpec extends Properties("Kernels") {

  private val scoredIds: Gen[List[(Double, Long)]] = Gen.listOf(
    Gen.zip(Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(0L, 50L)))

  property("TopKBuffer equals sort-take-k for any insert order, with tie-breaks") =
    forAll(scoredIds, Gen.chooseNum(1, 8)) { (items, k) =>
      val buf = new graft.functions.TopKBuffer(k)
      items.foreach { case (s, i) => buf.insert(s, i) }
      val got = buf.sortedIndices.map(i => (buf.scores(i), buf.ids(i))).toSeq
      val want = items.sortBy { case (s, i) => (-s, i) }.take(k)
      got == want
    }

  property("TopKBuffer merge order does not change the result") =
    forAll(scoredIds, scoredIds, Gen.chooseNum(1, 6)) { (a, b, k) =>
      def build(xs: List[(Double, Long)]) = {
        val buf = new graft.functions.TopKBuffer(k)
        xs.foreach { case (s, i) => buf.insert(s, i) }
        buf
      }
      def drain(buf: graft.functions.TopKBuffer) =
        buf.sortedIndices.map(i => (buf.scores(i), buf.ids(i))).toSeq
      val ab = build(a); drain(build(b)).foreach { case (s, i) => ab.insert(s, i) }
      val ba = build(b); drain(build(a)).foreach { case (s, i) => ba.insert(s, i) }
      drain(ab) == drain(ba)
    }

  private val words = Gen.listOfN(30, Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"))

  property("minhash signature agreement tracks true shingle Jaccard within 0.35") =
    forAll(words, words) { (wa, wb) =>
      import org.apache.spark.unsafe.types.UTF8String
      val ta = UTF8String.fromString(wa.mkString(" "))
      val tb = UTF8String.fromString(wb.mkString(" "))
      def shingleSet(t: org.apache.spark.unsafe.types.UTF8String) =
        (0 until graft.functions.Kernels.shingles(t, 3).numElements())
          .map(graft.functions.Kernels.shingles(t, 3).getUTF8String(_).toString).toSet
      val sa = shingleSet(ta)
      val sb = shingleSet(tb)
      (sa.isEmpty || sb.isEmpty) || {
        val jaccard = (sa & sb).size.toDouble / (sa | sb).size
        val sigA = graft.functions.Kernels.minhashSig(ta, 3, 256)
        val sigB = graft.functions.Kernels.minhashSig(tb, 3, 256)
        val est = graft.functions.Kernels.sigAgreement(sigA, sigB)
        // 256 permutations: std err ~ sqrt(J(1-J)/256) <= 0.032; 0.35 is a
        // >10-sigma bound — a failure means a broken kernel, not noise
        Prop(math.abs(est - jaccard) <= 0.35).label(f"J=$jaccard%.2f est=$est%.2f")
      }
    }

  property("simhash is order-independent: any permutation of the tokens fingerprints identically") =
    forAll(words) { ws =>
      import org.apache.spark.unsafe.types.UTF8String
      val a = UTF8String.fromString(ws.mkString(" "))
      val shuffled = UTF8String.fromString(scala.util.Random.shuffle(ws).mkString(" "))
      // simhash is an order-independent bag-of-words fingerprint
      graft.functions.Kernels.simhash64(a) == graft.functions.Kernels.simhash64(shuffled)
    }

  property("jaccardSortedFps over shingleFpsSorted equals string-set Jaccard") =
    forAll(words, words) { (wa, wb) =>
      import org.apache.spark.unsafe.types.UTF8String
      val ta = UTF8String.fromString(wa.mkString(" "))
      val tb = UTF8String.fromString(wb.mkString(" "))
      def shingleSet(t: UTF8String) = {
        val sh = graft.functions.Kernels.shingles(t, 3)
        (0 until sh.numElements()).map(sh.getUTF8String(_).toString).toSet
      }
      val sa = shingleSet(ta)
      val sb = shingleSet(tb)
      val want =
        if (sa.isEmpty || sb.isEmpty) 0.0
        else (sa & sb).size.toDouble / (sa | sb).size
      val got = graft.functions.Kernels.jaccardSortedFps(
        graft.functions.Kernels.shingleFpsSorted(ta, 3),
        graft.functions.Kernels.shingleFpsSorted(tb, 3))
      Prop(got == want).label(f"got=$got%.4f want=$want%.4f")
    }

  private val spanText: Gen[(List[String], List[(Int, Int)])] = for {
    n <- Gen.chooseNum(0, 24)
    ws <- Gen.listOfN(n, Gen.oneOf("Aa", "Bb", "Cc", "Dd"))
    // random disjoint sorted spans over [0, n)
    cuts <- Gen.listOf(Gen.chooseNum(0, math.max(n, 1))).map(_.distinct.sorted)
  } yield {
    val spans = cuts.grouped(2).collect { case List(s, e) if s < e => (s, e) }.toList
    (ws, spans)
  }

  property("dropSpans equals the naive positional filter for any disjoint span set") =
    forAll(spanText) { case (ws, spans) =>
      import org.apache.spark.unsafe.types.UTF8String
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val text = UTF8String.fromString(ws.mkString(" "))
      val flat = new GenericArrayData(
        spans.flatMap { case (s, e) => Seq(s.toLong, e.toLong) }.toArray
          .map(_.asInstanceOf[Any]))
      val row = graft.functions.Kernels.dropSpans(text, flat)
      val keptWant = ws.zipWithIndex
        .filterNot { case (_, i) => spans.exists { case (s, e) => s <= i && i < e } }
        .map(_._1)
      (row.getLong(0) == ws.length.toLong) :| "n_words" &&
        (row.getLong(1) == keptWant.length.toLong) :| "n_kept" &&
        (row.getUTF8String(2).toString == keptWant.mkString(" ")) :| "cleaned"
    }

  property("bloom has no false negatives for any fingerprint set") =
    forAll(Gen.nonEmptyListOf(Gen.long), Gen.chooseNum(4, 16)) { (fps, bpi) =>
      val arr = fps.toArray
      val bits = graft.functions.Kernels.bloomBuild(arr, bpi)
      val k = graft.functions.Kernels.bloomK(bpi)
      val mBits = bits.length.toLong * 64L
      arr.forall(fp => graft.functions.Kernels.bloomContains(fp, bits, k, mBits))
    }

  // ---- byte-parser fuzz: arbitrary bytes must parse or return null/zero,
  // never throw (the parsers run inside codegen over untrusted payloads)

  private val anyBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127)))
      .map(_.map(_.toByte).toArray)

  property("audioStats never throws on arbitrary bytes") =
    forAll(anyBytes) { b =>
      graft.functions.Kernels.audioStats(b)
      true
    }

  // random bytes essentially never start with RIFF…WAVE, so the generic
  // fuzz never reaches the chunk walk — force the prefix and fuzz the
  // chunk ids/lengths (incl. hostile 32-bit lengths that read as negative
  // Ints: len = -8 must not stall the walk, huge lengths must not
  // overflow into a negative index)
  private val riffBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127))).map { body =>
      ("RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++ "WAVE".getBytes ++
        body.map(_.toByte).toArray)
    }

  property("audioStats terminates and never throws on hostile RIFF chunk lengths") =
    forAll(riffBytes) { b =>
      graft.functions.Kernels.audioStats(b)
      true
    }

  property("audioStats survives explicit stall/overflow chunk lengths") = {
    val prefix = "RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++ "WAVE".getBytes
    // len = -8 as signed: next cursor would equal the current one
    val stall = prefix ++ "data".getBytes ++
      Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++ Array.fill[Byte](16)(7)
    // len = 0x7FFFFFF0: start + len overflows a signed Int
    val huge = prefix ++ "data".getBytes ++
      Array[Byte](0xF0.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F.toByte) ++ Array.fill[Byte](16)(7)
    // junk id with a hostile length must not hide a later valid chunk walk
    val junk = prefix ++ "junk".getBytes ++
      Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    graft.functions.Kernels.audioStats(stall)
    graft.functions.Kernels.audioStats(huge)
    graft.functions.Kernels.audioStats(junk)
    true
  }

  property("videoFrameChecksums never throws on arbitrary bytes, any stride") =
    forAll(anyBytes, Gen.chooseNum(1, 5)) { (b, stride) =>
      graft.functions.Kernels.videoFrameChecksums(b, stride)
      true
    }

  property("mediaHeader never throws on arbitrary bytes") =
    forAll(anyBytes) { b =>
      graft.functions.Kernels.mediaHeader(b)
      true
    }

  property("rasterPool2x2 never throws on arbitrary bytes") =
    forAll(anyBytes) { b =>
      graft.functions.Kernels.rasterPool2x2(b)
      true
    }

  private val floatVec: Gen[Array[Float]] =
    Gen.chooseNum(1, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f))).map(_.toArray)

  property("sqEncode codes stay in [0,255] and preserve length; round-trip error bounded") =
    forAll(Gen.nonEmptyListOf(floatVec)) { vecs =>
      val dim = vecs.map(_.length).max
      val padded = vecs.map(v => v.padTo(dim, 0.0f))
      val mins = (0 until dim).map(d => padded.map(_(d)).min).toArray
      val spans = (0 until dim).map(d => padded.map(_(d)).max - mins(d)).toArray
      padded.forall { v =>
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          v.map(x => x: Any))
        val codes = graft.functions.Kernels.sqEncode(arr, mins, spans)
        codes.length == dim &&
          codes.forall(c => (c & 0xff) >= 0 && (c & 0xff) <= 255) &&
          // dequantized value within half a quantization step of the input
          codes.indices.forall { d =>
            val span = spans(d).toDouble
            span <= 0 || {
              val xhat = mins(d) + (codes(d) & 0xff).toDouble / 255.0 * span
              math.abs(xhat - v(d)) <= span / 255.0 * 0.5 + 1e-5
            }
          }
      }
    }

  property("audioStats round-trips its own container for any body") =
    forAll(anyBytes, Gen.chooseNum(0L, 1000L)) { (body, id) =>
      // force the WAV branch; stats must match a direct pass over body
      val wav = graft.functions.Kernels.mediaContainer(id * 4 + 2, body)
      val got = graft.functions.Kernels.audioStats(wav)
      var bsum = 0L; var sumsq = 0L; var peak = 0L
      body.foreach { x =>
        val u = x & 0xff
        bsum += u
        val s = u - 128L
        sumsq += s * s
        if (math.abs(s) > peak) peak = math.abs(s)
      }
      (got.getLong(0) == 8000 + (bsum % 5) * 8000) :| "sr" &&
        (got.getLong(1) == 1 + bsum % 2) :| "ch" &&
        (got.getLong(2) == body.length.toLong) :| "n" &&
        (got.getLong(3) == peak) :| "peak" &&
        (got.getLong(4) == sumsq) :| "sumsq"
    }
}
