package graft

import graft.functions.Kernels
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class KernelsSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)
  private def shingleSet(s: String, n: Int): Set[String] =
    Kernels.shingles(u(s), n).toArray[UTF8String](
      org.apache.spark.sql.types.StringType).map(_.toString).toSet

  test("shingles: basic trigram set, lowercased, distinct") {
    assert(shingleSet("The quick brown fox The quick brown fox", 3) ===
      Set("the quick brown", "quick brown fox", "brown fox the", "fox the quick"))
  }

  test("shingles: shorter than n yields empty; whitespace collapsed") {
    assert(shingleSet("one two", 3) === Set.empty)
    assert(shingleSet("  a \t b\n c  ", 3) === Set("a b c"))
  }

  test("minhash signature: identical texts agree, sim fraction tracks jaccard") {
    val a = Kernels.minhashSig(u("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), 2, 128).toLongArray
    val b = Kernels.minhashSig(u("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), 2, 128).toLongArray
    assert(a.sameElements(b))
    // half-overlapping shingle sets -> estimated sim should be far from 0 and 1
    val c = Kernels.minhashSig(u("w1 w2 w3 w4 w5 x1 x2 x3 x4 x5"), 2, 128).toLongArray
    val est = a.zip(c).count { case (x, y) => x == y } / 128.0
    assert(est > 0.15 && est < 0.65, s"estimated sim $est implausible for ~0.3 jaccard")
  }

  test("simhash: identical -> identical; small perturbation -> small hamming") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val f1 = Kernels.simhash64(u(base))
    val f2 = Kernels.simhash64(u(base))
    assert(f1 === f2)
    val f3 = Kernels.simhash64(u(base + " lambda"))
    assert(java.lang.Long.bitCount(f1 ^ f3) <= 12)
    // unrelated text should be far
    val f4 = Kernels.simhash64(u("one two three four five six seven eight nine ten " * 5))
    assert(java.lang.Long.bitCount(f1 ^ f4) > 12)
  }

  test("hashEmbed: unit norm, deterministic, zero-safe") {
    val v = Kernels.hashEmbed(u("hello world hello"), 64).toFloatArray
    assert(v.length === 64)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(Kernels.hashEmbed(u(""), 64).toFloatArray.forall(_ === 0.0f))
  }

  test("cosine/dot on ArrayData") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array[Any](1.0f, 0.0f))
    val b = new GenericArrayData(Array[Any](0.0f, 2.0f))
    assert(Kernels.cosineF(a, a) === 1.0)
    assert(Kernels.cosineF(a, b) === 0.0)
    assert(Kernels.dotF(a, b) === 0.0)
  }

  test("ngramFps: positional fingerprints = fnv1a64 of ngramsAll, index-aligned") {
    val text = u("The quick  Brown fox\njumps over the quick brown fox")
    val fps = Kernels.ngramFps(text, 3).toLongArray()
    val ngs = Kernels.ngramsAll(text, 3).toArray[org.apache.spark.unsafe.types.UTF8String](
      org.apache.spark.sql.types.StringType)
    assert(fps.length === ngs.length)
    fps.indices.foreach(i => assert(fps(i) === Kernels.fnv1a64(ngs(i).toString)))
    assert(Kernels.ngramFps(u("one two"), 3).numElements() === 0)
  }

  test("bloom: no false negatives — every inserted text hits its own filter") {
    val rnd = new scala.util.Random(7)
    val vocab = Array.tabulate(400)(i => s"w$i")
    val texts = Array.fill(200)(
      u(Array.fill(12)(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val fps = texts.flatMap(t => Kernels.ngramFps(t, 3).toLongArray()).distinct
    val bits = Kernels.bloomBuild(fps, 12)
    val k = Kernels.bloomK(12)
    texts.foreach(t => assert(Kernels.anyShingleHit(t, 3, bits, k)))
  }

  test("anyShingleHit: text sharing a shingle with the filtered set always hits") {
    val evalText = u("alpha beta gamma delta epsilon zeta eta theta")
    val evalFps = Kernels.ngramFps(evalText, 3).toLongArray()
    val bits = Kernels.bloomBuild(evalFps, 12)
    val k = Kernels.bloomK(12)
    // shares the shingle "gamma delta epsilon"
    assert(Kernels.anyShingleHit(u("xx yy gamma delta epsilon zz"), 3, bits, k))
    // identical text trivially hits
    assert(Kernels.anyShingleHit(evalText, 3, bits, k))
    // too short for any shingle -> never hits
    assert(!Kernels.anyShingleHit(u("alpha beta"), 3, bits, k))
    // overwhelmingly-likely miss for disjoint vocabulary
    assert(!Kernels.anyShingleHit(u("q1 q2 q3 q4 q5 q6 q7 q8"), 3, bits, k))
  }

  test("termFreqs: dl and per-term token-equality counts in one pass") {
    val out = Kernels.termFreqs(u("Spark spark JOIN sparkle  join spark"), Array("spark", "join"))
      .toLongArray()
    assert(out.toSeq === Seq(6L, 3L, 2L))
    assert(Kernels.termFreqs(u(""), Array("x")).toLongArray().toSeq === Seq(0L, 0L))
  }
}
