package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

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
}
