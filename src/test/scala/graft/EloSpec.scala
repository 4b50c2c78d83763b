package graft

import graft.llm.Elo

/** Bradley–Terry / Elo math checks (reference: sutro/templates/evals.py:182,
  * Hunter 2004 MM algorithm). */
class EloSpec extends SparkSpec {
  import spark.implicits._

  test("solve: dominant player gets top rating; ratings centered at mean") {
    val pairs = Map(
      ("A", "B") -> 9.0, ("B", "A") -> 1.0,
      ("B", "C") -> 9.0, ("C", "B") -> 1.0,
      ("A", "C") -> 9.0, ("C", "A") -> 1.0)
    val solved = Elo.solve(pairs, laplace = 0.0)
    assert(solved.keySet === Set("A", "B", "C"))
    val elo = solved.view.mapValues(_._3).toMap
    assert(elo("A") > elo("B") && elo("B") > elo("C"))
    assert(math.abs(elo.values.sum / 3 - 1500.0) < 1e-6)
  }

  test("solve: symmetric wins -> equal ratings") {
    val pairs = Map(("A", "B") -> 5.0, ("B", "A") -> 5.0)
    val solved = Elo.solve(pairs)
    assert(math.abs(solved("A")._3 - solved("B")._3) < 1e-6)
  }

  test("ratings: ballots explode to pairwise counts distributed") {
    // ballot [A,B,C] means A>B, A>C, B>C
    val ballots = Seq(Seq("A", "B", "C"), Seq("A", "C", "B"), Seq("B", "A", "C")).toDF("ballot")
    val out = Elo.ratings(ballots, "ballot").collect()
    val byLabel = out.map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5))).toMap
    // A wins: 2 over B + 2 over C + ... ballot1 A>B,A>C; ballot2 A>C,A>B; ballot3 A>C => wins(A)=5
    assert(byLabel("A")._1 === 5.0)
    assert(byLabel("C")._1 === 1.0) // ballot2 C>B only
    val elos = out.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(elos("A") > elos("B") && elos("B") > elos("C"))
  }
}
