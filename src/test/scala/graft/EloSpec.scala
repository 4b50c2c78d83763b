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

  test("ratings: ballots explode to pairwise counts distributed; reported counts are smoothed") {
    // ballot [A,B,C] means A>B, A>C, B>C
    val ballots = Seq(Seq("A", "B", "C"), Seq("A", "C", "B"), Seq("B", "A", "C")).toDF("ballot")
    val out = Elo.ratings(ballots, "ballot").collect()
    val byLabel = out.map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5))).toMap
    // raw wins(A)=5 (b1: A>B,A>C; b2: A>C,A>B; b3: A>C); reference reports
    // from the laplace-smoothed matrix: +0.5*(m-1) = +1.0 at m=3
    assert(byLabel("A")._1 === 6.0)
    assert(byLabel("C")._1 === 2.0) // raw 1 (ballot2 C>B) + 1.0
    val elos = out.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(elos("A") > elos("B") && elos("B") > elos("C"))
  }

  test("ratings: tie groups count 0.5 wins both ways (reference evals.py:222-246)") {
    // [[B],[A,C],[D]] = B > A=C > D; A and C tie once
    val ballots = Seq(Seq(Seq("B"), Seq("A", "C"), Seq("D"))).toDF("ballot")
    val out = Elo.ratings(ballots, "ballot").collect()
    val rows = out.map(r => r.getString(0) ->
      (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // smoothed at m=4, laplace=0.5: wins(B) = 3 raw + 1.5 = 4.5;
    // wins(A) = 1 (over D) + 0.5 (tie) + 1.5 = 3.0, losses(A) = 1 + 0.5 + 1.5 = 3.0
    assert(rows("B")._2 === 4.5)
    assert(rows("A")._2 === 3.0 && rows("A")._3 === 3.0)
    assert(rows("A")._4 === 6.0) // matches = wins + losses
    // A and C are fully symmetric -> identical elo; order B > A=C > D
    assert(math.abs(rows("A")._1 - rows("C")._1) < 1e-9)
    assert(rows("B")._1 > rows("A")._1 && rows("A")._1 > rows("D")._1)
  }

  test("solve: ties only still produce equal ratings and smoothed counts") {
    val solved = Elo.solve(Map.empty[(String, String), Double], Map(("A", "B") -> 4.0),
      laplace = 0.5, maxIter = 1000, tol = 1e-8, eloMean = 1500.0)
    assert(math.abs(solved("A")._3 - solved("B")._3) < 1e-6)
    assert(solved("A")._4 === 2.5) // 0.5*4 ties + 0.5 laplace
  }
}
