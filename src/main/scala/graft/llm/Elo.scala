package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Elo ratings from ranking ballots via Bradley–Terry maximum likelihood
  * (MM updates, Hunter 2004) — the reference's `elo`
  * (sutro/templates/evals.py:182) re-expressed for scale:
  *
  * The data-sized part (turning N ballots into pairwise win counts) runs
  * distributed: explode each ballot into its (winner, loser) pairs and
  * aggregate with map-side combine. Only the m×m solve (m = #labels, tiny)
  * runs on the driver.
  */
object Elo {

  /** ballots: DataFrame with an array<string> column of labels ordered best
    * → worst (strict order; ties not supported in the columnar path).
    * Returns (label, ability, beta, elo, wins, losses, matches).
    */
  def ratings(
      ballots: DataFrame,
      column: String,
      laplace: Double = 0.5,
      maxIter: Int = 1000,
      tol: Double = 1e-8,
      eloMean: Double = 1500.0): DataFrame = {
    val spark = ballots.sparkSession
    import spark.implicits._

    // Distributed: ballot → (winner, loser) pairs → counted.
    val pairs = ballots
      .select(col(column).as("ballot"))
      .where(col("ballot").isNotNull && size(col("ballot")) >= 2)
      .select(posexplode(col("ballot")).as(Seq("wi", "winner")), col("ballot"))
      .select(col("winner"), explode(slice(col("ballot"), col("wi") + 2, size(col("ballot")))).as("loser"))
      .where(col("winner") =!= col("loser"))
      .groupBy("winner", "loser")
      .agg(count(lit(1)).cast("double").as("n"))
      .collect() // m² rows, m = #labels — tiny by construction
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap

    val solved = solve(pairs, laplace, maxIter, tol, eloMean)
    solved.toSeq
      .sortBy(-_._2._3)
      .map { case (label, (ability, beta, elo, wins, losses, matches)) =>
        (label, ability, beta, elo, wins, losses, matches)
      }
      .toDF("label", "ability", "beta", "elo", "wins", "losses", "matches")
  }

  /** Bradley–Terry MM solve over directed win counts. Returns per label:
    * (ability, beta, elo, wins, losses, matches). */
  def solve(
      pairCounts: Map[(String, String), Double],
      laplace: Double = 0.5,
      maxIter: Int = 1000,
      tol: Double = 1e-8,
      eloMean: Double = 1500.0): Map[String, (Double, Double, Double, Double, Double, Double)] = {
    val models = pairCounts.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    val m = models.size
    if (m == 0) return Map.empty
    val idx = models.zipWithIndex.toMap

    val raw = Array.ofDim[Double](m, m)
    for (((win, lose), c) <- pairCounts; if win != lose)
      raw(idx(win))(idx(lose)) += c
    // laplace smoothing only enters the solve; reported wins/losses stay raw
    val w = Array.tabulate(m, m)((i, j) =>
      if (i == j) 0.0 else raw(i)(j) + (if (laplace > 0) laplace else 0.0))

    val nMat = Array.tabulate(m, m)((i, j) => if (i == j) 0.0 else w(i)(j) + w(j)(i))

    val s = Array.fill(m)(1.0)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val sOld = s.clone()
      val wi = Array.tabulate(m)(i => w(i).sum)
      val denom = Array.tabulate(m)(i => (0 until m).map(j => nMat(i)(j) / (s(i) + s(j) + 1e-12)).sum)
      for (i <- 0 until m if denom(i) > 0) s(i) = wi(i) / denom(i)
      val geo = math.pow(s.product, 1.0 / m)
      for (i <- 0 until m) s(i) /= geo
      converged = (0 until m).map(i => math.abs(math.log(s(i) + 1e-12) - math.log(sOld(i) + 1e-12))).max < tol
      it += 1
    }

    val beta = s.map(x => math.log(x + 1e-12))
    val eloRaw = beta.map(_ * 400.0 / math.log(10.0))
    val eloCentered = {
      val mean = eloRaw.sum / m
      eloRaw.map(_ - mean + eloMean)
    }
    models.zipWithIndex.map { case (label, i) =>
      val wins = raw(i).sum
      val losses = (0 until m).map(j => raw(j)(i)).sum
      val matches = wins + losses
      label -> (s(i), beta(i), eloCentered(i), wins, losses, matches)
    }.toMap
  }
}
