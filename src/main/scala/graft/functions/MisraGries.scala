package graft.functions

/** Misra-Gries bounded-counter frequency summary — at most k counters,
  * with the classic guarantees over a stream of n tokens:
  *
  *   - estimates never overcount: est(t) ≤ freq(t);
  *   - undercount is bounded: freq(t) − est(t) ≤ n/(k+1);
  *   - every token with freq(t) > n/(k+1) is retained.
  *
  * Summaries are MERGEABLE (Agarwal et al., "Mergeable Summaries",
  * PODS'12): point-wise sum, then subtract the (k+1)-th largest counter
  * and drop non-positives. The merged summary keeps ≤ k counters and the
  * combined error stays ≤ (nA+nB)/(k+1), so per-partition summaries can
  * be built independently (a map pass, no shuffle of raw tokens) and
  * reduced pairwise in any order/shape — the distributed heavy-hitters
  * plan at 100 TB: mapPartitions → MG(k) per partition → treeReduce
  * merge, shuffling at most k rows per partition.
  *
  * Used by `StreamOps.heavyHittersStream` (per-window streaming state)
  * and property-tested against exact counts in MisraGriesSpec.
  */
object MisraGries {

  /** One decrement-all step amortized: add token `t` to the summary. */
  def update(counts: Map[String, Long], k: Int, t: String): Map[String, Long] =
    if (counts.contains(t)) counts.updated(t, counts(t) + 1)
    else if (counts.size < k) counts.updated(t, 1L)
    else counts.view.mapValues(_ - 1).filter(_._2 > 0).toMap

  def updateAll(counts: Map[String, Long], k: Int,
      ts: IterableOnce[String]): Map[String, Long] =
    ts.iterator.foldLeft(counts)(update(_, k, _))

  /** Merge two summaries built with the same capacity k. */
  def merge(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest value; ≤ k strictly-larger survive
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }
}
