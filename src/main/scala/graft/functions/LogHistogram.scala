package graft.functions

/** Quarter-octave log₂ histogram — the mergeable quantile summary behind
  * the batch rollup q96, factored for reuse by the streaming per-window
  * quantiles. Bins are (floor(log₂ x), 2 sub-bin bits): width 2^¼, so a
  * bin's lower bound under-estimates any member by < 19%. Bin ids are
  * pure integer arithmetic (no float log2 boundary risk) and histograms
  * merge by point-wise count addition — the associativity that lets
  * per-partition/per-epoch summaries roll up without the raw values.
  */
object LogHistogram {

  /** Bin id for x > 0; values 1..3 get exact singleton bins. */
  def binId(x: Long): Long = {
    require(x > 0, s"log histogram needs positive values, got $x")
    val l = 63 - java.lang.Long.numberOfLeadingZeros(x)
    if (l < 2) x else l * 4L + ((x >> (l - 2)) & 3L)
  }

  /** Smallest value that lands in `bin` (the estimate q96 reports). */
  def lowerBound(bin: Long): Long =
    if (bin < 4) bin else (4L + bin % 4) << ((bin / 4).toInt - 2)

  def add(h: Map[Long, Long], x: Long): Map[Long, Long] = {
    val b = binId(x)
    h.updated(b, h.getOrElse(b, 0L) + 1L)
  }

  def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  /** q-th percentile estimate (bin lower bound): the first bin whose
    * cumulative count reaches ⌈n·q/100⌉ — same integer rule as q96.
    */
  def quantile(h: Map[Long, Long], q: Int): Long = {
    val n = h.values.sum
    var cum = 0L
    for ((bin, cnt) <- h.toSeq.sortBy(_._1)) {
      cum += cnt
      if (cum * 100 >= n * q) return lowerBound(bin)
    }
    0L
  }
}
