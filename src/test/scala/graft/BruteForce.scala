package graft

/** Plain-Scala per-group oracle for the reduction registry — the analog of
  * the reference computing every grouped result with a NumPy loop
  * (reference tests/test_core.py:79-108). `None` means the engine is
  * expected to produce NULL (the engine's missing-value convention for
  * e.g. an all-NaN group under a nan* func).
  */
object BruteForce {

  private def valid(vs: Seq[Double]): Seq[Double] = vs.filterNot(_.isNaN)
  private def anyNaN(vs: Seq[Double]): Boolean = vs.exists(_.isNaN)

  /** vs/pos aligned, in position order. ddof applies to var/std; q to quantile. */
  def reduce(func: String, vs: Seq[Double], pos: Seq[Long],
      ddof: Int = 0, q: Double = 0.5): Option[Any] = {
    val v = valid(vs)
    def poison[A](x: => Option[A]): Option[Any] =
      if (anyNaN(vs)) Some(Double.NaN) else x
    def popVar(xs: Seq[Double], d: Int): Option[Double] =
      if (xs.size <= d) None
      else {
        val n = xs.size.toDouble
        // same 3-term decomposition the engine finalizes with
        Some((xs.map(x => x * x).sum - xs.sum * xs.sum / n) / (n - d))
      }
    def interp(xs: Seq[Double], qq: Double): Option[Double] =
      if (xs.isEmpty) None
      else {
        val s = xs.sorted
        val h = qq * (s.size - 1)
        val lo = math.floor(h).toInt
        val hi = math.ceil(h).toInt
        Some(s(lo) + (h - lo) * (s(hi) - s(lo)))
      }
    def mode(xs: Seq[Double]): Option[Double] =
      if (xs.isEmpty) None
      else {
        val counts = xs.groupBy(identity).view.mapValues(_.size)
        val mx = counts.values.max
        Some(counts.collect { case (x, c) if c == mx => x }.min)
      }
    def firstNaNPos: Option[Long] = vs.zip(pos).collectFirst { case (x, p) if x.isNaN => p }
    def argBy(sel: Seq[Double] => Double): Option[Long] = {
      val vp = vs.zip(pos).filterNot(_._1.isNaN)
      if (vp.isEmpty) None
      else {
        val target = sel(vp.map(_._1))
        Some(vp.collect { case (x, p) if x == target => p }.min) // first-wins
      }
    }

    func match {
      case "count"    => Some(v.size.toLong)
      case "sum"      => poison(Some(v.sum))
      case "nansum"   => Some(v.sum) // 0.0 for empty, like np.nansum
      case "prod"     => poison(Some(v.product))
      case "nanprod"  => Some(v.product)
      case "mean"     => poison(if (v.isEmpty) None else Some(v.sum / v.size))
      case "nanmean"  => if (v.isEmpty) None else Some(v.sum / v.size)
      case "var"      => poison(popVar(v, ddof))
      case "nanvar"   => popVar(v, ddof)
      case "std"      => poison(popVar(v, ddof).map(math.sqrt))
      case "nanstd"   => popVar(v, ddof).map(math.sqrt)
      case "min"      => poison(v.minOption)
      case "nanmin"   => v.minOption
      case "max"      => poison(v.maxOption)
      case "nanmax"   => v.maxOption
      case "first"    => vs.headOption
      case "last"     => vs.lastOption
      case "nanfirst" => v.headOption
      case "nanlast"  => v.lastOption
      // numpy: any NaN -> both argmin and argmax return the first NaN's pos
      case "argmin"    => firstNaNPos.orElse(argBy(_.min)).map(identity)
      case "argmax"    => firstNaNPos.orElse(argBy(_.max)).map(identity)
      case "nanargmin" => argBy(_.min)
      case "nanargmax" => argBy(_.max)
      case "median"      => poison(interp(v, 0.5))
      case "nanmedian"   => interp(v, 0.5)
      case "quantile"    => poison(interp(v, q))
      case "nanquantile" => interp(v, q)
      case "mode"    => poison(mode(v)) // scipy nan_policy='propagate'
      case "nanmode" => mode(v)
      case other     => throw new IllegalArgumentException(other)
    }
  }
}
