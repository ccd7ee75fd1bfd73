package graft.models

/** SNANA-format sequence construction for SuperNNova inference —
  * reference: fink's format_data_as_snana + SuperNNova's on-the-fly
  * pivot (ztf/snn/processor.py:184-199). Per alert: valid (mag, sigma)
  * epochs become FLUXCAL rows (SNANA zeropoint 27.5), measurements
  * sharing an MJD night collapse into one timestep with per-filter
  * columns and a filter-combination one-hot, delta_time is the gap to
  * the previous timestep, and the five photometric features are
  * log-standardized with the model's stored data_norm.
  */
object SnnFeatures {

  /** fid -> SNANA filter letter (fink_utils format_data_as_snana). */
  val ZtfFilters: Map[Int, String] = Map(1 -> "g", 2 -> "r", 3 -> "i")

  final case class Timestep(mjd: Double, flux: Map[String, Double],
      err: Map[String, Double])

  /** Build night-grouped timesteps from one alert's series. Only
    * filters the model knows (its list_filters) are kept, like
    * SuperNNova's inference-side filter selection.
    */
  def timesteps(jd: Array[Double], fid: Array[Int], mag: Array[Double],
      sigma: Array[Double], filters: Seq[String],
      groupByNight: Boolean = true): Array[Timestep] = {
    val rows = jd.indices
      .filter(i => !mag(i).isNaN && !sigma(i).isNaN &&
        ZtfFilters.get(fid(i)).exists(filters.contains))
      .sortBy(jd)
      .map { i =>
        val fluxcal = math.pow(10.0, (27.5 - mag(i)) / 2.5)
        val fluxerr = sigma(i) * fluxcal * math.log(10.0) / 2.5
        (jd(i) - 2400000.5, ZtfFilters(fid(i)), fluxcal, fluxerr)
      }
    groupRows(rows, groupByNight)
  }

  /** The one-hot combo universe for a filter list: every non-empty
    * subset, NAMED by concatenating members in list_filters order (the
    * reference's combos read "gY", "ugriz" — SuperNNova builds names in
    * survey filter order, cli_args.json list_filters_combination), then
    * the COLUMNS sorted ASCII (pandas get_dummies order; uppercase Y
    * sorts before lowercase, so elasticc starts Y, g, gY, gi, ...).
    * For ZTF's (g, r) this is g, gr, r.
    */
  def comboUniverse(filters: Seq[String]): Seq[String] =
    (1 to filters.length).flatMap(k =>
      filters.combinations(k).map(_.mkString)).sorted

  /** Feature matrix [seqLen x (2*nF + 1 + nCombos)] in SuperNNova's
    * training_features order: FLUXCAL_f / FLUXCALERR_f in list_filters
    * order, delta_time (log-standardized), then the
    * [[comboUniverse]] one-hot. Missing filter slots carry 0.0 through
    * the log-norm, matching the pivot fillna(0). `filters` MUST be the
    * survey's list_filters order (u,g,r,i,z,Y for elasticc; g,r for
    * ZTF), not alphabetical.
    */
  def featureMatrix(model: SnnModel, steps: Array[Timestep],
      filters: Seq[String]): Array[Array[Double]] = {
    val combos = comboUniverse(filters)
    steps.indices.map { t =>
      val s = steps(t)
      val dt = if (t == 0) 0.0 else s.mjd - steps(t - 1).mjd
      val fluxF = filters.map(f =>
        model.logNorm(s"FLUXCAL_$f", s.flux.getOrElse(f, 0.0)))
      val errF = filters.map(f =>
        model.logNorm(s"FLUXCALERR_$f", s.err.getOrElse(f, 0.0)))
      val combo = filters.filter(s.flux.contains).mkString
      val oneHot = combos.map(c => if (c == combo) 1.0 else 0.0)
      (fluxF ++ errF ++ Seq(model.logNorm("delta_time", dt)) ++ oneHot).toArray
    }.toArray
  }

  /** Night-grouped timesteps from flux-space rows (the Rubin/elasticc
    * path: format_data_as_snana with transform_to_flux=False,
    * rubin/snn/processor.py:113-127).
    */
  def timestepsFlux(mjd: Array[Double], band: Array[String],
      fluxcal: Array[Double], fluxcalErr: Array[Double],
      filters: Seq[String], groupByNight: Boolean = true): Array[Timestep] = {
    val rows = mjd.indices
      .filter(i => !fluxcal(i).isNaN && !fluxcalErr(i).isNaN &&
        filters.contains(band(i)))
      .sortBy(mjd)
      .map(i => (mjd(i), band(i), fluxcal(i), fluxcalErr(i)))
    groupRows(rows, groupByNight)
  }

  private def groupRows(rows: Seq[(Double, String, Double, Double)],
      groupByNight: Boolean): Array[Timestep] = {
    if (rows.isEmpty) return Array.empty
    val groups: Seq[Seq[(Double, String, Double, Double)]] =
      if (groupByNight) rows.groupBy(r => math.floor(r._1)).toSeq
        .sortBy(_._1).map(_._2)
      else rows.map(Seq(_))
    groups.map { g =>
      val mjd = g.map(_._1).sum / g.length
      val flux = g.groupBy(_._2).map { case (f, rs) =>
        f -> rs.map(_._3).sum / rs.length }
      val err = g.groupBy(_._2).map { case (f, rs) =>
        f -> rs.map(_._4).sum / rs.length }
      Timestep(mjd, flux, err)
    }.toArray
  }

  /** P(class0) for one alert's series — the "prob_class0" the reference
    * takes as the Ia probability (processor.py:207).
    */
  def probClass0(model: SnnModel, jd: Array[Double], fid: Array[Int],
      mag: Array[Double], sigma: Array[Double],
      filters: Seq[String] = Seq("g", "r"),
      groupByNight: Boolean = true): Double = {
    val steps = timesteps(jd, fid, mag, sigma, filters, groupByNight)
    if (steps.isEmpty) 0.0
    else model.forward(featureMatrix(model, steps, filters))(0)
  }

  /** Flux-space P(class0) (Rubin/elasticc models). */
  def probClass0Flux(model: SnnModel, mjd: Array[Double], band: Array[String],
      fluxcal: Array[Double], fluxcalErr: Array[Double],
      filters: Seq[String]): Double = {
    val steps = timestepsFlux(mjd, band, fluxcal, fluxcalErr, filters)
    if (steps.isEmpty) 0.0
    else model.forward(featureMatrix(model, steps, filters))(0)
  }
}
