package graft.xmatch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial nearest-neighbor crossmatch on the celestial sphere —
  * reference: ztf/xmatch/utils.py:32-82 (astropy KD-tree inside a pandas
  * UDF) and ztf/xmatch/processor.py:439-598.
  *
  * Spark-first design (SURVEY.md §4 "custom Catalyst work"):
  *
  * 1. Both sides get a declination *zone id* (zone height = match
  *    radius), and the small catalog is replicated into its zone and both
  *    neighbors, so every within-radius pair shares a zone key.
  * 2. A broadcast-hash equi-join on the zone key + the exact angular
  *    separation predicate yields candidate pairs — the fact table never
  *    shuffles, and the per-row candidate set is only the local zone's.
  * 3. Closest-match dedup is `min(struct(sep, tiebreak, payload))` under
  *    a groupBy on the alert key — a partial-aggregatable (map-side
  *    combined) aggregation, deliberately NOT a window sort: at 100 TB a
  *    window over the fact table would shuffle + sort everything, while
  *    this plan's only wide exchange is the final hash aggregate.
  * 4. Left semantics: unmatched alerts keep a default payload
  *    (`Unknown` label convention, processor.py:593-595).
  *
  * The declination-band catalog pre-filter of the Rubin variants
  * (rubin/xmatch/processor.py:455-467) falls out of zoning for free.
  */
object CrossMatch {

  /** Exact angular separation (haversine; degrees in, arcsec out). */
  def angularSepArcsec(ra1: Column, dec1: Column, ra2: Column, dec2: Column): Column = {
    val sd = sin(radians(dec2 - dec1) / 2)
    val sr = sin(radians(ra2 - ra1) / 2)
    val h = sd * sd + cos(radians(dec1)) * cos(radians(dec2)) * sr * sr
    asin(sqrt(h)) * lit(2.0 * 180.0 / math.Pi * 3600.0)
  }

  private def zoneId(dec: Column, zoneHeightDeg: Double): Column =
    floor((dec + 90.0) / zoneHeightDeg).cast("long")

  /** Per-zone RA bucket geometry (r14 — SCALE_r14's x1 finding): a
    * dec-only zone key leaves every alert scanning ALL catalog rows in
    * its zone — ~constant per alert, so the crossmatch is linear, but
    * with a large constant (sf100 probe: 438 s, every alert paying
    * ~10^2 haversines). Bucketing RA as a SECOND join key cuts the
    * candidate set to the rows within one bucket width.
    *
    * Width derivation (exact, from the haversine): for a pair within
    * radius r, sin^2(sep/2) >= cos(d1) cos(d2) sin^2(dra/2), so the
    * true (cyclic) RA difference obeys
    * dra <= 2 asin(sin(r/2) / sqrt(cos d1 cos d2)). With `edge` the
    * pole-nearest |dec| reachable by a pair whose ALERT sits in the
    * zone (zone span plus one zone-height margin for the catalog
    * side), cos(edge) lower-bounds each cosine, giving the per-zone
    * width `w = 2 asin(min(1, sin(r/2)/cos(edge)))` — near the poles
    * the arg clamps and the zone degrades gracefully to 1-2 buckets
    * (dec-only behavior). Buckets are MODULAR and tile the circle in
    * EQUAL widths: `nb = max(1, floor(360/w))`, actual width
    * `W = 360/nb >= w`, probe b-1/b/b+1 mod nb — the equal tiling is
    * what makes cyclic adjacency == bucket adjacency (r14 review
    * catch: a ceil-derived count leaves a NARROWER overhang bucket at
    * the 0/360 seam that sits within w of bucket 0 without being its
    * modular neighbor, silently dropping true seam matches). Both
    * sides evaluate the SAME column expression of the zone id, so the
    * key doubles agree bit-for-bit. The 1.05 slack absorbs double
    * rounding; candidates stay O(1) per alert either way.
    */
  private def raBucketGeom(zone: Column, zoneHeightDeg: Double,
      radiusArcsec: Double): (Column, Column) = {
    val rHalfSin = math.sin(math.toRadians(radiusArcsec / 3600.0) / 2.0)
    val lo = zone * zoneHeightDeg - 90.0 - zoneHeightDeg
    val hi = (zone + 1) * zoneHeightDeg - 90.0 + zoneHeightDeg
    val edge = least(lit(90.0), greatest(abs(lo), abs(hi)))
    val arg = least(lit(1.0),
      lit(rHalfSin) / greatest(cos(radians(edge)), lit(1e-12)))
    val w = least(lit(360.0), degrees(asin(arg)) * 2.0 * 1.05)
    val nb = greatest(lit(1L), floor(lit(360.0) / w).cast("long"))
    (lit(360.0) / nb, nb)
  }

  /** Append the payload of the closest catalog row within `radiusArcsec`
    * of each alert (defaults where unmatched).
    *
    * @param alerts     large side; must contain `idCol`, `raCol`, `decCol`
    * @param catalog    small side with columns (ra, dec, payload...)
    * @param payload    catalog payload columns to append
    * @param defaults   per-payload-column default for unmatched alerts
    */
  def closestWithin(alerts: DataFrame, catalog: DataFrame,
      radiusArcsec: Double, idCol: String, raCol: String, decCol: String,
      catRa: String, catDec: String, payload: Seq[String],
      defaults: Map[String, Column]): DataFrame = {
    val zh = math.max(radiusArcsec / 3600.0, 1e-4)
    // catalog: dec-replicated into both neighbor zones (x3), then ONE
    // ra bucket per replica, computed with the replica ZONE's geometry
    // (the alert side probes the same zone's geometry — identical
    // expression, identical doubles)
    val catZoned0 = catalog.select(
      (explode(array(lit(-1L), lit(0L), lit(1L))).as("__dz")) +:
        col(catRa).as("__cra") +: col(catDec).as("__cdec") +:
        payload.map(c => col(c).as(s"__p_$c")): _*)
      .withColumn("__zone", zoneId(col("__cdec"), zh) + col("__dz"))
      .drop("__dz")
    val (cw, cnb) = raBucketGeom(col("__zone"), zh, radiusArcsec)
    val catZoned = catZoned0
      .withColumn("__rb", pmod(floor(col("__cra") / cw).cast("long"), cnb))

    // alerts: probe the (<=3 distinct) cyclic neighbor buckets — the
    // fact side carries the replication because tripling map-side probe
    // rows is cheaper at scale than tripling the broadcast build
    val left0 = alerts.withColumn("__zone", zoneId(col(decCol), zh))
    val (aw, anb) = raBucketGeom(col("__zone"), zh, radiusArcsec)
    val left = left0
      .withColumn("__rb0", floor(col(raCol) / aw).cast("long"))
      .withColumn("__rb", explode(array_distinct(array(
        pmod(col("__rb0") - 1, anb), pmod(col("__rb0"), anb),
        pmod(col("__rb0") + 1, anb)))))
      .drop("__rb0")
    val sep = angularSepArcsec(col(raCol), col(decCol), col("__cra"), col("__cdec"))

    val joined = left.join(broadcast(catZoned),
        left("__zone") === catZoned("__zone") &&
          left("__rb") === catZoned("__rb") && sep < radiusArcsec, "left")
      .withColumn("__sep", sep)

    // one row per alert: min_by with ordering (sep, catalog position) —
    // deterministic under ties, partial-aggregatable map-side, and the
    // payload stays OUT of the ordering so non-orderable payload types
    // (maps, like mangrove's) work. Unmatched rows have a null ordering
    // and are ignored by min_by; all-unmatched groups yield null.
    val alertStruct = struct(alerts.columns.map(c => left(c)): _*)
    val best = joined
      .groupBy(col(idCol))
      .agg(
        first(alertStruct).as("__alert"),
        min_by(
          struct(payload.map(c => col(s"__p_$c")): _*),
          when(col("__sep").isNotNull,
            struct(col("__sep"), col("__cra"), col("__cdec")))).as("__m"))

    val outCols = alerts.columns.map(c => col(s"__alert.$c").as(c)) ++
      payload.map(c => coalesce(col(s"__m.__p_$c"), defaults(c)).as(c))
    best.select(outCols: _*)
  }

  /** Label-style crossmatch: closest catalog `labelCol` within radius,
    * else "Unknown" — the crossmatch_other_catalog contract
    * (ztf/xmatch/processor.py:439-598). Labels are trimmed as the
    * reference does (`str(i).strip()`).
    */
  def label(alerts: DataFrame, catalog: DataFrame, radiusArcsec: Double,
      idCol: String, raCol: String, decCol: String,
      catRa: String, catDec: String, labelCol: String,
      outCol: String): DataFrame = {
    val cat = catalog.select(col(catRa), col(catDec),
      trim(col(labelCol).cast("string")).as("__label"))
    closestWithin(alerts, cat, radiusArcsec, idCol, raCol, decCol,
      catRa, catDec, Seq("__label"), Map("__label" -> lit("Unknown")))
      .withColumnRenamed("__label", outCol)
  }
}

/** Loaders for the reference's bundled static catalogs (FIXTURES.md §5).
  * Each returns (df, raCol, decCol, labelCol).
  */
object Catalogs {
  import org.apache.spark.sql.SparkSession

  def gcvs(spark: SparkSession, path: String): (DataFrame, String, String, String) =
    (spark.read.parquet(path), "ra", "dec", "VarType")

  def vsx(spark: SparkSession, path: String): (DataFrame, String, String, String) =
    (spark.read.parquet(path), "RAdeg", "DEdeg", "Type")

  /** TNS confirmed objects only (type non-null), as the reference filters
    * (ztf/xmatch/processor.py:360-361).
    */
  def tns(spark: SparkSession, path: String): (DataFrame, String, String, String) = {
    val df = spark.read.parquet(path).filter(col("type").isNotNull)
    (df, "ra", "declination", "type")
  }

  /** Mangrove galaxy catalog; payload is a string map like the reference's
    * dict payload (ztf/xmatch/processor.py:601-690).
    */
  def mangrove(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(
      col("ra"), col("dec"),
      map(
        lit("HyperLEDA_name"), col("HyperLEDA_name").cast("string"),
        lit("2MASS_name"), col("2MASS_name").cast("string"),
        lit("lum_dist"), col("lum_dist").cast("string"),
        lit("ang_dist"), col("ang_dist").cast("string")).as("payload"))

  /** 3HSP blazar catalog — CSV with quoted hourangle coordinates
    * (ztf/xmatch/utils.py:153-197). Parsed driver-side (a few thousand
    * rows, broadcast downstream).
    */
  def threeHsp(spark: SparkSession, path: String): (DataFrame, String, String, String) = {
    val lines = scala.io.Source.fromFile(path, "ISO-8859-1").getLines().toSeq
    def cells(l: String): Array[String] = l.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
    val header = cells(lines.head).map(_.trim)
    val iName = header.indexOf("3HSP Source name")
    val iRa = header.indexOf("R.A.")
    val iDec = header.indexOf("Dec")
    val rows = lines.tail.flatMap { l =>
      val c = cells(l)
      if (c.length <= math.max(iName, math.max(iRa, iDec))) None
      else for {
        ra <- hourAngleToDeg(c(iRa))
        dec <- dmsToDeg(c(iDec))
      } yield (ra, dec, c(iName))
    }
    import spark.implicits._
    (rows.toDF("ra", "dec", "name"), "ra", "dec", "name")
  }

  /** "HH MM SS.s" -> degrees. */
  def hourAngleToDeg(s: String): Option[Double] = {
    val p = s.trim.split("\\s+")
    if (p.length != 3) None
    else try Some((p(0).toDouble + p(1).toDouble / 60.0 + p(2).toDouble / 3600.0) * 15.0)
    catch { case _: Exception => None }
  }

  /** "+DD MM SS.s" -> degrees (sign-aware). */
  def dmsToDeg(s: String): Option[Double] = {
    val t = s.trim
    if (t.isEmpty) return None
    val sign = if (t.startsWith("-")) -1.0 else 1.0
    val p = t.stripPrefix("-").stripPrefix("+").split("\\s+")
    if (p.length != 3) None
    else try Some(sign * (p(0).toDouble + p(1).toDouble / 60.0 + p(2).toDouble / 3600.0))
    catch { case _: Exception => None }
  }

  /** 4LAC DR3 catalogs — FITS binary tables, high + low latitude halves
    * concatenated (ztf/xmatch/utils.py:118-150), read with the built-in
    * BINTABLE parser.
    */
  def fourLac(spark: SparkSession, pathHigh: String, pathLow: String): (DataFrame, String, String, String) = {
    import spark.implicits._
    def half(path: String): Seq[(Double, Double, String)] = {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      graft.kernels.FitsTable.read(bytes).toSeq.flatMap(_.rows.map { r =>
        (toD(r("RAJ2000")), toD(r("DEJ2000")), r("Source_Name").toString)
      })
    }
    val df = (half(pathHigh) ++ half(pathLow)).toDF("ra", "dec", "name")
    (df, "ra", "dec", "name")
  }

  private def toD(a: Any): Double = a match {
    case f: Float => f.toDouble
    case d: Double => d
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case _ => Double.NaN
  }
}
