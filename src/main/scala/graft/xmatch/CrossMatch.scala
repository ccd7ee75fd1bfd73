package graft.xmatch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial nearest-neighbor crossmatch on the celestial sphere —
  * reference: ztf/xmatch/utils.py:32-82 (astropy KD-tree inside a pandas
  * UDF) and ztf/xmatch/processor.py:439-598.
  *
  * Spark-first design (SURVEY.md §4 "custom Catalyst work"; plan shape
  * r15, VERDICT r14 #1):
  *
  * 1. The small catalog is packed ONCE on the driver into a broadcast
  *    `(dec zone, RA bucket) -> candidate` CSR index
  *    ([[org.apache.spark.sql.graft.CatalogIndex]] — zone height = match
  *    radius, rows replicated into both neighbor zones, per-zone modular
  *    equal-width RA tiling derived from the exact haversine bound).
  * 2. Each alert row evaluates ONE deterministic scalar expression
  *    ([[org.apache.spark.sql.graft.ClosestCatalogProbe]]) that scans its
  *    <=3 cyclic neighbor buckets and picks the exact-haversine closest
  *    candidate under the (sep, cra, cdec) tie order — the Spark-native
  *    form of the reference's KD-tree-inside-a-partition. The alert side
  *    NEVER exchanges: no join, no aggregation, no window — the previous
  *    plan's closest-match `groupBy(id).agg(min_by)` shipped the full
  *    alert struct over the wire once per row, a full pass of the
  *    dataset at 100 TB.
  * 3. Left semantics: unmatched alerts keep a default payload
  *    (`Unknown` label convention, processor.py:593-595).
  *
  * The catalog is collected + broadcast at plan-construction time (one
  * small job) — the same driver-size contract as the broadcast join it
  * replaces, now failed fast by an explicit row cap instead of an
  * executor OOM. The declination-band catalog pre-filter of the Rubin
  * variants (rubin/xmatch/processor.py:455-467) falls out of zoning for
  * free.
  */
object CrossMatch {
  import org.apache.spark.sql.graft.{CatalogIndex, ClosestCatalogProbe}
  import org.apache.spark.sql.types.StructType

  /** Hard ceiling on broadcast catalog rows (fail fast on a misuse that
    * would have OOMed the old broadcast join just as surely).
    */
  val MaxCatalogRows: Int = 1 << 26

  /** Exact angular separation (haversine; degrees in, arcsec out). */
  def angularSepArcsec(ra1: Column, dec1: Column, ra2: Column, dec2: Column): Column = {
    val sd = sin(radians(dec2 - dec1) / 2)
    val sr = sin(radians(ra2 - ra1) / 2)
    val h = sd * sd + cos(radians(dec1)) * cos(radians(dec2)) * sr * sr
    asin(sqrt(h)) * lit(2.0 * 180.0 / math.Pi * 3600.0)
  }

  /** Append the payload of the closest catalog row within `radiusArcsec`
    * of each alert (defaults where unmatched). One output row per alert
    * ROW (per-row probe, left semantics).
    *
    * @param alerts     large side; must contain `raCol`, `decCol`
    * @param catalog    small (broadcast-size) side with (ra, dec, payload...)
    * @param idCol      retained for API parity — the per-row probe needs
    *                   no grouping key
    * @param payload    catalog payload columns to append
    * @param defaults   per-payload-column default for unmatched alerts
    */
  def closestWithin(alerts: DataFrame, catalog: DataFrame,
      radiusArcsec: Double, idCol: String, raCol: String, decCol: String,
      catRa: String, catDec: String, payload: Seq[String],
      defaults: Map[String, Column]): DataFrame = {
    val zh = math.max(radiusArcsec / 3600.0, 1e-4)
    // collect the catalog as catalyst rows: (cra double, cdec double,
    // payload struct) — payload values stay in catalyst form so the
    // probe can return them directly
    val catDf = catalog.select(
      col(catRa).cast("double").as("__cra"),
      col(catDec).cast("double").as("__cdec"),
      struct(payload.map(c => col(c).as(c)): _*).as("__p"))
    val payloadType = catDf.schema("__p").dataType.asInstanceOf[StructType]
    val nP = payloadType.fields.length
    // enforce the row cap BEFORE the collect (review r15: a cap checked
    // after collect() cannot fail fast — the driver would OOM first).
    // One extra count job over the broadcast-small side at plan
    // construction, aggregated on the executors.
    val nCat = catDf.count()
    require(nCat <= MaxCatalogRows,
      s"crossmatch catalog has $nCat rows — beyond the broadcast " +
        s"contract ($MaxCatalogRows); crossmatch the other way around or " +
        "pre-filter the catalog (decBandFilter)")
    val rows = catDf.queryExecution.toRdd.map(_.copy()).collect()
    val craB = Array.newBuilder[Double]
    val cdecB = Array.newBuilder[Double]
    val payB = Array.newBuilder[org.apache.spark.sql.catalyst.InternalRow]
    rows.foreach { r =>
      // null/NaN catalog coordinates can never match (the old zone join
      // dropped them via a null key) — skip them at build
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        val cr = r.getDouble(0)
        val cd = r.getDouble(1)
        if (!cr.isNaN && !cd.isNaN) {
          craB += cr; cdecB += cd; payB += r.getStruct(2, nP).copy()
        }
      }
    }
    val index = CatalogIndex.build(zh, radiusArcsec, craB.result(),
      cdecB.result(), payB.result())
    val bc = alerts.sparkSession.sparkContext.broadcast(index)
    val probe = ClosestCatalogProbe(
      col(raCol).cast("double"), col(decCol).cast("double"), bc, payloadType)
    // collision-safe scratch name (review r15: a fixed "__m" silently
    // replaced an alert column of the same name)
    val mCol = Iterator.from(0).map(i => s"__m$i")
      .find(n => !alerts.columns.contains(n)).get
    val outCols = alerts.columns.map(col) ++
      payload.map(c => coalesce(col(mCol)(c), defaults(c)).as(c))
    alerts.withColumn(mCol, probe).select(outCols: _*)
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
