package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernels.FastTransientKernel
import graft.kernels.FastTransientKernel.FtRate

/** Fast-transient magnitude-rate module — reference:
  * ztf/fast_transient_rate/processor.py:377-449 (pandas UDF returning a
  * StructType; here a Scala UDF over the series columns returning a case
  * class, then flattened into the 8 typed columns).
  *
  * Needs `cfid, cmagpsf, csigmapsf, cdiffmaglim, cjd` series columns
  * (AlertCols.withHistory) plus the candidate scalars.
  */
object FastTransientRate {

  val outputColumns: Seq[String] = Seq(
    "jd_first_real_det", "jdstarthist_dt", "mag_rate", "sigma_rate",
    "lower_rate", "upper_rate", "delta_time", "from_upper")

  def apply(spark: SparkSession, df: DataFrame, n: Int = 10000,
      seed: Long = 0L): DataFrame = {
    val kernel = udf((fid: Int, cfid: Seq[Int],
        cmagpsf: Seq[java.lang.Double], csigmapsf: Seq[java.lang.Double],
        cdiffmaglim: Seq[java.lang.Double], cjd: Seq[java.lang.Double],
        jd: Double, jdstarthist: Double,
        magpsf: Double, sigmapsf: Double) => {
      def arr(xs: Seq[java.lang.Double]): Array[Double] =
        xs.map(x => if (x == null) Double.NaN else x.doubleValue()).toArray
      FastTransientKernel.rate(fid, cfid.toArray, arr(cmagpsf),
        arr(csigmapsf), arr(cdiffmaglim), arr(cjd),
        jd, jdstarthist, magpsf, sigmapsf, n, seed)
    })

    val withStruct = df.withColumn("ft_module", kernel(
      col("candidate.fid"), col("cfid").cast("array<int>"),
      col("cmagpsf").cast("array<double>"), col("csigmapsf").cast("array<double>"),
      col("cdiffmaglim").cast("array<double>"), col("cjd").cast("array<double>"),
      col("candidate.jd"), col("candidate.jdstarthist"),
      col("candidate.magpsf").cast("double"), col("candidate.sigmapsf").cast("double")))

    // flatten the struct into typed columns (processor.py:446-449)
    outputColumns.foldLeft(withStruct) { (d, c) =>
      d.withColumn(c, col(s"ft_module.$c"))
    }.drop("ft_module")
  }
}
