package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native Catalyst expressions, so
  * `SELECT dot_product(a, b)` works from pure SQL (spark.sql, views,
  * thrift clients) exactly like the Column API. Lives in this package
  * to reach the private[sql] FunctionRegistry plumbing; the user entry
  * points are [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions` at session build) and
  * [[register]] for an already-running session.
  */
object GraftFunctions {

  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def binary(name: String, clazz: Class[_],
      build: (Expression, Expression) => Expression): Description =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name takes exactly 2 arguments")
        build(args(0), args(1))
      })

  val descriptions: Seq[Description] = Seq(
    binary("dot_product", classOf[DotProduct], DotProduct.apply),
    binary("sorted_intersect_count", classOf[SortedIntersectCount],
      SortedIntersectCount.apply),
    (FunctionIdentifier("native_ln"),
      new ExpressionInfo(classOf[NativeLn].getName, "native_ln"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "native_ln takes exactly 1 argument")
        NativeLn(args.head)
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize takes exactly 1 argument")
        NfcNormalize(args.head)
      }),
    (FunctionIdentifier("double_sortable_bits"),
      new ExpressionInfo(classOf[DoubleSortableBits].getName,
        "double_sortable_bits"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "double_sortable_bits takes exactly 1 argument")
        DoubleSortableBits(args.head)
      }),
    (FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_distinct takes exactly 2 arguments")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            "kmv_distinct's k must be an integer literal")
        }
        KmvDistinct(args(0), k)
      }),
    (FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CmsSketch].getName, "cms_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "cms_sketch takes exactly 3 arguments")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            s"cms_sketch's $what must be an integer literal")
        }
        CmsSketch(args(0), intLit(args(1), "depth"), intLit(args(2), "width"))
      }),
    (FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bloom_agg takes exactly 3 arguments")
        def longLit(e: Expression, what: String): Long = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case _ => throw new IllegalArgumentException(
            s"bloom_agg's $what must be an integer literal")
        }
        val nh = longLit(args(2), "numHashes")
        require(nh >= 1L && nh <= 64L,
          s"bloom_agg's numHashes must be in [1,64], got $nh")
        BloomAgg(args(0), longLit(args(1), "numBits"), nh.toInt)
      }),
    binary("bloom_might_contain", classOf[BloomMightContain],
      BloomMightContain.apply))

  /** Register into a live session (no extensions config needed). */
  def register(spark: SparkSession): Unit = descriptions.foreach {
    case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }

  /** Apply an extensions object's injected functions to a registry —
    * the hook the session builder runs at startup, exposed so tests can
    * prove the injectFunction path registers this exact set.
    */
  def applyTo(ext: SparkSessionExtensions, reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)

  /** A builtin-equivalent registry without graft's functions. */
  def freshRegistry: FunctionRegistry = FunctionRegistry.builtin.clone()

  /** An extensions object's injected planner strategies — private[sql]
    * plumbing surfaced so tests can prove the injectPlannerStrategy
    * path registers [[TopKPerGroupStrategy]]. */
  def plannerStrategies(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)
}
