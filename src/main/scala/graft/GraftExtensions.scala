package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctions

/** Session-extension entry point: configure
  * `spark.sql.extensions=graft.GraftExtensions` (cluster-wide or per
  * session) and every new SparkSession exposes graft's native codegen'd
  * expressions (`dot_product`, `sorted_intersect_count`) as SQL
  * functions — the SparkSessionExtensions registration path for
  * deployments where queries arrive as SQL text rather than through the
  * Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    // whole-operator surface: the heap-based per-group top-k
    // (SURVEY §4 option (c) — LogicalPlan + Strategy + SparkPlan)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKPerGroupStrategy)
  }
}
