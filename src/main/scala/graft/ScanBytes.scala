package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** ACTUAL bytes behind a frame's scans, for size-floor decisions
  * (spread/repartition gates, the pair-family refusal pre-flight).
  *
  * VERDICT r13 #2: the floors used to be denominated in
  * `optimizedPlan.stats.sizeInBytes`, whose default 20-byte string
  * width undercounts real text ~2.5x — so each site carried its own
  * hand-calibrated constant, and the round demonstrated both failure
  * modes (a guard floor that silently never fired -> 67 GB of spill;
  * a spread floor that gated the exchange off at sf1 until halved
  * per-site). File-backed leaves report their FileIndex size instead:
  * the real post-partition-pruning file bytes Spark will actually
  * read, robust to schema/row-width drift, so one derivation per
  * decision (not one tuned constant per site) suffices.
  *
  * Non-file leaves (LocalRelation in tests, InMemoryRelation after a
  * cache, streaming sources) keep their optimizer estimate — cached
  * relations report materialized (accurate) sizes, and test-scale
  * local frames sit far below every floor either way. Column pruning
  * is deliberately ignored: the floors ask "is this CORPUS big enough
  * that distributing/guarding pays", a property of the data on disk,
  * not of the projection.
  *
  * FILTER-blind too, by the same design (ADVICE r14): a selective
  * filter over a large table still reports the full leaf bytes, so a
  * small filtered slice of a big corpus can trip a guard floor and pay
  * its pre-flight job. That errs only in the conservative direction —
  * a floor can fire early, never silently not at all — which is the
  * failure mode the r13 incident picked this denomination to kill. If
  * filtered-slice calls ever become a common pattern, the fallback is
  * the optimizer estimate when the plan carries selective filters.
  */
object ScanBytes {
  def of(df: DataFrame): Long = {
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val total = leaves.map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => BigInt(fs.location.sizeInBytes)
        case other => BigInt(other.sizeInBytes)
      }
      case leaf => leaf.stats.sizeInBytes
    }.sum
    if (total > BigInt(Long.MaxValue)) Long.MaxValue else total.toLong
  }
}
