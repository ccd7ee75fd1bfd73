package graft

/** VERDICT r4 #9: stand-in scorers must never feed an oracle-verified
  * result. Every oracle-checked `SparkEntry.queries` entry is built and
  * its analyzed plan scanned: no `_is_stub`/`_approx` surface column
  * and no stub-backed score column may appear anywhere in the plan. The
  * flags themselves stay pinned in the operator specs; this spec pins
  * the isolation invariant so a future query can't silently green-light
  * a stubbed score against a DuckDB oracle.
  */
class StubIsolationSpec extends SparkSpec {

  // score columns whose default scorer can be a documented stand-in
  private val stubBacked = Seq(
    "mulens", "pIa", "pKNe", "slsn_score", "superluminous_score",
    "rfscore_rainbow", "p_orphan")

  test("no oracle query references a stub-backed score or surface flag") {
    val oracle = SparkEntry.oracleSql.keySet
    val offenders = SparkEntry.queries.filter { case (name, _) => oracle(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.analyzed.toString
        val hits = (stubBacked.filter(c => plan.contains(s"$c#")) ++
          (if (plan.contains("_is_stub") || plan.contains("_approx")) Seq("flag") else Nil))
        if (hits.isEmpty) Nil else Seq(name -> hits)
      }
    assert(offenders.isEmpty, s"stub-backed columns in oracle queries: $offenders")
  }

  test("every stub-backed operator surfaces its engagement flag") {
    // each *_is_stub / *_approx flag must reflect the model bank state,
    // pinned here in one place (operator specs assert per-fixture)
    import graft.models.RefModels
    assert(RefModels.mulensForest.isDefined, "rf.sav should load offline")
    assert(RefModels.superluminousXgb.isDefined, "slsn xgb should load offline")
    assert(RefModels.cats.isDefined, "cats archive should load offline")
  }
}
