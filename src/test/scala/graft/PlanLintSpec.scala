package graft

/** Whole-registry plan lint: every driver query's PHYSICAL plan is
  * checked for the two join shapes that kill 100 TB jobs when they
  * appear by accident:
  *
  *   - `CartesianProductExec` — both sides large, no broadcast: never
  *     acceptable; nothing in the registry may plan one.
  *   - `BroadcastNestedLoopJoin` — legitimate ONLY when the broadcast
  *     side is provably tiny (a collected aggregate, a literal range, a
  *     bounded seed/query set). Every query that plans one must appear
  *     in the allowlist below WITH its justification, so a new query
  *     that accidentally turns a key join into a nested loop (e.g. by
  *     losing an equi-condition) fails this spec instead of shipping.
  *
  * Plans are built at sf0.001 — planning exercises the same Catalyst
  * rules as any scale; eager driver steps inside query construction
  * (codebook training collects, CC fixpoints) run on the tiny tables.
  */
class PlanLintSpec extends SparkSpec {

  private val bnljAllowed: Map[String, String] = Map(
    "q10_outliers_zscore" -> "broadcast per-group mean/stddev aggregate (rows = #groups)",
    "q12_trailing_count" -> "broadcast 1-row max-timestamp aggregate",
    "q15_watermark_filter" -> "broadcast per-key max-watermark aggregate, non-equi ts bound",
    "q24_knn_exact" -> "broadcast bounded query set, =!= self-match exclusion",
    "q25_embedding_near_dup" -> "exact all-pairs baseline BY DESIGN; the scale path is q25b's banded LSH",
    "q41_merge_upsert" -> "broadcast updates batch (deltas << base)",
    "q58_tfidf" -> "broadcast 1-row corpus-size aggregate (crossJoin N)",
    "q62_lm_score" -> "broadcast 1-row vocabulary-size aggregate (crossJoin V)",
    "q81_snapshot_diff" -> "broadcast 1-row snapshot-cut scalar; the diff itself is a null-safe equi join")

  test("no query plans a cartesian product; nested-loop joins are " +
      "allowlisted with a tiny broadcast side") {
    val sfDir = "/root/testdata/sf0.001"
    val findings = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        finally CacheScope.releaseAll()
      (name, plan.contains("CartesianProduct"),
        plan.contains("BroadcastNestedLoopJoin"))
    }
    val cartesians = findings.collect { case (n, true, _) => n }
    val bnlj = findings.collect { case (n, _, true) => n }
    info(s"BNLJ queries: ${bnlj.mkString(", ")}")
    assert(cartesians.isEmpty,
      s"CartesianProduct planned by: ${cartesians.mkString(", ")}")
    val unexplained = bnlj.filterNot(bnljAllowed.contains)
    assert(unexplained.isEmpty,
      s"BroadcastNestedLoopJoin without allowlist justification: ${unexplained.mkString(", ")}")
  }
}
