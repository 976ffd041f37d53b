package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Plan-SHAPE regression pinning (round-6 verdict item #6). PlanLintSpec
  * forbids catastrophic operators; this spec pins the per-query exchange
  * topology, so a silent extra shuffle — a lost `fanOut`, a broadcast
  * that fell back to shuffle after a threshold/estimate flip, a new
  * global sort — fails a test instead of surfacing as a bench smear two
  * rounds later.
  *
  * The committed baseline `plan_stats.json` records, per registry query,
  * (shuffle exchanges, broadcast exchanges, has-global-sort) of the
  * physical plan at sf0.001. The test FAILS when a query's shuffle count
  * rises above its pinned value, when a global sort appears where none
  * was pinned, or when a query has no baseline entry (new queries must be
  * pinned deliberately). Improvements (fewer exchanges) pass with a note
  * to re-baseline. To approve an intentional change, regenerate with:
  *
  *   SPARK_GRAFT_REGEN_PLAN_STATS=1 sbt "testOnly graft.PlanStatsSpec"
  *
  * — the regeneration path runs in the SAME session/config as the check,
  * so generator and checker cannot drift.
  */
class PlanStatsSpec extends SparkSpec {

  private val statsFile = java.nio.file.Paths.get("plan_stats.json")
  private val sfDir = "/root/testdata/sf0.001"

  private case class Stats(exchanges: Int, broadcasts: Int, globalSort: Boolean)

  /** Pre-execution physical nodes, descending through the AQE wrapper
    * (executedPlan on an un-executed AdaptiveSparkPlanExec is its initial
    * plan — the same view PlanLintSpec audits).
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case _ => p +: p.children.flatMap(flatten)
  }

  private def statsFor(df: DataFrame): Stats = {
    val nodes = flatten(df.queryExecution.executedPlan)
    Stats(
      nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      nodes.count(_.isInstanceOf[BroadcastExchangeExec]),
      nodes.exists { case s: SortExec => s.global; case _ => false })
  }

  private def computeAll(): Seq[(String, Stats)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val s = try statsFor(fn(spark, sfDir)) finally CacheScope.releaseAll()
      name -> s
    }

  private def render(all: Seq[(String, Stats)]): String =
    all.map { case (n, s) =>
      s"""  "$n": {"exchanges": ${s.exchanges}, "broadcasts": ${s.broadcasts}, "globalSort": ${s.globalSort}}"""
    }.mkString("{\n", ",\n", "\n}\n")

  private def parse(content: String): Map[String, Stats] = {
    val entry =
      ("\"(q[^\"]+)\":\\s*\\{\"exchanges\":\\s*(\\d+),\\s*\"broadcasts\":" +
        "\\s*(\\d+),\\s*\"globalSort\":\\s*(true|false)\\}").r
    entry.findAllMatchIn(content).map(m =>
      m.group(1) -> Stats(m.group(2).toInt, m.group(3).toInt,
        m.group(4).toBoolean)).toMap
  }

  test("per-query exchange topology matches the committed plan_stats.json " +
      "baseline (no unapproved shuffle/broadcast/global-sort growth)") {
    val current = computeAll()
    if (sys.env.contains("SPARK_GRAFT_REGEN_PLAN_STATS")) {
      java.nio.file.Files.writeString(statsFile, render(current))
      info(s"re-baselined ${current.size} queries into $statsFile")
    } else {
      assert(java.nio.file.Files.exists(statsFile),
        s"$statsFile missing — generate it with SPARK_GRAFT_REGEN_PLAN_STATS=1")
      val baseline = parse(java.nio.file.Files.readString(statsFile))
      val problems = Seq.newBuilder[String]
      val improvements = Seq.newBuilder[String]
      current.foreach { case (name, now) =>
        baseline.get(name) match {
          case None =>
            problems += s"$name: not pinned — regenerate plan_stats.json to approve the new query"
          case Some(pin) =>
            if (now.exchanges > pin.exchanges)
              problems += s"$name: shuffle exchanges ${pin.exchanges} -> ${now.exchanges}"
            if (now.globalSort && !pin.globalSort)
              problems += s"$name: a GLOBAL sort appeared (none pinned)"
            if (now.broadcasts > pin.broadcasts && now.exchanges >= pin.exchanges)
              problems += s"$name: broadcasts ${pin.broadcasts} -> ${now.broadcasts} with no shuffle savings"
            if (now.exchanges < pin.exchanges)
              improvements += s"$name: ${pin.exchanges} -> ${now.exchanges} exchanges"
        }
      }
      val stale = baseline.keySet -- current.map(_._1).toSet
      if (stale.nonEmpty) info(s"stale baseline entries (queries removed): ${stale.toSeq.sorted.mkString(", ")}")
      val imp = improvements.result()
      if (imp.nonEmpty) info(s"improved plans (consider re-baselining): ${imp.mkString("; ")}")
      val bad = problems.result()
      assert(bad.isEmpty, s"plan-shape regressions:\n  ${bad.mkString("\n  ")}")
    }
  }
}
