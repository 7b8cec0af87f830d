package graft.wap

import org.apache.spark.sql.DataFrame
import graft.quality.{Audit, AuditReport, Expect}

/** Failure-notification hook. The reference posts to Slack
  * (app.py:63-100 send_slack_alert); graft keeps the same seam as a trait
  * so any transport plugs in. Default implementation logs. */
trait Alerter {
  def alert(table: String, branch: String, report: AuditReport): Unit
}

object LogAlerter extends Alerter {
  private val log = org.apache.logging.log4j.LogManager.getLogger("graft.wap")
  def alert(table: String, branch: String, report: AuditReport): Unit =
    log.warn(s"Quality check failed on table $table in branch $branch: " +
      report.failed.map(c => s"${c.name}=${c.violations}").mkString(", "))
}

/** Collects alerts in memory — used by tests and the quality dashboard. */
class BufferAlerter extends Alerter {
  val alerts = scala.collection.mutable.ArrayBuffer.empty[(String, String, AuditReport)]
  def alert(table: String, branch: String, report: AuditReport): Unit =
    alerts += ((table, branch, report))
}

case class WapResult(branch: String, published: Boolean, report: AuditReport)

/** Write-Audit-Publish orchestration — the reference's lambda_handler
  * (app.py:248-317) re-expressed over [[BranchCatalog]]:
  *
  *  1. WRITE: create table if missing; fork an isolated branch from main;
  *     append the batch there. Main readers cannot see it.
  *  2. AUDIT: scan the table back *in the branch* (exactly as the
  *     reference re-reads via the catalog rather than trusting the input
  *     batch, app.py:210-215) and run the expectation suite in one pass.
  *  3. PUBLISH: on pass, merge the branch into main (pure metadata
  *     commit) and drop it; on fail, leave the branch for inspection and
  *     fire the alerter.
  */
object Wap {

  def run(
      catalog: BranchCatalog,
      table: String,
      batch: DataFrame,
      checks: Seq[Expect],
      branchName: String,
      alerter: Alerter = LogAlerter,
      dropBranchOnPublish: Boolean = true): WapResult = {

    catalog.createTableIfNotExists(table, batch.schema)
    catalog.createBranch(branchName, from = "main")
    catalog.append(table, batch, branchName)

    val audited = catalog.scan(table, branchName)
    val report = Audit.run(audited, checks)

    if (report.passed) {
      catalog.merge(branchName, into = "main")
      if (dropBranchOnPublish) catalog.dropBranch(branchName)
    } else {
      alerter.alert(table, branchName, report)
    }
    WapResult(branchName, report.passed, report)
  }
}
