package graft.pipeline

import graft.spec.ExportConfig

import scala.util.control.NonFatal

/** Orchestration with the reference's per-config fault isolation
  * (`/root/reference/main.py:61-112`, E1–E4 in SURVEY.md §2.10):
  * any failure inside one config's extract→transform→load logs ERROR and
  * moves on; empty extracts skip with WARNING; the run returns a processed
  * count (HTTP 200 analogue) unless setup itself fails (500 analogue).
  *
  * Net E3 semantics modeled directly: a failed transform skips the load
  * (the reference reaches the same outcome accidentally via its
  * raw-DataFrame fallback + truthiness TypeError).
  */
object Pipeline {

  sealed trait ConfigResult { def configId: String }
  final case class Processed(configId: String, rows: Long) extends ConfigResult
  final case class Skipped(configId: String, reason: String) extends ConfigResult
  final case class Failed(configId: String, error: Throwable) extends ConfigResult

  final case class RunSummary(results: Seq[ConfigResult]) {
    def processedCount: Int = results.count(_.isInstanceOf[Processed])
    /** "Processed N configurations" (`/root/reference/main.py:115-118`). */
    def message: String = s"Processed $processedCount configurations"
  }

  /** Run every config through `process`, isolating failures per config.
    * `reportsFilter` scopes the run to one config id (P7,
    * `/root/reference/main.py:64-65`).
    */
  def run(
      configs: Seq[ExportConfig],
      reportsFilter: Option[String] = None
  )(process: ExportConfig => Long): RunSummary = {
    val selected = reportsFilter match {
      case Some(f) => configs.filter(_.configId == f)
      case None    => configs
    }
    val results = selected.map { cfg =>
      graft.util.JsonLog.info(s"Processing configuration ${cfg.configId}")
      try {
        val rows = process(cfg)
        if (rows == 0L) {
          graft.util.JsonLog.warning(s"No data extracted for ${cfg.configId}")
          Skipped(cfg.configId, "no data extracted")
        } else Processed(cfg.configId, rows)
      } catch {
        case NonFatal(e) =>
          // E1: log ERROR, continue with the next config
          graft.util.JsonLog.error(s"Failed processing ${cfg.configId}: ${e.getMessage}")
          Failed(cfg.configId, e)
      }
    }
    val summary = RunSummary(results)
    graft.util.JsonLog.info(summary.message)
    summary
  }
}
