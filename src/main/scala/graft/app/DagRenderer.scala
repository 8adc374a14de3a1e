package graft.app

import java.nio.file.{Files, Path}

/** C4 — DAG generation (`/root/reference/airflow/dag_generator/
  * dag_generator.py:6-33`): render a workflow definition for one
  * (source, asset) from a template by placeholder substitution. The
  * engine treats orchestrator DAG files as opaque text — no Airflow
  * dependency — so the renderer is the reference's exact substitution
  * contract as a pure function:
  *   - `src_sys_id_placeholder` / `ast_id_placeholder` /
  *     `dag_id_placeholder` substitute directly (dag_generator.py:17-19);
  *   - schedule `None` replaces the QUOTED placeholder so the rendered
  *     file carries a bare Python `None`; any other schedule substitutes
  *     inside the quotes (dag_generator.py:21-24).
  *
  * One deliberate divergence: the reference names generated DAGs
  * `{src}_{ast}_worflow` (dag_generator.py:11 — note the typo) while its
  * own trigger POSTs to `{src}_{ast}_workflow` (dag_trigerrer.py:15), so
  * reference-generated DAGs can never be event-triggered. Here BOTH
  * sides use [[TriggerSink.dagId]], and the round trip is pinned by
  * DagRendererSpec.
  */
object DagRenderer {

  /** Substitute the template's placeholders. `schedule = None` renders
    * the orchestrator's "no schedule, trigger-only" mode — exactly the
    * mode [[EventTrigger]] + [[TriggerSink]] drive. */
  def render(template: String, srcSysId: Int, assetId: Int,
      schedule: Option[String]): String = {
    val base = template
      .replace("src_sys_id_placeholder", srcSysId.toString)
      .replace("ast_id_placeholder", assetId.toString)
      .replace("dag_id_placeholder", TriggerSink.dagId(srcSysId, assetId))
    schedule match {
      case None => base.replace("\"schedule_placeholder\"", "None")
      case Some(s) => base.replace("schedule_placeholder", s)
    }
  }

  /** The generator's file-drop contract (`dag_generator.py:12,26-28`):
    * `{dagsDir}/{dagId}.py`, id spelled so the trigger finds it. */
  def write(dagsDir: Path, template: String, srcSysId: Int, assetId: Int,
      schedule: Option[String]): Path = {
    val out = dagsDir.resolve(TriggerSink.dagId(srcSysId, assetId) + ".py")
    Files.writeString(out, render(template, srcSysId, assetId, schedule))
    out
  }
}
