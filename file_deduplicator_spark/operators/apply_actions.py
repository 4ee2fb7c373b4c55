"""Apply an action plan — the explicitly-invoked mutation step.

The pipeline only ever EMITS an action plan (dry-run parity, main.go:127);
this module is the separate, deliberate step that executes it — the Spark
analog of processDuplicates' delete/move (main.go:1023-1131):

* ``apply_plan_delete`` — remove planned victims: left-anti join on the plan.
  On Iceberg this is ``DELETE FROM clips WHERE clip_id IN (SELECT ...)``;
  in the sandbox we commit the surviving rows as a new snapshot (copy-on-
  write semantics — same observable result, still time-travelable).
* ``apply_plan_move``   — "move" victims: tag rows with a target partition
  (the -move-to analog) instead of removing them; emits the updated table.
* every application appends to the undo/lineage table first (saveUndoLog
  main.go:1255-1259 — log before mutate).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from file_deduplicator_spark.sources.sinks import append_actions


def apply_plan_delete(
    clips: DataFrame,
    plan: DataFrame,
    id_col: str = "clip_id",
    actions_dir: str | Path | None = None,
    run_id: int = 0,
) -> DataFrame:
    """Surviving rows after removing planned victims (left-anti join).

    The anti-join broadcasts when the plan is small (the usual case: victims
    ≪ table); at adversarial victim counts AQE falls back to shuffle."""
    if actions_dir is not None:
        append_actions(plan, actions_dir, run_id=run_id)
    victims = plan.select(F.col(id_col))
    return clips.join(victims, id_col, "left_anti")


def apply_plan_move(
    clips: DataFrame,
    plan: DataFrame,
    move_to: str = "duplicates",
    id_col: str = "clip_id",
    actions_dir: str | Path | None = None,
    run_id: int = 0,
) -> DataFrame:
    """Tag victims with a quarantine partition value instead of deleting —
    the -move-to semantics (main.go:1077-1092) generalized to a partition
    column (writes partitioned by it land in a separate directory, the
    exact analog of the move-into-dir behavior)."""
    if actions_dir is not None:
        append_actions(plan, actions_dir, run_id=run_id)
    victims = plan.select(F.col(id_col), F.lit(True).alias("_victim"))
    return (
        clips.join(victims, id_col, "left")
        .withColumn(
            "partition_bucket",
            F.when(F.col("_victim"), F.lit(move_to)).otherwise(F.lit("keep")),
        )
        .drop("_victim")
    )
