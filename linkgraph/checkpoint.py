"""Per-superstep checkpoint manifests (north rule: every superstep
checkpointable and resumable with per-partition lineage and metrics).

Layout (SURVEY.md §4 checkpoint row):

    ckpt_dir/step=K/part=I.parquet   vertex state + frontier, one file per
                                     partition (written by each shard)
    ckpt_dir/step=K/manifest.json    step metrics + per-partition lineage,
                                     written ATOMICALLY by the driver LAST —
                                     its presence marks the step complete

The reference offers only manual whole-array dump/restore
(/root/reference/core/graph.hpp:253-306) and is never called by the
toolkits; checkpointing here is a from-scratch design.
"""

from __future__ import annotations

import os
import re

from .io import read_json, write_json


def manifest_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"step={step}", "manifest.json")


def write_manifest(ckpt_dir: str, step: int, run_name: str, step_record: dict,
                   parts: list[dict], graph_meta: dict) -> None:
    write_json(
        {
            "run": run_name,
            "step": step,
            "metrics": step_record,
            "partitions": parts,  # per-partition lineage: rows/active/path
            "graph": {k: graph_meta[k] for k in
                      ("n_vertices", "n_edges", "num_partitions", "symmetric")},
        },
        manifest_path(ckpt_dir, step),
    )


def latest_step(ckpt_dir: str, n_parts: int) -> int | None:
    """Largest step with a manifest AND all its partition files present."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        (int(m.group(1)) for d in os.listdir(ckpt_dir)
         if (m := re.fullmatch(r"step=(\d+)", d))),
        reverse=True,
    )
    for s in steps:
        mp = manifest_path(ckpt_dir, s)
        if not os.path.exists(mp):
            continue
        man = read_json(mp)
        paths = [p["path"] for p in man.get("partitions", [])]
        if len(paths) == n_parts and all(os.path.exists(p) for p in paths):
            return s
    return None
