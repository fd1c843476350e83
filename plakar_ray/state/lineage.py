"""Per-partition lineage manifests + checkpoint-resume.

Every long stage writes partitioned Parquet — one directory per input
partition — plus a manifest row per partition:
    (stage, partition_id, input_digest, row_count, wall_s)
A re-run skips partitions whose manifest row exists with a matching
input_digest (anti-join of work against completed manifests), so a failed
run resumes where it stopped and input changes invalidate exactly the
affected partitions. Never one giant output file.

Layout:
    root/<stage>/part=<id>/data.parquet
    root/<stage>/_manifest/<id>.json
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Sequence


@dataclass(frozen=True)
class Partition:
    """One resumable unit of work. `payload` is what the stage function
    needs (paths, key range, arrow table, ...); `input_digest` must be a
    deterministic function of the partition's input."""

    part_id: str
    payload: Any
    input_digest: str


def digest_of(*parts: Any) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
    return h.hexdigest()[:24]


class LineageLog:
    def __init__(self, root: str, stage: str):
        self.stage_dir = os.path.join(root, stage)
        self.manifest_dir = os.path.join(self.stage_dir, "_manifest")
        self.stage = stage
        os.makedirs(self.manifest_dir, exist_ok=True)

    def _mpath(self, part_id: str) -> str:
        return os.path.join(self.manifest_dir, f"{part_id}.json")

    def data_path(self, part_id: str) -> str:
        return os.path.join(self.stage_dir, f"part={part_id}", "data.parquet")

    def completed(self, part: Partition) -> bool:
        try:
            with open(self._mpath(part.part_id)) as f:
                m = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return False
        return (
            m.get("input_digest") == part.input_digest
            and os.path.exists(self.data_path(part.part_id))
        )

    def mark(self, part: Partition, row_count: int, wall_s: float) -> None:
        rec = {
            "stage": self.stage,
            "partition_id": part.part_id,
            "input_digest": part.input_digest,
            "row_count": row_count,
            "wall_s": round(wall_s, 4),
        }
        tmp = self._mpath(part.part_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._mpath(part.part_id))  # atomic: crash-safe

    def manifest(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.manifest_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.manifest_dir, fn)) as f:
                    out.append(json.load(f))
        return out


def run_stage(
    root: str,
    stage: str,
    partitions: Sequence[Partition],
    fn: Callable[[Any], "object"],
    parallelism: int | None = None,
):
    """Run `fn(payload) -> pyarrow.Table` for every partition not already
    completed, in parallel Ray tasks; write per-partition Parquet + manifest;
    return a ray.data.Dataset over ALL partitions (completed + new).

    Returns (dataset, n_skipped, n_ran)."""
    import pyarrow.parquet as pq
    import ray

    log = LineageLog(root, stage)
    todo = [p for p in partitions if not log.completed(p)]

    @ray.remote
    def _one(part: Partition) -> tuple[str, int, float]:
        t0 = time.time()
        table = fn(part.payload)
        path = log.data_path(part.part_id)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        return part.part_id, table.num_rows, time.time() - t0

    if todo:
        # Mark each partition durable AS ITS TASK COMPLETES (ray.wait), not
        # after an all-task barrier: a mid-stage crash then loses only the
        # in-flight partitions, and a resume skips everything already
        # finished. (Surfaced by tools/resume_demo.py — the previous
        # ray.get(all) gather meant a crash before the barrier dropped every
        # manifest even though the partition parquet files were durable.)
        ref_to_part = {_one.remote(p): p for p in todo}
        pending = list(ref_to_part)
        while pending:
            done_refs, pending = ray.wait(pending, num_returns=1)
            for r in done_refs:
                part_id, rows, wall = ray.get(r)
                log.mark(ref_to_part[r], rows, wall)

    import ray.data

    paths = [log.data_path(p.part_id) for p in partitions]
    ds = ray.data.read_parquet(paths)
    return ds, len(partitions) - len(todo), len(todo)
