"""Per-unit lineage manifests: the engine's checkpoint/resume substrate.

One JSON file per encode unit (input parquet fragment), written atomically
(tmp + rename). A unit is DONE iff its manifest exists and parses with
``status == "done"`` — resume scans the manifest dir and skips done units
(SURVEY.md §3.4 / §4.2: per-partition manifest + anti-join on completed
ids). Manifests also carry the per-partition ratio/throughput metrics the
north rule requires.
"""

from __future__ import annotations

import json
import os
from typing import Any


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def blocks_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "blocks")


def unit_manifest_path(out_dir: str, unit_id: str) -> str:
    return os.path.join(manifest_dir(out_dir), f"unit-{unit_id}.json")


def unit_blocks_path(out_dir: str, unit_id: str) -> str:
    return os.path.join(blocks_dir(out_dir), f"unit-{unit_id}.parquet")


def write_unit_manifest(out_dir: str, unit_id: str, record: dict[str, Any]) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = unit_manifest_path(out_dir, unit_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, sort_keys=True)
    os.replace(tmp, path)


def read_unit_manifest(out_dir: str, unit_id: str) -> dict[str, Any] | None:
    path = unit_manifest_path(out_dir, unit_id)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None  # torn write → treat as not done


def completed_units(out_dir: str) -> set[str]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    done: set[str] = set()
    for fn in os.listdir(d):
        if fn.startswith("unit-") and fn.endswith(".json"):
            uid = fn[len("unit-") : -len(".json")]
            rec = read_unit_manifest(out_dir, uid)
            if rec and rec.get("status") == "done":
                done.add(uid)
    return done


def load_all_manifests(out_dir: str) -> list[dict[str, Any]]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for fn in sorted(os.listdir(d)):
        if fn.startswith("unit-") and fn.endswith(".json"):
            rec = read_unit_manifest(out_dir, fn[len("unit-") : -len(".json")])
            if rec:
                out.append(rec)
    return out
