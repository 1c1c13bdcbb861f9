"""Merge-on-write helpers for shared sweep artifacts.

The reference emits one unified artifact set (CSV / timing / comparison
figures) per full sweep process (``cnn/fashion_train.py:1382-1410``,
``mnist/mnist_clifpws.py:659-698``).  Our runners additionally allow a
sweep to be SLICED across processes (per-family or per-dim invocations
into a shared ``--outdir``); these helpers make the shared artifacts
aggregate instead of clobber: raw per-key data is persisted to JSON
sidecars merged per key, and the unified CSV/figures are regenerated from
the merged data on every write.
"""

from __future__ import annotations

import json
from typing import Dict


def jsonable(o):
    """Recursively convert numpy/JAX leaves to plain JSON types."""
    if isinstance(o, dict):
        return {k: jsonable(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [jsonable(v) for v in o]
    if hasattr(o, "tolist"):
        return o.tolist()
    return o


def load_json(path) -> Dict:
    """Best-effort load of a JSON sidecar; {} on missing/corrupt."""
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def merge_json_write(path, new_data: Dict) -> Dict:
    """Merge-on-write: existing keys survive, this invocation's keys win."""
    merged = load_json(path)
    merged.update(jsonable(new_data))
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    return merged


def merge_across_dims(path, new_data: Dict) -> Dict:
    """Merge across-dims curves keyed per (dist, dim) point.

    ``new_data`` maps dist -> {metric: [...], "dims": [...]} with lists
    aligned on "dims" (dims repeats once per trial).  This invocation's
    trial set replaces the whole (dist, dim) group; every other group is
    preserved, and the per-dist lists are re-sorted by dim.  Alignment
    note: the across-dims plotter (like the reference's
    ``wandb_utils.py:958``) aligns all dists positionally to the first
    dist's dims list, so sliced invocations must use the same dims x
    trials shape per dist for the merged table to align.
    """

    def _group_by_dim(data):
        groups: Dict = {}
        for i, d in enumerate(data.get("dims", [])):
            entry = {m: (data[m][i] if i < len(data[m]) else float("nan"))
                     for m in data if m != "dims"}
            groups.setdefault(d, []).append(entry)
        return groups

    merged = load_json(path)
    for dist, data in jsonable(new_data).items():
        if not data.get("dims"):
            continue
        groups = _group_by_dim(merged.get(dist, {}))
        groups.update(_group_by_dim(data))
        all_metrics = sorted({m for entries in groups.values()
                              for e in entries for m in e})
        out: Dict = {"dims": []}
        out.update({m: [] for m in all_metrics})
        for d in sorted(groups):
            for e in groups[d]:
                out["dims"].append(d)
                for m in all_metrics:
                    out[m].append(e.get(m, float("nan")))
        merged[dist] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    return merged
