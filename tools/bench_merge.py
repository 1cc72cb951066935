#!/usr/bin/env python3
"""Merge per-group graft.Bench detail JSONs into ONE bench artifact.

Part of the settled-by-construction bench (r13 verdict item 1): the
committed sf1 headline misstated a hot query ~2x for three rounds
because a single long-lived bench JVM accumulates machine state (heap,
code cache, page-cache churn, streaming-storm residue) that min-of-3
WITHIN the polluted window cannot undo — the r12 RECHECK showed the
same queries settling at half the in-bench time in a fresh JVM.
tools/bench_grouped.sh therefore runs Bench in fresh JVMs over small
query groups (each group: its own warmup + settle + min-of-N reps),
and this script merges the group artifacts into one JSON with the same
top-level schema as a single-JVM run, plus a `methodology` field and
the per-group provenance.

Usage: bench_merge.py OUT_JSON GROUP_JSON [GROUP_JSON...]
"""
import json
import sys


def main() -> int:
    out_path, group_paths = sys.argv[1], sys.argv[2:]
    if not group_paths:
        print("bench_merge.py: no group files", file=sys.stderr)
        return 1
    groups = []
    for p in group_paths:
        with open(p) as f:
            groups.append((p, json.load(f)))
    merged = {
        "metric": "total",
        "value": 0.0,
        "unit": "sec",
        "batch_total": 0.0,
        "streaming_total": 0.0,
        "branch_gate_total": 0.0,
        "branch_gates": [],
        "settle_sec": 0.0,
        "queries": {},
        "errors": [],
        "sf": groups[0][1].get("sf", ""),
        "load_start": groups[0][1].get("load_start", -1.0),
        "load_end": groups[-1][1].get("load_end", -1.0),
        "wall_sec": 0.0,
        "detail": {},
        "methodology": (
            "fresh JVM per query group (settled-by-construction, r13): "
            "each group warms up at sf0.001, settles to a bounded "
            "loadavg target, then runs min-of-N reps — the r12 RECHECK "
            "conditions applied to the whole surface"
        ),
        "groups": [],
    }
    for path, g in groups:
        for k in ("value", "batch_total", "streaming_total",
                  "branch_gate_total", "settle_sec", "wall_sec"):
            merged[k] += float(g.get(k, 0.0))
        for name, sec in g.get("queries", {}).items():
            if name in merged["queries"]:
                print(f"bench_merge.py: {name} in two groups", file=sys.stderr)
                return 1
            merged["queries"][name] = sec
        merged["detail"].update(g.get("detail", {}))
        merged["errors"].extend(g.get("errors", []))
        merged["branch_gates"].extend(
            b for b in g.get("branch_gates", [])
            if b not in merged["branch_gates"])
        merged["groups"].append({
            "file": path,
            "n_queries": len(g.get("queries", {})),
            "load_start": g.get("load_start", -1.0),
            "load_end": g.get("load_end", -1.0),
            "wall_sec": g.get("wall_sec", 0.0),
        })
    for k in ("value", "batch_total", "streaming_total",
              "branch_gate_total", "settle_sec", "wall_sec"):
        merged[k] = round(merged[k], 4)
    with open(out_path, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    # compact stdout summary mirroring Bench's own final line
    print(json.dumps({
        "metric": "total", "value": merged["value"], "unit": "sec",
        "sf": merged["sf"], "n_queries": len(merged["queries"]),
        "n_errors": len(merged["errors"]),
        "batch_total": merged["batch_total"],
        "streaming_total": merged["streaming_total"],
        "branch_gate_total": merged["branch_gate_total"],
        "wall_sec": merged["wall_sec"], "n_groups": len(groups),
        "detail_file": out_path,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
