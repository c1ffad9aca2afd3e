#!/usr/bin/env python3
"""Merge per-shard Bench JSON artifacts (written with
SPARK_GRAFT_BENCH_OUT + SPARK_GRAFT_ONLY shard key lists) into one
full-surface artifact with the same shape as a single Bench run:
queries/runs/errors unioned, value = sum of per-key minima, loadavg =
the max observed across shards (worst co-tenancy during the series),
plus a `shards` field recording the per-shard provenance.

usage: merge_bench.py [--expect N] OUT.json SHARD1.json SHARD2.json ...

--expect N (round-13 advice): fail the merge when the union of shard
keys differs from the expected surface size — a shard JSON missing from
the glob (skipped shard, stale rm) must not certify a partial surface
with no error.
"""
import json, sys

args = sys.argv[1:]
expect = None
if args and args[0] == "--expect":
    expect = int(args[1])
    args = args[2:]
out_path, shard_paths = args[0], args[1:]
queries, runs, errors, shards = {}, {}, [], []
load_start, converged = {}, {}
sf = cpus = None
load = [0.0, 0.0, 0.0]
for p in shard_paths:
    d = json.load(open(p))
    dup = set(d["queries"]) & set(queries)
    if dup:
        sys.exit(f"duplicate keys across shards: {sorted(dup)}")
    queries.update(d["queries"])
    runs.update(d.get("runs", {}))
    load_start.update(d.get("load_start", {}))
    converged.update(d.get("converged", {}))
    errors += d.get("errors", [])
    la = d.get("loadavg", [])
    load = [max(x, y) for x, y in zip(load, (la + [0, 0, 0])[:3])]
    sf, cpus = d.get("sf", sf), d.get("cpus", cpus)
    shards.append({"file": p, "n": len(d["queries"]),
                   "value": d.get("value"), "loadavg": la})
if expect is not None and len(queries) != expect:
    sys.exit(f"merge incomplete: {len(queries)} keys from "
             f"{len(shard_paths)} shard files, expected {expect}")
total = sum(v for v in queries.values() if v >= 0)
merged = {"metric": "total", "value": total, "unit": "sec",
          "queries": queries, "runs": runs, "load_start": load_start,
          "converged": converged, "errors": sorted(errors),
          "sf": sf, "loadavg": load, "cpus": cpus, "shards": shards}
json.dump(merged, open(out_path, "w"))
print(f"{out_path}: {len(queries)} keys, total {total:.1f}s, "
      f"errors={sorted(errors)}, max loadavg={load}")
