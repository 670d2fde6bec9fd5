#!/usr/bin/env python3
"""Assemble BENCH_sf100_r15.json: the round-15 full-set sf100 record.

The round's sf100 measurements landed in waves (the single-shot run
died at the pipeline_e2e OOM defect it exists to catch); every gate
records which wave measured it so the artifact is honest about not
being one shot. Precedence: later waves override earlier ones.

  r14_probe      BENCH_sf100.json — 18 corpus-proportional gates, solo
  r15_sidecar_ab stream_semantic_ingest solo after the bulk-arm prune
  r15_wave3a     first full-sweep attempt: 32 shuffle partitions (the
                 sf0.1 default), ~6 min contaminated by a concurrent
                 sf0.01 verify run; died in pipeline_e2e
  r15_annfix     the two IVF-PQ recall gates re-run after the Auto
                 rerank fix
  r15_proto128   everything re-run at the 128-shuffle-partition sf100
                 protocol after the Materialize serialization fix
"""
import glob
import json

out = {
    "metric": "sf100_full",
    "sf": "/tmp/sf100 (ScaleUp 10x of /tmp/sf10; 15 GB, 5M docs, 600M lineitem)",
    "single_shot": False,
    "driver_mem": "48g",
    "cpus": 32,
    "waves": {
        "r14_probe": "round-14 probe, solo (BENCH_sf100.json)",
        "r15_sidecar_ab": "round-15 sidecar A/B, solo, 128 shuffle partitions",
        "r15_wave3a": "round-15 first sweep attempt, 32 shuffle partitions, partially contended",
        "r15_annfix": "round-15 IVF-PQ gates after the Auto rerank fix",
        "r15_proto128": "round-15 re-runs at the 128-partition sf100 protocol after the Materialize fix",
        "r15_solo": "round-15 solo re-measures of the in-sweep outliers (sweep-neighborhood control)",
    },
    "queries": {},
    "failed": [],
    "flagged": {},
    "flaky": {},
}


def add(name, sec, wave, note=None):
    rec = {"sec": sec, "wave": wave}
    if note:
        rec["note"] = note
    out["queries"][name] = rec
    if sec < 0 and name not in out["failed"]:
        out["failed"].append(name)
    if sec >= 0 and name in out["failed"]:
        out["failed"].remove(name)


r14 = json.load(open("/root/repo/BENCH_sf100.json"))
for name, rec in r14["queries"].items():
    if isinstance(rec, dict) and isinstance(rec.get("sf100_sec"), (int, float)):
        add(name, rec["sf100_sec"], "r14_probe",
            rec.get("note") if rec["sf100_sec"] < 0 else None)

add("stream_semantic_ingest", 681.4, "r15_sidecar_ab")

wave3a = json.load(open("/tmp/sf100_wave3a.json"))
for name, sec in wave3a["queries"].items():
    if isinstance(sec, (int, float)) and sec >= 0:
        add(name, sec, "r15_wave3a")

annfix = json.load(open("/tmp/annfix.json"))
for name, sec in annfix["queries"].items():
    add(name, sec, "r15_annfix")

for path in sorted(glob.glob("/tmp/sf100_proto128_*.json")):
    d = json.load(open(path))
    wave = "r15_solo" if "zsolo" in path else "r15_proto128"
    for name, sec in d["queries"].items():
        add(name, sec, wave)
    out["flagged"].update(d.get("flagged", {}))
    out["flaky"].update(d.get("flaky", {}))

all_gates = set(json.load(open("/root/repo/BENCH_sf10_r14.json"))["queries"])
missing = sorted(all_gates - set(out["queries"]))
if missing:
    out["not_measured"] = missing
print(f"gates: {len(out['queries'])}/{len(all_gates)}; "
      f"failed: {out['failed']}; flagged: {list(out['flagged'])}; "
      f"missing: {missing}")
json.dump(out, open("/root/repo/BENCH_sf100_r15.json", "w"), indent=1)
print("wrote /root/repo/BENCH_sf100_r15.json")
