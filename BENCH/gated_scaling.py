#!/usr/bin/env python
"""Bandwidth-GATED N→4N scaling campaign (VERDICT r03 #3).

The box's memory bus is shared and externally loaded: identical runs
swing 3× and the membw probe has read 0.1–192 GB/s across identical
configs. A raw efficiency number from an arbitrary window is therefore
meaningless in both directions. This campaign makes each datapoint
self-describing:

per round —
  probe → map-ceiling@2c → full-job@2c → probe → map-ceiling@8c →
  full-job@8c → probe
and records, per round:
  - the three membw probe readings bracketing the runs (gate signal),
  - eff_raw        = (T2 / T8) / 4 for the FULL pipeline,
  - map_eff        = (M2 / M8) / 4 for the zero-shuffle pure-map probe
                     measured in the SAME window — the box ceiling,
  - eff_normalized = eff_raw / map_eff — how much of the concurrently
                     measured hardware ceiling the pipeline's plan
                     achieves (the plan-quality number).
A round is CLEAN when min(probes) ≥ GATE_GB_S (host near idle). The
headline is the clean-round median of eff_raw if any round is clean,
else the best-probe round's numbers with the normalization story.

Usage: python BENCH/gated_scaling.py [--rounds 4] [--files 8000000]
Appends one JSON line per round to BENCH/gated_scaling_runs.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "BENCH")
RUNS = os.path.join(BENCH, "gated_scaling_runs.jsonl")

GATE_GB_S = 2.0  # 2-proc probe; idle host reads ~5-10, loaded 0.1-0.2


def run_json(cmd: list[str], retries: int = 2) -> dict:
    # 16g driver: 8g OOMs the 8-core aggregation at millions of files
    # (observed as GC-locker / heap failures under external host load)
    env = dict(os.environ, SPARK_DRIVER_MEM="16g")
    last_err = ""
    for attempt in range(retries + 1):
        r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True, env=env)
        if r.returncode == 0:
            for line in reversed(r.stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
            last_err = f"no JSON: {r.stdout[-300:]}"
        else:
            last_err = r.stderr[-600:]
        print(f"RETRY {attempt + 1} {cmd[-4:]}: {last_err[-300:]}", flush=True)
    raise RuntimeError(f"failed after retries {cmd}: {last_err}")


def probe() -> float:
    return run_json(
        [sys.executable, os.path.join(BENCH, "membw.py"), "--procs", "2",
         "--seconds", "4"]
    )["agg_gb_per_sec"]


ENSURE_SNIPPET = """
import sys
sys.path.insert(0, {root!r})
sys.path.insert(0, {bench!r})
from scaling import ensure_data
from wikidata_wikifier_spark.session import get_spark
spark = get_spark(app_name="gated-ensure-data", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
for n in {sizes!r}:
    ensure_data(spark, n_repos=6000, n_entities={entities}, n_files=n)
"""


def ensure_inputs(files: int, map_files: int, entities: int = 200) -> None:
    """Generate the campaign inputs ONCE at full parallelism before any
    timed round. scaling.py generates lazily, but map_scaling.py (which
    runs FIRST in each round) only reads — on a fresh workspace the whole
    campaign would fail fast on PATH_NOT_FOUND. Generation runs in a
    SUBPROCESS: PySpark's gateway JVM outlives spark.stop(), and an idle
    multi-GB generation JVM parked inside the campaign process for the
    entire gated window would shift every timed round's memory picture."""
    snippet = ENSURE_SNIPPET.format(
        root=ROOT, bench=BENCH, sizes=sorted({files, map_files}),
        entities=entities,
    )
    r = subprocess.run([sys.executable, "-c", snippet], cwd=ROOT)
    if r.returncode != 0:
        raise RuntimeError("campaign input generation failed")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--files", type=int, default=8_000_000)
    ap.add_argument("--map-files", type=int, default=2_000_000)
    # ADVICE r05: the jsonl is append-only across invocations and round
    # indices restart at 0, so per-round provenance needs an invocation
    # id. Defaults to the launch timestamp; pass an explicit label to
    # name a campaign.
    ap.add_argument("--campaign", default=time.strftime("%Y%m%dT%H%M%S"))
    args = ap.parse_args()

    ensure_inputs(args.files, args.map_files)

    py = sys.executable
    scaling = os.path.join(BENCH, "scaling.py")
    mapsc = os.path.join(BENCH, "map_scaling.py")

    for rnd in range(args.rounds):
        t_start = time.time()
        try:
            _run_round(rnd, args, py, scaling, mapsc, t_start)
        except Exception as e:  # a dead round must not kill the campaign
            print(f"ROUND {rnd} FAILED: {e}", flush=True)


def _run_round(rnd, args, py, scaling, mapsc, t_start) -> None:
    p0 = probe()
    m2 = run_json([py, mapsc, "--cpus", "2", "--files", str(args.map_files)])
    f2 = run_json([py, scaling, "--cpus", "2", "--files", str(args.files)])
    p1 = probe()
    m8 = run_json([py, mapsc, "--cpus", "8", "--files", str(args.map_files)])
    f8 = run_json([py, scaling, "--cpus", "8", "--files", str(args.files)])
    p2 = probe()

    eff_raw = (f2["wall_sec"] / f8["wall_sec"]) / 4.0
    map_eff = (m2["wall_sec"] / m8["wall_sec"]) / 4.0
    rec = {
        "round": rnd,
        "campaign": args.campaign,
        "probes_gb_s": [p0, p1, p2],
        "clean": min(p0, p1, p2) >= GATE_GB_S,
        "gate_gb_s": GATE_GB_S,
        "n_files": f2["n_files"],
        "t2_sec": f2["wall_sec"],
        "t8_sec": f8["wall_sec"],
        "triples_per_sec_2c": f2["triples_per_sec"],
        "triples_per_sec_8c": f8["triples_per_sec"],
        "map_t2_sec": m2["wall_sec"],
        "map_t8_sec": m8["wall_sec"],
        "eff_raw": round(eff_raw, 3),
        "map_eff_ceiling": round(map_eff, 3),
        "eff_normalized": round(eff_raw / map_eff, 3) if map_eff else None,
        "wall_round_sec": round(time.time() - t_start, 1),
    }
    with open(RUNS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
