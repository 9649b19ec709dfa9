#!/usr/bin/env python
"""Tally the gated scaling campaign (BENCH/gated_scaling_runs.jsonl):
per-round table + clean-round medians — the exact numbers quoted in
BENCH/BASELINE.md, recomputable by anyone from the committed raw lines.

Usage: python BENCH/tally_gated.py
"""

from __future__ import annotations

import json
import os
import statistics

RUNS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "gated_scaling_runs.jsonl")


def main() -> None:
    rows = [json.loads(l) for l in open(RUNS) if l.strip()]
    print(f"{'#':>2} {'probes (GB/s)':>20} {'clean':>5} {'T2':>8} {'T8':>8} "
          f"{'eff_raw':>7} {'ceiling':>7} {'eff/ceil':>8}")
    for i, r in enumerate(rows, 1):
        probes = ",".join(f"{p:.1f}" for p in r["probes_gb_s"])
        print(f"{i:>2} {probes:>20} {str(r['clean']):>5} "
              f"{r['t2_sec']:>8.1f} {r['t8_sec']:>8.1f} "
              f"{r['eff_raw']:>7.3f} {r['map_eff_ceiling']:>7.3f} "
              f"{r['eff_normalized']:>8.2f}")

    clean = [r for r in rows if r["clean"]]
    if not clean:
        print("\nno clean rounds")
        return
    med = lambda k: statistics.median(r[k] for r in clean)
    print(f"\nclean rounds: {len(clean)}/{len(rows)}")
    print(f"eff_raw        median {med('eff_raw'):.3f}  "
          f"range [{min(r['eff_raw'] for r in clean):.3f}, "
          f"{max(r['eff_raw'] for r in clean):.3f}]")
    print(f"map ceiling    median {med('map_eff_ceiling'):.3f}")
    print(f"eff/ceiling    median {med('eff_normalized'):.3f}  "
          f"range [{min(r['eff_normalized'] for r in clean):.3f}, "
          f"{max(r['eff_normalized'] for r in clean):.3f}]")
    print(f"triples/s 2c   median {med('triples_per_sec_2c'):.0f}")
    print(f"triples/s 8c   median {med('triples_per_sec_8c'):.0f}")

    # VERDICT r05 #4 / ADVICE r05: the bracket-probe gate cannot see load
    # that starts and ends BETWEEN probes — a leg that runs a >2σ
    # wall-time outlier vs its clean siblings, or a round that "beats"
    # the concurrently-measured hardware ceiling by >2.5x, indicates
    # exactly that. Documented exclusion rule (not eyeballing): such
    # rounds are listed with reasons and a ROBUST median is printed
    # alongside the plain clean median (which stays, for continuity with
    # the numbers BASELINE.md already quotes).
    suspects: dict[int, list[str]] = {}
    for leg in ("t2_sec", "t8_sec"):
        vals = [r[leg] for r in clean]
        if len(vals) < 3:
            break
        mu = statistics.mean(vals)
        sd = statistics.pstdev(vals)
        if sd == 0:
            continue
        for i, r in enumerate(rows, 1):
            if r["clean"] and abs(r[leg] - mu) > 2 * sd:
                suspects.setdefault(i, []).append(
                    f"{leg} {r[leg]:.0f}s is >2 sigma from clean mean {mu:.0f}s"
                )
    # eff/ceiling sanity band (ADVICE r05: "~1.5"): the shuffle-bearing
    # pipeline cannot GENUINELY out-scale the concurrently-measured
    # zero-shuffle map ceiling by >1.5x — that means the ceiling probe
    # itself ran against load; symmetrically, <0.5 with clean probes
    # means a full-job leg ran against load the brackets missed. The
    # band is campaign-size-invariant, unlike raw wall times (the jsonl
    # holds two campaign invocations with different workload sizes).
    for i, r in enumerate(rows, 1):
        if r["clean"] and not (0.5 <= r["eff_normalized"] <= 1.5):
            suspects.setdefault(i, []).append(
                f"eff/ceiling {r['eff_normalized']:.2f} outside the [0.5, 1.5] sanity band"
            )
    robust = [r for i, r in enumerate(rows, 1)
              if r["clean"] and i not in suspects]
    if suspects:
        print("\nexcluded as suspect (mid-window load the probes missed):")
        for i, reasons in sorted(suspects.items()):
            print(f"  round {i}: " + "; ".join(reasons))
    if robust and len(robust) < len(clean):
        rmed = lambda k: statistics.median(r[k] for r in robust)
        print(f"robust rounds: {len(robust)}/{len(rows)}")
        print(f"eff_raw        robust median {rmed('eff_raw'):.3f}")
        print(f"eff/ceiling    robust median {rmed('eff_normalized'):.3f}")


if __name__ == "__main__":
    main()
