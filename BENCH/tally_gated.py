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


if __name__ == "__main__":
    main()
