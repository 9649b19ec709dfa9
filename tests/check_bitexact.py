"""Ad-hoc bit-exactness check replicating the driver's value-hash compare
(sorted columns, exact float equality) for selected queries at a given SF.

Usage: python tests/check_bitexact.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from tests.oracle_harness import run_oracle  # noqa: E402

from wikidata_wikifier_spark.oracles import ORACLES  # noqa: E402
from wikidata_wikifier_spark.queries import QUERIES  # noqa: E402
from wikidata_wikifier_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or ["features_kth_percentile", "features_pseudo_gt"]
    spark = get_spark()
    failed = []
    for name in names:
        got = QUERIES[name](spark, sf_dir).toPandas()
        want = run_oracle(ORACLES[name], sf_dir)
        got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
        want = want[sorted(want.columns)].sort_values(by=sorted(want.columns)).reset_index(drop=True)
        ok = len(got) == len(want)
        if ok:
            for c in got.columns:
                g, w = got[c].to_numpy(), want[c].to_numpy()
                if np.issubdtype(g.dtype, np.floating):
                    eq = (g == w.astype(g.dtype)) | (np.isnan(g) & np.isnan(w.astype(g.dtype)))
                else:
                    eq = got[c].astype(str).to_numpy() == want[c].astype(str).to_numpy()
                n_bad = int((~eq).sum())
                if n_bad:
                    ok = False
                    idx = np.where(~eq)[0][:5]
                    print(f"FAIL {name}.{c}: {n_bad}/{len(g)} rows differ, e.g. "
                          f"{g[idx].tolist()} vs {w[idx].tolist()}")
        else:
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        print(("PASS " if ok else "FAIL ") + name)
        if not ok:
            failed.append(name)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
