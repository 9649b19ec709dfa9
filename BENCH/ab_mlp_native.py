#!/usr/bin/env python
"""A/B equivalence proof for the r06 calibrated-MLP native fast path.

Computes BOTH forms of each production forward pass — the vectorized
pandas-UDF numpy path (forced by bypassing the calibrated detection) and
the native closed-form column expression — over the REAL featured
candidate table, and asserts the round(·,6) outputs are row-identical.
The unrounded forms may differ in the last ulp (BLAS dgemm accumulation
/ libm exp vs JVM Math.exp); the assertion is on the rounded values,
which are what every downstream consumer (pseudo-GT threshold, handoff
write, oracle hash) sees.

Usage: python BENCH/ab_mlp_native.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402
from pyspark.sql.types import DoubleType  # noqa: E402

from wikidata_wikifier_spark.operators import ranker  # noqa: E402
from wikidata_wikifier_spark.queries import featured_candidates  # noqa: E402
from wikidata_wikifier_spark.session import get_spark  # noqa: E402


def udf_score(df, features, weights, data_min, data_max, out):
    """The pre-r06 pandas-UDF path, verbatim (no calibrated detection)."""
    w = {k: v.copy() for k, v in weights.items()}
    dmin = np.asarray(data_min, dtype=np.float64)
    dmax = np.asarray(data_max, dtype=np.float64)

    @pandas_udf(DoubleType())
    def score_udf(feat: pd.Series) -> pd.Series:
        x = np.asarray(feat.tolist(), dtype=np.float64)
        if x.size == 0:
            return pd.Series([], dtype="float64")
        x = ranker.minmax_scale(x, dmin, dmax)
        return pd.Series(ranker.mlp_forward(x, w))

    arr = F.array(*[F.coalesce(F.col(c).cast("double"), F.lit(0.0)) for c in features])
    return df.withColumn(out, F.round(score_udf(arr), 6))


PASSES = [
    ("pseudo_gt", ranker.PSEUDO_GT_FEATURES, ranker.pseudo_gt_weights,
     ranker.PSEUDO_GT_DATA_MIN, ranker.PSEUDO_GT_DATA_MAX),
    ("final", ranker.FINAL_FEATURES, ranker.final_ranker_weights,
     ranker.FINAL_DATA_MIN, ranker.FINAL_DATA_MAX),
    ("pipeline_final", ranker.FINAL_FEATURES, ranker.pipeline_ranker_weights,
     ranker.FINAL_DATA_MIN, ranker.FINAL_DATA_MAX),
]


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"
    ]
    spark = get_spark(app_name="ab-mlp-native")
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for sf_dir in sf_dirs:
        f = featured_candidates(spark, sf_dir)
        # final-pass features not on the checked feature table get a
        # stand-in from same-scale columns: the A/B only needs identical
        # INPUTS to both forms, not the production wiring
        cols = {c.lower() for c in f.columns}
        for name, feats, mkw, dmin, dmax in PASSES:
            df = f
            for c in feats:
                if c.lower() not in cols:
                    df = df.withColumn(c, F.col("monge_elkan") if "tf_idf" not in c
                                       else F.col("jaro_winkler"))
            both = udf_score(df, feats, mkw(), dmin, dmax, "s_udf")
            both = ranker.predict_using_model(df, feats, mkw(), dmin, dmax, "s_nat") \
                .join(both.select("row", "qnode", "s_udf"), ["row", "qnode"])
            n = both.count()
            n_diff = both.where(
                (F.col("s_udf") != F.col("s_nat"))
                | (F.isnull("s_udf") != F.isnull("s_nat"))
            ).count()
            status = "PASS" if n_diff == 0 else "FAIL"
            if n_diff:
                bad += 1
                both.where(F.col("s_udf") != F.col("s_nat")).show(5, False)
            print(f"{status} {sf_dir} {name}: {n} rows, {n_diff} differ")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
