#!/usr/bin/env python3
"""Re-measure the BASELINE.md pandas/numpy stage baselines at a given SF.

Replicates the BASELINE.md methodology exactly (median of 3, data
pre-loaded, single-threaded pandas): the six reference-task equivalents
whose SUM is the pipeline_e2e gate baseline hardcoded in Bench.scala
(0.0756 s at sf0.01, 0.6328 s at sf0.1). Run against sf0.1 first to
confirm this script reproduces the committed numbers, then against sf1
to extend the gate with a scale point where Spark's job floor is
amortized (VERDICT r14 item 8).

Usage: python3 tools/pandas_baseline.py <sfDir>
"""
import re
import sys
import time
import statistics

import numpy as np
import pandas as pd


def med3(fn):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    num_cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    print(f"[pandas-baseline] {sf_dir} lineitem rows={len(li)}")

    # 1. clean_data: convert_dtypes + name sanitize (src/tasks.py:243-272)
    def clean():
        df = li.convert_dtypes()
        df.columns = [re.sub(r"[^a-z0-9_]", "_", c.lower().strip()) for c in df.columns]
        return df

    # 2. encode_data: one-hot l_returnflag, l_linestatus (src/tasks.py:275-310)
    def encode():
        return pd.get_dummies(li[["l_returnflag", "l_linestatus"]],
                              columns=["l_returnflag", "l_linestatus"])

    # 3. wrangle_na "fi": 5% NA injected (seed 42, excluded from timing),
    #    mean-fill (src/tasks.py:398-421)
    rng = np.random.RandomState(42)
    with_na = li[num_cols].copy()
    mask = rng.rand(*with_na.shape) < 0.05
    with_na = with_na.mask(mask)

    def fi():
        return with_na.fillna(with_na.mean())

    # 4. transform arcsinh (src/tasks.py:476-521)
    def arcsinh():
        return np.arcsinh(li[num_cols].to_numpy())

    # 5. gelman_standardize (src/tasks.py:524-556)
    def gelman():
        x = li[num_cols]
        return (x - x.mean()) / (2 * x.std())

    # 6. OLS normal equations, 3 regressors + std errors (src/tasks.py:561-580)
    y = li["l_extendedprice"].to_numpy(dtype=float)
    X = li[["l_quantity", "l_discount", "l_tax"]].to_numpy(dtype=float)

    def ols():
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ beta
        dof = len(y) - X.shape[1]
        sigma2 = resid @ resid / dof
        cov = sigma2 * np.linalg.inv(X.T @ X)
        return beta, np.sqrt(np.diag(cov))

    stages = [
        ("clean_data", clean),
        ("encode_data", encode),
        ("wrangle_na_fi", fi),
        ("transform_arcsinh", arcsinh),
        ("gelman_standardize", gelman),
        ("ols_normal_equations", ols),
    ]
    total = 0.0
    for name, fn in stages:
        t = med3(fn)
        total += t
        print(f"[pandas-baseline] {name}: {t * 1000:.1f} ms")
    print(f"[pandas-baseline] pipeline sum: {total:.4f} s")


if __name__ == "__main__":
    main(sys.argv[1])
