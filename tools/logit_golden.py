#!/usr/bin/env python3
"""Independent numpy IRLS golden for LogitSpec (the mice_golden.py pattern).

Fits P(lang == 'zh' | 1, ln(1+len), spaces/len, digits/len) on the
sf0.001 documents fixture with the EXACT iteration contract of
graft.llm.Logit.fit (beta0 = 0, 8 iterations, ridge 1e-6 on the
diagonal, w = p(1-p) + 1e-12, working response folded as
X'(W eta + (y - p))), entirely independent of the Scala code path.
Prints the coefficient vector LogitSpec hard-codes.
"""
import re
import sys

import duckdb
import numpy as np

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

rows = duckdb.sql(
    f"SELECT text, lang FROM '{SF_DIR}/documents.parquet' "
    "WHERE text IS NOT NULL AND lang IS NOT NULL"
).fetchall()

feats, ys = [], []
for text, lang in rows:
    n = len(text)
    if n == 0:
        continue
    spaces = text.count(" ")
    digits = len(re.sub(r"[^0-9]", "", text))
    feats.append([1.0, np.log1p(float(n)), spaces / float(n), digits / float(n)])
    ys.append(1.0 if lang == "zh" else 0.0)

X = np.array(feats)
y = np.array(ys)
k = X.shape[1]
beta = np.zeros(k)
for _ in range(8):
    eta = X @ beta
    p = 1.0 / (1.0 + np.exp(-eta))
    w = p * (1.0 - p) + 1e-12
    xtx = (X * w[:, None]).T @ X + 1e-6 * np.eye(k)
    xr = X.T @ (w * eta + (y - p))
    beta = np.linalg.solve(xtx, xr)

print("n =", len(y), " positives =", int(y.sum()))
print("beta =", [round(b, 6) for b in beta])
score = 1.0 / (1.0 + np.exp(-(X @ beta)))
print("mean score zh =", round(float(score[y == 1].mean()), 4),
      " non-zh =", round(float(score[y == 0].mean()), 4))
