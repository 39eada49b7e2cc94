#!/usr/bin/env python3
"""Derive the external MICE goldens for the airquality fixture (MiceSpec).

The reference's own MICE test is empty (test_tasks.py:465-470) and its
engine (statsmodels MICEData) is stochastic, so no bit-exact golden
exists. Three externally-derived anchors ARE checkable, and this script
computes the numbers MiceSpec hard-codes:

1. PMM support bounds. statsmodels MICEData imputes with predictive mean
   matching — every imputed value is an observed DONOR value, so an
   imputation can never leave the observed [min, max] of its column.
   (Unbounded Gaussian draws can: on this fixture the row-9 cells —
   Ozone+Wind+dummy all missing, feeding each other — form an expansive
   linear map; the noise-free Jacobi iteration diverges to |values| >
   1e5 within 500 sweeps. Mice.scala truncates its draw to the observed
   support for exactly this reason.)

2. Complete-case OLS centers for cells whose PREDICTORS are all
   observed. MICE draws center on conditional predictions; for Ozone row
   3 (Solar=313, Wind=11.5, dummy=1) and Solar.R row 5 (Ozone=28,
   Wind=14.9, dummy=1) the prediction is a pure function of the fixture,
   computed below from the 6 complete rows with numpy normal equations
   (independent of the Scala Gram/probit path). Tolerances are multiples
   of the cc-residual sigma; both bounds REJECT naive mean-fill
   (Ozone 23.857, Solar.R 172.625 — the reference's documented
   mean-imputation values, test_tasks.py:78-80).

3. The reference's intended distribution contract: its (empty) MICE test
   docstring requires each imputed dataset's KL divergence w.r.t. the
   original dataset to be < 1 — asserted per numeric column with the
   Gaussian closed form in MiceSpec.

Fixture: airquality_na, reference test_tasks.py:78-92, typed as
clean_data leaves it (fake_dummy -> boolean -> 0/1 in the equations).
"""
import numpy as np

# complete rows (all four columns observed): 0,1,2,6,7,8
# cols: Ozone, Solar.R, Wind, fake_dummy
C = np.array([
    [41, 190, 7.4, 0],
    [36, 118, 8, 0],
    [12, 149, 12.6, 0],
    [23, 299, 8.6, 1],
    [19, 99, 13.8, 1],
    [8, 19, 20.1, 1],
], float)

RIDGE = 1e-8  # same ridge as RunModel.gramFit in Mice.apply


def cc_fit(target):
    X = np.column_stack([np.ones(6)] + [C[:, j] for j in range(4) if j != target])
    y = C[:, target]
    beta = np.linalg.solve(X.T @ X + RIDGE * np.eye(4), X.T @ y)
    resid = y - X @ beta
    return beta, float(np.sqrt(resid @ resid / max(1, 6 - 4)))


b, s = cc_fit(0)
print(f"Ozone[3]  cc pred = {b @ np.array([1, 313, 11.5, 1]):.6f}  sigma = {s:.6f}  "
      f"(mean-fill 23.857143 must violate pred±1.5σ)")
b, s = cc_fit(1)
print(f"Solar[5]  cc pred = {b @ np.array([1, 28, 14.9, 1]):.6f}  sigma = {s:.6f}  "
      f"(mean-fill 172.625 must violate pred±2σ)")
print("supports: Ozone [8,41], Solar.R [19,313], Wind [7.4,20.1]")

# ---------------------------------------------------------------------------
# Boolean-target fixture (iraq_vote shape: numeric predictors + a y/n vote
# column with NAs) — the external anchor for Mice.scala's LINEAR-PROBABILITY
# branch. Booleans join the chained equations as 0/1 columns; the draw is
# pred + sigma*probit(u) clamped to [0,1] and the OUTPUT threshold is
# >= 0.5, so P(imputed true) = Phi((pred - 0.5) / sigma) exactly (clamping
# at 0/1 cannot move a draw across 0.5). The numbers below are what
# MiceSpec's boolean-golden test hard-codes.
from math import erf, sqrt

V = np.array([  # row_id, x1, x2, vote (complete cases 0..7)
    [10, 1, 0],
    [12, 2, 0],
    [9, 1, 0],
    [11, 3, 0],
    [30, 8, 1],
    [32, 9, 1],
    [29, 9, 1],
    [31, 7, 1],
], float)
Xv = np.column_stack([np.ones(8), V[:, 0], V[:, 1]])
yv = V[:, 2]
bv = np.linalg.solve(Xv.T @ Xv + RIDGE * np.eye(3), Xv.T @ yv)
rv = yv - Xv @ bv
sv = float(np.sqrt(rv @ rv / (8 - 3)))
phi = lambda z: 0.5 * (1 + erf(z / sqrt(2)))
for rid, x1, x2 in [(8, 10.5, 2.0), (9, 30.5, 8.0)]:
    p = bv @ np.array([1, x1, x2])
    pt = phi((p - 0.5) / sv)
    print(f"vote[{rid}]  cc-LPM pred = {p:.6f}  sigma = {sv:.6f}  P(true) = {pt:.6f}")
