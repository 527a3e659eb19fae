"""Settle 42-vs-1000 epochs: per-SGDR-cycle val-loss analysis of a phi run.

Reads a workdir's training_history.json and reports, for each SGDR cycle
(restarts at epochs 10, 30, 70, 150, ... for T0=10, mult=2), the best val
loss inside the cycle and the relative improvement over the previous
cycle's best -- the quantitative form of "run until restarts stop helping"
(reference trainPhi.py:29-31 trains 1000 epochs; the question is what the
tail buys).

Run: python runs/analyze_phi_long.py runs/phi10_long
"""
import json
import sys

import numpy as np

workdir = sys.argv[1] if len(sys.argv) > 1 else "runs/phi10_long"
h = json.load(open(f"{workdir}/training_history.json"))
val = np.asarray(h["val_loss"])
n = len(val)
print(f"{workdir}: {n} epochs, final val {val[-1]:.3e}, "
      f"best val {val.min():.3e} at epoch {val.argmin() + 1}")

bounds = []
t0, e = 10, 0
while e < n:
    bounds.append((e, min(e + t0, n)))
    e += t0
    t0 *= 2
prev = None
rows = []
for lo, hi in bounds:
    best = float(val[lo:hi].min())
    imp = None if prev is None else (prev - best) / prev
    rows.append({"cycle_epochs": f"{lo + 1}-{hi}", "best_val": best,
                 "rel_improvement_vs_prev_cycle": imp})
    print(f"  epochs {lo + 1:>3}-{hi:<3}: best val {best:.4e}"
          + (f"  (improves prev cycle by {imp * 100:.2f}%)"
             if imp is not None else ""))
    prev = best
print(json.dumps({"workdir": workdir, "epochs": n, "cycles": rows}))
