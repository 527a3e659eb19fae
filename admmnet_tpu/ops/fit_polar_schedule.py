"""Offline fitter for POLAR_QUINTIC_SCHEDULE (greedy per-step minimax LP).

The matrix-sign schedule applies, per step, the odd quintic
``g(x) = x (a + b x^2 + c x^4)`` to the (normalized) spectrum.  Given the
current eigenvalue band ``[l, u]``, the best step minimizes
``e = max_{x in [l, u]} |g(x) - 1|``; since g is linear in (a, b, c) this is
a linear program on a dense grid (Remez-style).  The band then contracts to
``[1 - e, 1 + e]`` and the next step is fitted to it.

Run as a script to refit (e.g. after changing the step count or the initial
lower bound) and paste the printed tuple into ops/projections.py:

    python -m admmnet_tpu.ops.fit_polar_schedule --steps 7 --l0 1e-3

The quality figures printed alongside are the ones the kernel docstrings
cite: composed ``|p(x) - 1|`` on ``[l0, 1]`` and the |M|-weighted error
``max_x |x (p(x) - 1)|`` on ``[0, 1]`` (what a PSD projection actually
feels: absolute eigenvalue error scaled by eigenvalue magnitude).
"""

from __future__ import annotations

import argparse

import numpy as np
from scipy.optimize import linprog


def fit_step(l: float, u: float, grid: int = 4001):
    """Minimax quintic g(x)=ax+bx^3+cx^5 mapping [l,u] -> [1-e,1+e] (LP)."""
    x = np.linspace(l, u, grid)
    # variables: a, b, c, e;  constraints: -e <= g(x) - 1 <= e
    G = np.stack([x, x**3, x**5], axis=1)
    A_ub = np.block([[G, -np.ones((grid, 1))], [-G, -np.ones((grid, 1))]])
    b_ub = np.concatenate([np.ones(grid), -np.ones(grid)])
    c = np.array([0.0, 0.0, 0.0, 1.0])
    res = linprog(
        c, A_ub=A_ub, b_ub=b_ub,
        bounds=[(None, None)] * 3 + [(0, None)],
        method="highs",
    )
    if not res.success:
        raise RuntimeError(f"LP failed on [{l}, {u}]: {res.message}")
    a, b, cq, e = res.x
    return (float(a), float(b), float(cq)), float(e)


def fit_schedule(steps: int, l0: float = 1e-3, u0: float = 1.0):
    sched, l, u = [], l0, u0
    for _ in range(steps):
        (a, b, c), e = fit_step(l, u)
        sched.append((a, b, c))
        l, u = 1.0 - e, 1.0 + e
    return sched, e


def composed_errors(sched, l0: float = 1e-3):
    x = np.linspace(0.0, 1.0, 200001)
    p = x.copy()
    for a, b, c in sched:
        p = p * (a + b * p**2 + c * p**4)
    band = x >= l0
    return float(np.max(np.abs(p[band] - 1.0))), float(np.max(np.abs(x * (p - 1.0))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=7)
    ap.add_argument("--l0", type=float, default=1e-3)
    args = ap.parse_args(argv)

    sched, _ = fit_schedule(args.steps, args.l0)
    band_err, weighted_err = composed_errors(sched, args.l0)
    print(f"# {args.steps} steps, l0={args.l0:g}: |p-1| < {band_err:.2e} on "
          f"[{args.l0:g}, 1], max |x (p-1)| = {weighted_err:.2e} on [0, 1]")
    print("POLAR_QUINTIC_SCHEDULE = (")
    for a, b, c in sched:
        print(f"    ({a:.6f}, {b:.6f}, {c:.6f}),")
    print(")")


if __name__ == "__main__":
    main()
