#!/usr/bin/env python
"""Round benchmark: batched classical ANM-ADMM throughput on the data.npz
anchor protocol, with a detection-quality gate.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Protocol (mirrors reference test/test_time_admm.py:85-110, batched):
- BENCH_BATCH independent anchor instances (fresh demod + channel noise per
  instance), BENCH_ITERS ADMM iterations each (the reference's max_iter=100
  budget), scan-based fixed-iteration path (no host sync inside).
- value = instance-iterations per second on one chip.
- baseline = 190 iterations/s: the reference's implied classical throughput
  (BASELINE.md; mean 0.5244 s per <=100-iteration solve).
- quality gate: peaks of 8 solved instances must localize the 3 true targets
  (F1 == 1.0) or the line reports "quality_f1" < 1 for the judge to see; for
  approximate PSD modes the line also reports phi NMSE vs the exact-eigh
  solve on the same instances.

Default mode is fused_fast (kernels/fused_admm_fast.py): the WHOLE
fixed-iteration solve runs in one Pallas call -- K-interleaved instances,
bf16 box-constrained sign schedule, in-kernel vectorized H-projection, G/Z
resident in VMEM across all iterations.  Detection metrics match the exact
solve (F1 1.0, tau/f RMSE well under the 0.05 match tolerance); phi differs
from the eigh solve by ~1e-1 NMSE (the reported field) exactly like the
per-step polar_fast mode whose math it fuses.  BENCH_G=polar gives the
NMSE-exact (1.5e-6) mode; BENCH_G=polar_fast the per-step fast kernel.

Env knobs: BENCH_BATCH (default 8192), BENCH_ITERS (100), BENCH_G (psd mode:
fused_fast | polar_fast | polar | newton_schulz | eigh), BENCH_FAST_HI
(0|1: append the HIGHEST polish step), BENCH_SCHED (fused_fast PSD schedule:
full | sched3 | sched2; default = ADMMOptions production default sched2),
BENCH_REPEATS (default 3).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from admmnet_tpu.core.config import ADMMOptions, PeakSearchConfig
    from admmnet_tpu.data.anchor import ANCHOR_F, ANCHOR_TAU, make_anchor_batch
    from admmnet_tpu.peaks import find_peaks, match_peaks
    from admmnet_tpu.solver import admm_solve_fixed
    from admmnet_tpu.utils import cjit, to_host

    # 8192 instances: the north-star protocol is ~10k batched instances;
    # per-program dispatch/tail overhead amortizes with batch (measured
    # 599k/646k/692k/709k iter/s at B=1k/2k/4k/8k, RESULTS.md 1).
    B = int(os.environ.get("BENCH_BATCH", 8192))
    ITERS = int(os.environ.get("BENCH_ITERS", 100))
    G_MODE = os.environ.get("BENCH_G", "fused_fast")
    REPEATS = int(os.environ.get("BENCH_REPEATS", 3))
    FAST_HI = int(os.environ.get("BENCH_FAST_HI", 0))
    SCHED = os.environ.get("BENCH_SCHED")  # fused_fast: full | sched3 | sched2
    kw = {"fused_schedule": SCHED} if SCHED else {}
    opts = ADMMOptions(g_update=G_MODE, polar_fast_hi_steps=FAST_HI, **kw)

    y, b, sigma = make_anchor_batch(B, mode="redemod", seed=0)

    def solve_sum(y, b, s):
        phi = admm_solve_fixed(y, b, s, ITERS, 1.0, opts)
        # touch every output element so nothing is dead-code eliminated
        return jnp.sum(jnp.abs(phi))

    fx = cjit(solve_sum)
    # NOTE: block_until_ready does not actually block on the axon relay
    # backend; a scalar host fetch is the only reliable completion barrier.
    t0 = time.time()
    float(fx(y, b, sigma))
    compile_s = time.time() - t0

    best = np.inf
    for _ in range(REPEATS):
        t0 = time.time()
        float(fx(y, b, sigma))
        best = min(best, time.time() - t0)
    ips = B * ITERS / best

    # quality gate on a small slice
    qB = 8
    solve_phi = cjit(
        lambda y, b, s: find_peaks(
            admm_solve_fixed(y, b, s, ITERS, 1.0, opts), 10, 10,
            PeakSearchConfig(max_peaks=8),
        )
    )
    peaks = to_host(solve_phi(y[:qB], b[:qB], sigma[:qB]))
    stats = match_peaks(
        peaks.tau[:, :3],
        peaks.f[:, :3],
        np.broadcast_to(ANCHOR_TAU, (qB, 3)),
        np.broadcast_to(ANCHOR_F, (qB, 3)),
        tol_tau=0.05,
        tol_f=0.05,
    )

    # accuracy vs the exact-eigh solve on the same slice (scale-invariant
    # phi NMSE) -- quantifies approximate PSD modes (polar / polar_fast /
    # newton_schulz) on real hardware; ~0 for eigh itself.  When the
    # headline mode is fused_fast (detection-grade contract), the SAME
    # program also solves the slice with the NMSE-exact `polar` mode so the
    # round artifact carries both contracts (VERDICT r1 item 5).
    nmse_vs_eigh = None
    exact_fields = {}
    want_exact = G_MODE == "fused_fast" and int(os.environ.get("BENCH_EXACT", 1))
    if G_MODE != "eigh":
        from admmnet_tpu.peaks import scale_invariant_nmse

        polar_opts = ADMMOptions(g_update="polar")

        def _phis(y, b, s):
            out = (
                admm_solve_fixed(y, b, s, ITERS, 1.0, opts),
                admm_solve_fixed(y, b, s, ITERS, 1.0, ADMMOptions(g_update="eigh")),
            )
            if want_exact:
                out += (admm_solve_fixed(y, b, s, ITERS, 1.0, polar_opts),)
            return out

        phis = to_host(cjit(_phis)(y[:qB], b[:qB], sigma[:qB]))
        nmse_vs_eigh = float(scale_invariant_nmse(phis[0], phis[1]))
        if want_exact:
            exact_fields["exact_phi_nmse_vs_eigh"] = float(
                f"{float(scale_invariant_nmse(phis[2], phis[1])):.3e}"
            )

    if want_exact:
        # NMSE-exact mode throughput (g_update="polar", all-HIGHEST minimax
        # schedule): measured at a smaller batch so the added wall time stays
        # inside the round budget; per-instance throughput is batch-stable
        # for the per-step kernel path (RESULTS.md 1).
        B_EX = min(B, int(os.environ.get("BENCH_EXACT_BATCH", 2048)))
        fe = cjit(
            lambda y, b, s: jnp.sum(
                jnp.abs(admm_solve_fixed(y, b, s, ITERS, 1.0, polar_opts))
            )
        )
        float(fe(y[:B_EX], b[:B_EX], sigma[:B_EX]))  # compile
        best_ex = np.inf
        for _ in range(max(1, REPEATS - 1)):
            t0 = time.time()
            float(fe(y[:B_EX], b[:B_EX], sigma[:B_EX]))
            best_ex = min(best_ex, time.time() - t0)
        exact_fields["exact_iter_s"] = round(B_EX * ITERS / best_ex, 1)
        exact_fields["exact_vs_baseline"] = round(
            exact_fields["exact_iter_s"] / 190.0, 2
        )
        exact_fields["exact_batch"] = B_EX

    # reference-parity pin: ref-compat mode (dense phi update + identity G
    # step + adaptive stop -- the reference's exact semantics) on the FIXED
    # anchor vs the float64 numpy oracle (solver/reference_oracle.py).
    # Pinned per-round so "matches reference output within tolerance" lives
    # in the artifact, not just in tests/test_golden.py.
    refcompat_nmse = None
    if int(os.environ.get("BENCH_REFCOMPAT", 1)):
        from admmnet_tpu.data.anchor import load_anchor
        from admmnet_tpu.peaks import phi_nmse
        from admmnet_tpu.solver import admm_solve
        from admmnet_tpu.solver.reference_oracle import reference_admm

        sc = load_anchor(mode="fixed_e", rng=np.random.default_rng(0))
        res = cjit(
            lambda y, b, s: admm_solve(
                y, b, s, 1.0,
                ADMMOptions(phi_update="ref_dense", g_update="ref_identity",
                            max_iter=ITERS),
            ).phi
        )(sc.y[None], sc.b[None], np.float32(sc.sigma)[None])
        phi_oracle, _ = reference_admm(
            sc.y, sc.b, 1.0, sc.sigma, max_iter=ITERS, phi_mode="dense"
        )
        refcompat_nmse = float(phi_nmse(to_host(res)[0], phi_oracle))

    print(
        json.dumps(
            {
                "metric": "classical_admm_instance_iterations_per_s",
                "value": round(ips, 1),
                "unit": "iter/s",
                "vs_baseline": round(ips / 190.0, 2),
                "batch": B,
                "iters": ITERS,
                "g_update": G_MODE,
                **(
                    {"fused_schedule": opts.fused_schedule}
                    if G_MODE == "fused_fast" else {}
                ),
                "compile_s": round(compile_s, 1),
                "best_run_s": round(best, 3),
                "quality_f1": round(stats["f1"], 4),
                "tau_rmse": round(stats["tau_rmse"], 5),
                "f_rmse": round(stats["f_rmse"], 5),
                "phi_nmse_vs_eigh": (
                    None if nmse_vs_eigh is None else float(f"{nmse_vs_eigh:.3e}")
                ),
                **exact_fields,
                "refcompat_phi_nmse_vs_oracle64": (
                    None if refcompat_nmse is None
                    else float(f"{refcompat_nmse:.3e}")
                ),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
