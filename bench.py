#!/usr/bin/env python
"""Round benchmark: batched classical ANM-ADMM throughput on the data.npz
anchor protocol, with a detection-quality gate.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Protocol (mirrors reference test/test_time_admm.py:85-110, batched):
- BENCH_BATCH independent anchor instances (fresh demod + channel noise per
  instance), BENCH_ITERS ADMM iterations each (the reference's max_iter=100
  budget), scan-based fixed-iteration path (no host sync inside).
- value = instance-iterations per second on one chip, DEVICE-RESIDENT
  inputs (the reference brackets only the solve on in-memory data,
  test_time_admm.py:90-93; the tunnel's ~240 ms/call input transfer at
  B=8192 is relay overhead, reported separately as host_args_iter_s /
  input_transfer_ms_per_call).
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

Variance controls (round-3 verdict): the same compiled program varies ~20%
across days/tunnel sessions, so the artifact also carries (a) a PINNED
reference config (the round-2 production point K16/4-3) measured in the
same session -- ``vs_pinned_config`` is the day-invariant progress ratio --
and (b) a discriminating random-SNR detection gate (64 scenes vs the
exact-eigh control on the same scenes), which unlike the saturated
8-instance anchor gate can catch a retune that drifts detection.

Env knobs: BENCH_BATCH (default 8192), BENCH_ITERS (100), BENCH_G (psd mode:
fused_fast | fused_exact | polar_fast | polar | newton_schulz | eigh),
BENCH_FAST_HI (0|1: append the HIGHEST polish step), BENCH_SCHED (fused_fast
PSD schedule: full | sched3 | sched2; default = ADMMOptions production
default sched2), BENCH_REPEATS (default 2), BENCH_PINNED (0|1, default 1),
BENCH_RANDOM (random-SNR gate scene count, default 512; 0 disables),
BENCH_EXACT (0|1: the phi-exact throughput/NMSE block), BENCH_EXACT_BATCH
(exact-mode batch, default 2048).

Round-5 change (VERDICT r4 weak-1): the random-SNR gate defaults to 512
scenes -- the size that actually discriminates (64 scenes = +-0.5% F1 per
detection; the sub-1% drift band of interest needs ~8x that) -- funded by
dropping one timing repeat (3 -> 2; the repeats are min-reduced fetches of
one compiled program, so the third repeat bought ~nothing).  The line
carries an explicit pass/fail: ``random_gate_ok`` is true iff the
production F1 >= the exact-eigh control's F1 - 0.005 on the same scenes
(the +-0.2% chaotic-trajectory band of RESULTS.md 3.4/3.7 plus sampling
margin; the round-4 cliff configs fail this band by construction:
1-bisection warm bracket measured control-0.012).

Round-5 addition (VERDICT r4 missing-1/4): the line also carries the gated
reduced-budget DEPLOYMENT point -- the full classical pipeline (observation
-> solve -> (tau, f, height) peak list) at DETECTION_BUDGET_ITERS=10 with
PRODUCTION_PEAKS (2-round DEFAULT-precision refine), timed device-resident
(deploy_ms_per_scene / deploy_scenes_per_s) and gated on the same 512
random-SNR scenes (deploy_random_f1 / deploy_gate_ok vs the eigh control).
"""

import dataclasses
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
    REPEATS = int(os.environ.get("BENCH_REPEATS", 2))
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

    # Device-resident inputs (round-4 protocol): the reference brackets only
    # the solve on data already in process memory (test_time_admm.py:90-93);
    # feeding host numpy each call adds a measured ~240 ms/call of TUNNEL
    # INPUT TRANSFER at B=8192 (results/r04/post_r04a.json section D) that
    # is relay overhead, not solve time.  The artifact reports the
    # device-resident number as the headline and the host-args number +
    # per-call transfer cost alongside.
    stage = cjit(lambda y, b, s: (y * 1.0, b * 1.0, s * 1.0))
    y_d, b_d, s_d = stage(y, b, sigma)
    float(fx(y_d, b_d, s_d))  # warm: device-arg call path traces separately

    best = np.inf
    for _ in range(REPEATS):
        t0 = time.time()
        float(fx(y_d, b_d, s_d))
        best = min(best, time.time() - t0)
    ips = B * ITERS / best

    best_host = np.inf
    for _ in range(max(1, REPEATS - 1)):
        t0 = time.time()
        float(fx(y, b, sigma))
        best_host = min(best_host, time.time() - t0)
    host_ips = B * ITERS / best_host

    # Same-session pinned-config control (round-3 verdict, missing-3): the
    # round artifacts cannot distinguish real kernel progress from the
    # ~20% day/tunnel variance (the identical program measured 824.5k in
    # BENCH_r02 and 641.8k in the r03 retune session).  Measuring a PINNED
    # reference config -- the round-2 production point, K=16 interleave +
    # 4/3 root-finder -- in the same session gives a variance-free ratio:
    # vs_pinned_config > 1 is real speedup regardless of the day's tunnel.
    pinned_fields = {}
    if G_MODE == "fused_fast" and int(os.environ.get("BENCH_PINNED", 1)):
        pinned_opts = dataclasses.replace(
            opts, fused_kblk=16, fused_proj_iters=4, fused_inner_iters=3,
            fused_warm_root=False, fused_fold_diag=False,
        )
        fp_ = cjit(
            lambda y, b, s: jnp.sum(
                jnp.abs(admm_solve_fixed(y, b, s, ITERS, 1.0, pinned_opts))
            )
        )
        float(fp_(y_d, b_d, s_d))  # compile + warm
        best_p = np.inf
        for _ in range(REPEATS):
            t0 = time.time()
            float(fp_(y_d, b_d, s_d))
            best_p = min(best_p, time.time() - t0)
        pinned_ips = B * ITERS / best_p
        pinned_fields = {
            "pinned_config": "k16_outer4_inner3_sched2_lean",
            "pinned_iter_s": round(pinned_ips, 1),
            "vs_pinned_config": round(ips / pinned_ips, 4),
        }

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
                out += (
                    admm_solve_fixed(y, b, s, ITERS, 1.0, polar_opts),
                    admm_solve_fixed(y, b, s, ITERS, 1.0,
                                     ADMMOptions(g_update="fused_exact")),
                )
            return out

        phis = to_host(cjit(_phis)(y[:qB], b[:qB], sigma[:qB]))
        nmse_vs_eigh = float(scale_invariant_nmse(phis[0], phis[1]))
        if want_exact:
            exact_fields["exact_phi_nmse_vs_eigh"] = float(
                f"{float(scale_invariant_nmse(phis[2], phis[1])):.3e}"
            )
            exact_fields["fused_exact_phi_nmse_vs_eigh"] = float(
                f"{float(scale_invariant_nmse(phis[3], phis[1])):.3e}"
            )

    if want_exact:
        # Phi-exact mode throughput, two engines (round 5): the fused
        # whole-solve exact kernel (g_update="fused_exact", all-HIGHEST
        # quintic7 + cold 16/8 root-finder -- the production phi-exact
        # default, used by label_phi) and the per-step polar mode (the
        # rounds-1-4 exact pin, kept for cross-round comparability).
        # Measured at a smaller batch so the added wall time stays inside
        # the round budget; per-instance throughput is batch-stable
        # (RESULTS.md 1).
        B_EX = min(B, int(os.environ.get("BENCH_EXACT_BATCH", 2048)))
        for field, o in (("exact_iter_s", polar_opts),
                         ("fused_exact_iter_s",
                          ADMMOptions(g_update="fused_exact"))):
            fe = cjit(
                lambda y, b, s, o=o: jnp.sum(
                    jnp.abs(admm_solve_fixed(y, b, s, ITERS, 1.0, o))
                )
            )
            # device-resident slices (CLAUDE.md rule 7): host-fed args
            # would charge ~60 ms/call of tunnel transfer at B_EX=2048
            float(fe(y_d[:B_EX], b_d[:B_EX], s_d[:B_EX]))  # compile + warm
            best_ex = np.inf
            for _ in range(max(1, REPEATS - 1)):
                t0 = time.time()
                float(fe(y_d[:B_EX], b_d[:B_EX], s_d[:B_EX]))
                best_ex = min(best_ex, time.time() - t0)
            exact_fields[field] = round(B_EX * ITERS / best_ex, 1)
        exact_fields["exact_vs_baseline"] = round(
            exact_fields["exact_iter_s"] / 190.0, 2
        )
        exact_fields["fused_exact_vs_baseline"] = round(
            exact_fields["fused_exact_iter_s"] / 190.0, 2
        )
        exact_fields["exact_batch"] = B_EX

    # Discriminating random-SNR quality gate (round-3 verdict, weak-3): the
    # 8-instance anchor gate saturates (F1 1.0 at every config ever tried),
    # so it cannot catch a retune that drifts detection.  This gate solves
    # RANDOM_B random-SNR scenes (SNR 5-25 dB, fresh targets per scene) with
    # the production config AND the exact-eigh control, scoring both against
    # ground truth -- the production F1 must track the control's (measured
    # bit-for-bit equal through rounds 2-3, results/r03/sweep_gate.json).
    random_fields = {}
    RANDOM_B = int(os.environ.get("BENCH_RANDOM", 512))
    if RANDOM_B > 0:
        from admmnet_tpu.core.config import DataConfig
        from admmnet_tpu.data.generator import generate_batch

        from admmnet_tpu.core.config import (
            DETECTION_BUDGET_ITERS,
            PRODUCTION_PEAKS,
        )

        raw = generate_batch(jax.random.PRNGKey(42), DataConfig(), RANDOM_B)
        rnd_stats = {}
        for name, o, it, pc in (
            ("prod", opts, ITERS, PeakSearchConfig(max_peaks=8)),
            ("eigh", ADMMOptions(g_update="eigh"), ITERS,
             PeakSearchConfig(max_peaks=8)),
            # gated reduced-budget deployment point (round 5): budget-10
            # solve + 2-round DEFAULT-precision refine
            ("deploy", opts, DETECTION_BUDGET_ITERS, PRODUCTION_PEAKS),
        ):
            fr = cjit(
                lambda y, b, s, o=o, it=it, pc=pc: find_peaks(
                    admm_solve_fixed(y, b, s, it, 1.0, o), 10, 10, pc,
                )
            )
            pk = to_host(fr(raw["y"], raw["b"], raw["sigma"]))
            rnd_stats[name] = match_peaks(
                pk.tau[:, :3], pk.f[:, :3], raw["tau"], raw["f"],
                tol_tau=0.05, tol_f=0.05,
            )
        random_fields = {
            "random_snr_scenes": RANDOM_B,
            "random_f1": round(rnd_stats["prod"]["f1"], 4),
            "random_f1_eigh_control": round(rnd_stats["eigh"]["f1"], 4),
            # pass iff prod tracks the control within the chaotic-trajectory
            # band (+-0.2%, RESULTS.md 3.4) plus sampling margin
            "random_f1_band": 0.005,
            "random_gate_ok": bool(
                rnd_stats["prod"]["f1"] >= rnd_stats["eigh"]["f1"] - 0.005
            ),
            "random_tau_rmse": round(rnd_stats["prod"]["tau_rmse"], 5),
            "random_tau_rmse_eigh_control": round(
                rnd_stats["eigh"]["tau_rmse"], 5
            ),
            "deploy_random_f1": round(rnd_stats["deploy"]["f1"], 4),
            "deploy_gate_ok": bool(
                rnd_stats["deploy"]["f1"] >= rnd_stats["eigh"]["f1"] - 0.005
            ),
        }

    # Deployment throughput: full classical pipeline (observation ->
    # (tau, f, height) peak list) at the gated budget, device-resident.
    # Independent of the random gate (anchor batch), so it survives
    # BENCH_RANDOM=0.
    from admmnet_tpu.core.config import (
        DETECTION_BUDGET_ITERS,
        PRODUCTION_PEAKS,
    )

    fd = cjit(
        lambda y, b, s: (lambda pk: jnp.sum(pk.tau) + jnp.sum(pk.f)
                         + jnp.sum(jnp.where(pk.valid, pk.height, 0.0)))(
            find_peaks(
                admm_solve_fixed(
                    y, b, s, DETECTION_BUDGET_ITERS, 1.0, opts),
                10, 10, PRODUCTION_PEAKS,
            )
        )
    )
    float(fd(y_d, b_d, s_d))  # compile + warm on the device-arg path
    best_d = np.inf
    for _ in range(REPEATS):
        t0 = time.time()
        float(fd(y_d, b_d, s_d))
        best_d = min(best_d, time.time() - t0)
    random_fields.update({
        "deploy_budget_iters": DETECTION_BUDGET_ITERS,
        "deploy_ms_per_scene": round(best_d / B * 1e3, 4),
        "deploy_scenes_per_s": round(B / best_d, 1),
    })

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
                "host_args_iter_s": round(host_ips, 1),
                # clamp at 0: the delta differences two independently
                # min-reduced timings, so tunnel noise could otherwise
                # report a (meaningless) negative transfer cost (ADVICE r4)
                "input_transfer_ms_per_call": round(
                    max(0.0, best_host - best) * 1e3, 1
                ),
                "quality_f1": round(stats["f1"], 4),
                "tau_rmse": round(stats["tau_rmse"], 5),
                "f_rmse": round(stats["f_rmse"], 5),
                "phi_nmse_vs_eigh": (
                    None if nmse_vs_eigh is None else float(f"{nmse_vs_eigh:.3e}")
                ),
                **pinned_fields,
                **random_fields,
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
