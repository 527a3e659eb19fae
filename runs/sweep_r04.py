"""Round-4 kernel sweep: the two profile-named rungs toward 1M inst-iter/s
(VERDICT r3 task 4), measured in ONE session against the shipped default.

Grid at B=8192 x 100 iters, sched2, lean layout:

- k32_3_2            round-3 production default (the session baseline)
- k32_3_2_fold       + fold_diag (plane reads emitted from the PSD finals)
- k32_2_2_cold       shallower cold bisection (attribution control: does
                     outer 3->2 need the warm bracket at all?)
- k32_2_2_warm       + warm_root (carried bracket, 2 bisections/iteration)
- k32_2_2_wf         warm_root + fold_diag together
- k32_1_2_wf         1 bisection/iteration (amortized depth floor)
- k48_2_2_wf         wider interleave (fold_diag halves the carry, so the
                     scoped-VMEM knee may move again)
- k64_2_2_wf         widest (VMEM limit raised per kblk)

Gates on the winner: 8-instance anchor F1 + phi NMSE vs exact-eigh, and
512 random-SNR scenes vs the exact-eigh control on the same scenes (the
discriminating gate; must track the control, rounds 2-3 measured ==).

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/sweep_r04.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions, DataConfig, PeakSearchConfig
from admmnet_tpu.data.anchor import ANCHOR_F, ANCHOR_TAU, make_anchor_batch
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.peaks import find_peaks, match_peaks, scale_invariant_nmse
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils.host import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

B = 8192
ITERS = 100
REP = 3

y, b, s = make_anchor_batch(B, mode="redemod", seed=0)
# device-resident inputs (round-4 protocol, results/r04/post_r04a.json D:
# host-fed args cost ~240 ms/call of tunnel transfer at B=8192, a constant
# that would dilute candidate contrasts)
_stage = cjit(lambda y, b, s: (y * 1.0, b * 1.0, s * 1.0))
y, b, s = _stage(y, b, s)
out = {}


def O(**kw):
    return ADMMOptions(g_update="fused_fast", **kw)


CANDS = {
    "k32_3_2": O(),
    "k32_3_2_fold": O(fused_fold_diag=True),
    "k32_2_2_cold": O(fused_proj_iters=2),
    "k32_2_2_warm": O(fused_proj_iters=2, fused_warm_root=True),
    "k32_2_2_wf": O(fused_proj_iters=2, fused_warm_root=True,
                    fused_fold_diag=True),
    "k32_1_2_wf": O(fused_proj_iters=1, fused_warm_root=True,
                    fused_fold_diag=True),
    "k48_2_2_wf": O(fused_kblk=48, fused_proj_iters=2, fused_warm_root=True,
                    fused_fold_diag=True),
    "k64_2_2_wf": O(fused_kblk=64, fused_proj_iters=2, fused_warm_root=True,
                    fused_fold_diag=True),
}
for name, opts in CANDS.items():
    fn = cjit(lambda y, b, s, o=opts: jnp.sum(jnp.abs(
        admm_solve_fixed(y, b, s, ITERS, 1.0, o))))
    fetch = device_retry(lambda fn=fn: float(fn(y, b, s)))
    try:
        t0 = time.time()
        fetch()
        comp = time.time() - t0
    except Exception as e:  # noqa: BLE001 - a VMEM-overflow candidate must
        out[name] = {"error": str(e)[:200]}  # not kill the sweep
        print(f"[sweep] {name}: FAILED {str(e)[:120]}", flush=True)
        continue
    best = np.inf
    for _ in range(REP):
        t0 = time.time()
        fetch()
        best = min(best, time.time() - t0)
    ips = B * ITERS / best
    out[name] = {"best_s": round(best, 4), "iter_per_s": round(ips, 1),
                 "compile_s": round(comp, 1)}
    print(f"[sweep] {name}: {ips:,.0f} iter/s (best {best:.4f}s, "
          f"compile {comp:.0f}s)", flush=True)

ok = [n for n in CANDS if "iter_per_s" in out.get(n, {})]
winner = max(ok, key=lambda n: out[n]["iter_per_s"])
w_opts = CANDS[winner]
out["winner"] = winner
base = out.get("k32_3_2", {}).get("iter_per_s")
if base:
    out["winner_vs_default_same_session"] = round(
        out[winner]["iter_per_s"] / base, 4)
print(f"[sweep] winner: {winner} "
      f"(x{out.get('winner_vs_default_same_session')} vs default)", flush=True)

# --- gates on the winner -------------------------------------------------
qB = 8
gate_fn = cjit(lambda y, b, s: (
    find_peaks(admm_solve_fixed(y, b, s, ITERS, 1.0, w_opts), 10, 10,
               PeakSearchConfig(max_peaks=8)),
    admm_solve_fixed(y, b, s, ITERS, 1.0, w_opts),
    admm_solve_fixed(y, b, s, ITERS, 1.0, ADMMOptions(g_update="eigh")),
))
peaks, phi_w, phi_e = device_retry(
    lambda: to_host(gate_fn(y[:qB], b[:qB], s[:qB])))()
st = match_peaks(peaks.tau[:, :3], peaks.f[:, :3],
                 np.broadcast_to(ANCHOR_TAU, (qB, 3)),
                 np.broadcast_to(ANCHOR_F, (qB, 3)),
                 tol_tau=0.05, tol_f=0.05)
out["anchor_gate"] = {
    "f1": round(st["f1"], 4), "tau_rmse": round(st["tau_rmse"], 5),
    "f_rmse": round(st["f_rmse"], 5),
    "phi_nmse_vs_eigh": float(f"{float(scale_invariant_nmse(phi_w, phi_e)):.3e}"),
}
print(f"[anchor] {out['anchor_gate']}", flush=True)

# --- one-iteration layout differential (closes the invariant question) ---
# A broken lean assembly/Hermitian invariant would show up as a
# PER-ITERATION systematic difference between the layouts; chaotic bf16
# trajectory divergence needs many iterations to accumulate.  The output
# phi is computed from the PREVIOUS iteration's state, so iters=2 is the
# first point where one full assembly+PSD+Z pass reaches the output: a
# broken invariant shows ~1e-2 there, single-pass noise ~1e-4 or less.
from admmnet_tpu.kernels.fused_admm_fast import admm_solve_fused_fast
from admmnet_tpu.ops.projections import POLAR_BF16_SCHED2

for ni in (2, 5):
    outs = {}
    for layout in ("lean", "lists"):
        fn = cjit(lambda yy, bb, ss, lo=layout, n=ni: admm_solve_fused_fast(
            yy, bb, ss, n, kblk=16, layout=lo, outer_iters=4, inner_iters=3,
            schedule=POLAR_BF16_SCHED2, final_hi=False))
        outs[layout] = device_retry(
            lambda fn=fn: to_host(fn(y[:64], b[:64], s[:64])))()
    num = np.linalg.norm(outs["lean"] - outs["lists"], axis=-1)
    den = np.maximum(np.linalg.norm(outs["lists"], axis=-1), 1e-30)
    out[f"layout_diff_iter{ni}"] = {
        "rel_err_max": float(f"{(num / den).max():.3e}"),
        "rel_err_mean": float(f"{(num / den).mean():.3e}")}
    print(f"[layout] {ni} iter: {out[f'layout_diff_iter{ni}']}", flush=True)

RB = 512
raw = generate_batch(jax.random.PRNGKey(42), DataConfig(), RB)
ry, rb, rs = raw["y"], raw["b"], raw["sigma"]
for name, opts in (("winner", w_opts),
                   ("eigh_control", ADMMOptions(g_update="eigh"))):
    fn = cjit(lambda y, b, s, o=opts: find_peaks(
        admm_solve_fixed(y, b, s, ITERS, 1.0, o), 10, 10,
        PeakSearchConfig(max_peaks=8)))
    pk = device_retry(lambda fn=fn: to_host(fn(ry, rb, rs)))()
    st = match_peaks(pk.tau[:, :3], pk.f[:, :3], raw["tau"], raw["f"],
                     tol_tau=0.05, tol_f=0.05)
    out[f"random_{name}"] = {"f1": round(st["f1"], 4),
                             "tau_rmse": round(st["tau_rmse"], 5),
                             "f_rmse": round(st["f_rmse"], 5)}
    print(f"[random] {name}: {out[f'random_{name}']}", flush=True)

print(json.dumps(out))
with open("results/r04/sweep_r04.json", "w") as f:
    json.dump(out, f, indent=2)
