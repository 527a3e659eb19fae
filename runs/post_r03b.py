"""Round-3 final TPU pass, take 2 (runs/post_r03.py asserted too early).

post_r03 measured lean-vs-lists ON-HARDWARE rel phi error 2.3e-2 mean /
4.9e-2 max at the production sched2 + 4/3 settings -- far beyond the
interpret-mode pin (5e-4), where both layouts execute the same f32 math.
Two hypotheses: (a) the lean layout's bitwise-Hermitian invariant breaks
under real Mosaic compilation, or (b) two valid orderings of one-pass bf16
math diverge chaotically through 100 fixed-point iterations while landing
in the same inexact-prox band.  This script separates them:

1. lean vs lists at the CONSERVATIVE settings (full 6-step schedule,
   HIGHEST finals, 16/8 root-finder): a tighter prox contracts the fixed
   point harder -- if the layouts then agree ~100x tighter, the divergence
   scales with schedule looseness (hypothesis b), not with a broken
   assembly invariant (which would persist at every schedule);
2. each layout's phi NMSE vs the exact-eigh solve on the same instances at
   production settings: equal bands = equal-quality fixed points;
3. device-resident input timing of the production solve (the transfer
   decomposition);
4. learned_sensing evaluation: trained vs untrained-graft control vs
   identity baseline on the rand50k test split.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/post_r03b.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions, ModelConfig, ProblemSpec
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.data.generator import DatasetGenerator
from admmnet_tpu.kernels.fused_admm_fast import admm_solve_fused_fast
from admmnet_tpu.models import ADMMNet
from admmnet_tpu.ops.projections import POLAR_BF16_SCHED2
from admmnet_tpu.peaks import match_peaks, scale_invariant_nmse
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.train.checkpoint import restore_checkpoint
from admmnet_tpu.utils.host import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

OUT = {"prod_lean_vs_lists": {"rel_err_max": 4.911e-2,
                              "rel_err_mean": 2.296e-2,
                              "source": "runs/post_r03.py run 1"}}
y64, b64, s64 = make_anchor_batch(64, mode="redemod", seed=0)


def run_fused(layout, conservative):
    kw = (dict(outer_iters=16, inner_iters=8, final_hi=True)
          if conservative else
          dict(outer_iters=4, inner_iters=3, schedule=POLAR_BF16_SCHED2,
               final_hi=False))
    fn = cjit(lambda y, b, s: admm_solve_fused_fast(
        y, b, s, 100, kblk=16, layout=layout, **kw))
    return device_retry(lambda: to_host(fn(y64, b64, s64)))()


def rel_err(a, b):
    num = np.linalg.norm(a - b, axis=-1)
    den = np.maximum(np.linalg.norm(b, axis=-1), 1e-30)
    return num / den


# --- 1. conservative-settings layout agreement
lean_c, lists_c = run_fused("lean", True), run_fused("lists", True)
r = rel_err(lean_c, lists_c)
OUT["conservative_lean_vs_lists"] = {"rel_err_max": float(f"{r.max():.3e}"),
                                     "rel_err_mean": float(f"{r.mean():.3e}")}
print(f"[1] conservative lean-vs-lists: {OUT['conservative_lean_vs_lists']}",
      flush=True)

# --- 2. production-settings NMSE band vs eigh
lean_p, lists_p = run_fused("lean", False), run_fused("lists", False)
eigh_fn = cjit(lambda y, b, s: admm_solve_fixed(
    y, b, s, 100, 1.0, ADMMOptions(g_update="eigh")))
phi_eigh = device_retry(lambda: to_host(eigh_fn(y64, b64, s64)))()
OUT["prod_nmse_vs_eigh"] = {
    "lean": float(f"{float(scale_invariant_nmse(lean_p, phi_eigh)):.3e}"),
    "lists": float(f"{float(scale_invariant_nmse(lists_p, phi_eigh)):.3e}"),
}
print(f"[2] NMSE vs eigh: {OUT['prod_nmse_vs_eigh']}", flush=True)

# --- 3. device-resident input timing
B, ITERS, REP = 8192, 100, 4
y, b, s = make_anchor_batch(B, mode="redemod", seed=0)
opts = ADMMOptions(g_update="fused_fast")  # production defaults (K32, 3/2)
fx = cjit(lambda y, b, s: jnp.sum(jnp.abs(
    admm_solve_fixed(y, b, s, ITERS, 1.0, opts))))
fetch = device_retry(lambda: float(fx(y, b, s)))
fetch()
best_host = np.inf
for _ in range(REP):
    t0 = time.time()
    fetch()
    best_host = min(best_host, time.time() - t0)
stage = cjit(lambda y, b, s: (y * 1.0, b * 1.0, s * 1.0))
y_d, b_d, s_d = stage(y, b, s)
fetch_d = device_retry(lambda: float(fx(y_d, b_d, s_d)))
fetch_d()
best_dev = np.inf
for _ in range(REP):
    t0 = time.time()
    fetch_d()
    best_dev = min(best_dev, time.time() - t0)
OUT["solve_host_args"] = {"best_s": round(best_host, 4),
                          "iter_per_s": round(B * ITERS / best_host, 1)}
OUT["solve_device_resident"] = {"best_s": round(best_dev, 4),
                                "iter_per_s": round(B * ITERS / best_dev, 1)}
OUT["input_transfer_ms_per_call"] = round((best_host - best_dev) * 1e3, 1)
print(f"[3] host-args {OUT['solve_host_args']} | device-resident "
      f"{OUT['solve_device_resident']} | transfer "
      f"{OUT['input_transfer_ms_per_call']} ms/call", flush=True)

# --- 4. learned_sensing eval
gen = DatasetGenerator(data_dir="data/rand50k")
test = gen.load_split("test")
n = min(512, test["y"].shape[0])
test = {k: v[:n] for k, v in test.items()}
spec = ProblemSpec()
for tag, ckpt, sensing in (("sense", "runs/spec50k_sense", True),
                           ("sense_graft_untrained", "GRAFT", True),
                           ("identity", "runs/spec50k", False)):
    mcfg = ModelConfig(spec=spec, num_layers=10, g_mode="chebyshev",
                       cheb_degree=48, head="spectrum",
                       learned_sensing=sensing)
    model = ADMMNet(cfg=mcfg)
    p0 = cjit(lambda k, y, b, s: model.init(k, y, b, s))(
        jax.random.PRNGKey(0), test["y"][:2], test["b"][:2],
        test["sigma"][:2])
    if ckpt == "GRAFT":
        from pathlib import Path

        import flax.serialization as fser

        from admmnet_tpu.train.trainer import _graft_params

        raw = fser.msgpack_restore(
            (Path("runs/spec50k") / "best_model.msgpack").read_bytes()
        )
        params = _graft_params(p0, raw["params"], print)
    else:
        restored = restore_checkpoint(ckpt, {"params": p0,
                                             "opt_state": None})
        if restored is None:
            print(f"[4] {tag}: NO CHECKPOINT under {ckpt}", flush=True)
            continue
        params = restored[0]["params"]
    tau, f, conf = device_retry(lambda m=model, p=params: to_host(cjit(
        lambda p_, y, b, s: m.apply(p_, y, b, s)[:3]
    )(p, test["y"], test["b"], test["sigma"])))()
    order = np.argsort(-conf, axis=-1)
    rows = np.arange(n)[:, None]
    tau, f, conf = tau[rows, order], f[rows, order], conf[rows, order]
    st = match_peaks(tau, f, test["tau"], test["f"], 0.05, 0.05,
                     pred_valid=conf > 0.5)
    OUT[f"e2e_{tag}"] = {"f1": round(st["f1"], 4),
                         "precision": round(st["precision"], 4),
                         "recall": round(st["recall"], 4),
                         "tau_rmse": round(st["tau_rmse"], 5),
                         "f_rmse": round(st["f_rmse"], 5)}
    print(f"[4] {tag}: {OUT[f'e2e_{tag}']}", flush=True)

print(json.dumps(OUT))
