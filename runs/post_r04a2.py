"""Fallback variant of post_r04a with CHEAPER conservative programs, for a
slow-compile day: the 16/8-deep full-schedule kernels compile into very
large Mosaic programs; 8/5 depths with the full schedule + HIGHEST finals
still contract the prox far harder than the production sched2 + 3/2 point,
which is all hypothesis (b) needs (divergence scaling with schedule
looseness vs a layout-invariant break).

Sections: A' conservative(8/5) lean-vs-lists; B production lean-vs-lists +
NMSE vs eigh; C exact-pin reconciliation at qB=8 vs B=2048 (chunked);
skip D (transfer timing) if the session is tight.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/post_r04a2.py
"""
import json
import time

import numpy as np

from admmnet_tpu.core.config import ADMMOptions
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.kernels.fused_admm_fast import admm_solve_fused_fast
from admmnet_tpu.ops.projections import POLAR_BF16_SCHED2
from admmnet_tpu.peaks import scale_invariant_nmse
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils.host import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

OUT = {}
y64, b64, s64 = make_anchor_batch(64, mode="redemod", seed=0)


def run_fused(layout, conservative):
    kw = (dict(outer_iters=8, inner_iters=5, final_hi=True)
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


t0 = time.time()
lean_c, lists_c = run_fused("lean", True), run_fused("lists", True)
r = rel_err(lean_c, lists_c)
OUT["conservative85_lean_vs_lists"] = {
    "rel_err_max": float(f"{r.max():.3e}"),
    "rel_err_mean": float(f"{r.mean():.3e}")}
print(f"[A' {time.time()-t0:.0f}s] {OUT['conservative85_lean_vs_lists']}",
      flush=True)

t0 = time.time()
lean_p, lists_p = run_fused("lean", False), run_fused("lists", False)
r = rel_err(lean_p, lists_p)
OUT["prod_lean_vs_lists"] = {"rel_err_max": float(f"{r.max():.3e}"),
                             "rel_err_mean": float(f"{r.mean():.3e}")}
eigh_fn = cjit(lambda y, b, s: admm_solve_fixed(
    y, b, s, 100, 1.0, ADMMOptions(g_update="eigh")))
phi_eigh64 = device_retry(lambda: to_host(eigh_fn(y64, b64, s64)))()
OUT["prod_nmse_vs_eigh"] = {
    "lean": float(f"{float(scale_invariant_nmse(lean_p, phi_eigh64)):.3e}"),
    "lists": float(f"{float(scale_invariant_nmse(lists_p, phi_eigh64)):.3e}"),
}
print(f"[B {time.time()-t0:.0f}s] prod {OUT['prod_lean_vs_lists']} | "
      f"NMSE {OUT['prod_nmse_vs_eigh']}", flush=True)

t0 = time.time()
B_FULL, CHUNK = 2048, 512
yF, bF, sF = make_anchor_batch(B_FULL, mode="redemod", seed=0)
polar_fn = cjit(lambda y, b, s: admm_solve_fixed(
    y, b, s, 100, 1.0, ADMMOptions(g_update="polar")))
pp, pe = [], []
for i in range(0, B_FULL, CHUNK):
    sl = slice(i, i + CHUNK)
    pp.append(device_retry(
        lambda sl=sl: to_host(polar_fn(yF[sl], bF[sl], sF[sl])))())
    pe.append(device_retry(
        lambda sl=sl: to_host(eigh_fn(yF[sl], bF[sl], sF[sl])))())
    print(f"  [C] chunk {i // CHUNK + 1} ({time.time()-t0:.0f}s)", flush=True)
phi_p, phi_e = np.concatenate(pp), np.concatenate(pe)
per_inst = np.array([scale_invariant_nmse(phi_p[i], phi_e[i])
                     for i in range(B_FULL)])
OUT["exact_nmse_pin"] = {
    "qB8_aggregate": float(f"{scale_invariant_nmse(phi_p[:8], phi_e[:8]):.3e}"),
    "B2048_aggregate": float(f"{scale_invariant_nmse(phi_p, phi_e):.3e}"),
    "B2048_per_instance_mean": float(f"{per_inst.mean():.3e}"),
    "B2048_per_instance_median": float(f"{np.median(per_inst):.3e}"),
    "B2048_per_instance_p99": float(f"{np.percentile(per_inst, 99):.3e}"),
    "B2048_per_instance_max": float(f"{per_inst.max():.3e}"),
}
print(f"[C {time.time()-t0:.0f}s] {OUT['exact_nmse_pin']}", flush=True)

print(json.dumps(OUT))
with open("results/r04/post_r04a.json", "w") as f:
    json.dump(OUT, f, indent=2)
