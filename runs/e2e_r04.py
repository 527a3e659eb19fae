"""Round-4 e2e deployment number: full learned pipeline (observation ->
(tau, f, conf) peak list) with the fused Clenshaw trunk engine.

The rounds-2/3 row: 0.810 ms/scene (1,234 scenes/s) with the XLA
chebyshev GLayer.  The pallas engine cut the trunk forward 8.1x
(results/r04/net_r04.json); this measures the whole deployed pipeline
(trunk + spectrum peak head) with the spec50k checkpoint, device-resident.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/e2e_r04.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import ModelConfig, ProblemSpec
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.models import ADMMNet
from admmnet_tpu.train.checkpoint import restore_checkpoint
from admmnet_tpu.utils.host import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

OUT = {}
B = 2048
y, b, s = make_anchor_batch(B, mode="redemod", seed=0)
_stage = cjit(lambda yy, bb, ss: (yy * 1.0, bb * 1.0, ss * 1.0))
y, b, s = _stage(y, b, s)

for impl in ("xla", "pallas"):
    mcfg = ModelConfig(spec=ProblemSpec(), num_layers=10, g_mode="chebyshev",
                      head="spectrum", cheb_impl=impl)
    model = ADMMNet(cfg=mcfg)
    p0 = cjit(lambda k, yy, bb, ss: model.init(k, yy, bb, ss))(
        jax.random.PRNGKey(0), y[:2], b[:2], s[:2])
    restored = restore_checkpoint("runs/spec50k", {"params": p0,
                                                   "opt_state": None})
    params = restored[0]["params"]

    def run(yy, bb, ss, m=model, p=params):
        tau, f, conf, _phi = m.apply(p, yy, bb, ss)
        return jnp.sum(tau) + jnp.sum(f) + jnp.sum(conf)

    fn = cjit(run)
    fetch = device_retry(lambda fn=fn: float(fn(y, b, s)),
                         attempts=2, cooldown_s=60)
    t0 = time.time()
    fetch()
    comp = time.time() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        fetch()
        best = min(best, time.time() - t0)
    OUT[f"e2e_{impl}"] = {
        "s_per_2048_scenes": round(best, 4),
        "ms_per_scene": round(best / B * 1e3, 4),
        "scenes_per_s": round(B / best, 1),
        "compile_s": round(comp, 1),
    }
    print(f"e2e {impl}: {OUT[f'e2e_{impl}']}", flush=True)

print(json.dumps(OUT))
with open("results/r04/e2e_r04.json", "w") as f:
    json.dump(OUT, f, indent=2)
