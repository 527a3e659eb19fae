"""Round-4 learned-sensing evaluation (VERDICT r3 task 1, second half).

Three-way position-matched eval on the rand50k test split (512 scenes):

- sense: runs/spec50k_sense retrained this round with the PROVEN recipe
  (warm-start --init-from runs/spec50k, assignment=perm, spectral 0.5) --
  the round-3 dud (slot assignment, mean-collapsed) is preserved at
  runs/spec50k_sense_failed_slot with a FAILED marker;
- sense_graft_untrained: the spec50k trunk grafted into a learned_sensing
  architecture with the sensing matrix left at its fresh identity init
  (controls for the graft itself);
- identity: runs/spec50k unchanged (no sensing matrix).

The learned-sensing option realizes north-star config #5; NOTE the
reference's "Phi" in trainPhi.py is the OUTPUT dual polynomial, not a
measurement matrix (SURVEY.md 0.1) -- this is the framework's extension.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/post_r04b.py
"""
import json

import numpy as np

import jax

from admmnet_tpu.core.config import ModelConfig, ProblemSpec
from admmnet_tpu.data.generator import DatasetGenerator
from admmnet_tpu.models import ADMMNet
from admmnet_tpu.peaks import match_peaks
from admmnet_tpu.train.checkpoint import restore_checkpoint
from admmnet_tpu.utils.host import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

OUT = {}
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
            print(f"{tag}: NO CHECKPOINT under {ckpt}", flush=True)
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
    print(f"{tag}: {OUT[f'e2e_{tag}']}", flush=True)

print(json.dumps(OUT))
with open("results/r04/post_r04b.json", "w") as fjson:
    json.dump(OUT, fjson, indent=2)
