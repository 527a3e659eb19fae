"""Scaling-efficiency harness: instance-throughput vs device count.

The north-star protocol (BASELINE.md): ADMM iterations/s per chip at 1 chip /
1 host / >=2 hosts, with >=95% per-chip scaling efficiency on 10k batched
instances.  The workload is embarrassingly parallel over instances (zero
cross-device communication in the solve), so scaling is bounded only by
dispatch overheads; this harness measures it directly on whatever devices are
visible (real TPU chips, or the virtual CPU mesh in CI).

Timing uses a scalar host fetch as the completion barrier
(block_until_ready is unreliable on the tunnel backend).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import numpy as np

from admmnet_tpu.core.config import ADMMOptions


def measure_throughput(
    n_devices: int,
    batch_per_device: int = 512,
    iters: int = 20,
    opts: Optional[ADMMOptions] = None,
    repeats: int = 2,
    seed: int = 0,
) -> float:
    """Instance-iterations/s of the batched solve over an n-device mesh."""
    import jax.numpy as jnp

    from admmnet_tpu.data.anchor import make_anchor_batch
    from admmnet_tpu.parallel import data_mesh
    from admmnet_tpu.solver import admm_solve_fixed
    from admmnet_tpu.utils.host import cjit

    from jax.sharding import NamedSharding, PartitionSpec as P

    opts = opts or ADMMOptions(g_update="polar")
    B = batch_per_device * n_devices
    y, b, sigma = make_anchor_batch(B, mode="redemod", seed=seed)
    mesh = data_mesh(n_devices)

    fn = cjit(
        lambda y, b, s: jnp.sum(
            jnp.abs(admm_solve_fixed(y, b, s, iters, 1.0, opts))
        ),
        in_shardings=NamedSharding(mesh, P("data")),
    )
    float(fn(y, b, sigma))  # compile
    best = np.inf
    for _ in range(repeats):
        t0 = time.time()
        float(fn(y, b, sigma))
        best = min(best, time.time() - t0)
    return B * iters / best


def scaling_report(
    device_counts: Sequence[int],
    batch_per_device: int = 512,
    iters: int = 20,
    opts: Optional[ADMMOptions] = None,
) -> List[dict]:
    """Throughput + per-chip efficiency table across device counts."""
    rows = []
    base = None
    for n in device_counts:
        tput = measure_throughput(n, batch_per_device, iters, opts)
        if base is None:
            base = tput / device_counts[0]
        rows.append(
            {
                "devices": n,
                "throughput_iters_per_s": tput,
                "per_device": tput / n,
                "efficiency": tput / (n * base),
            }
        )
    return rows
