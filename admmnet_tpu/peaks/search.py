"""Vectorized coarse-to-fine 2-D peak search.

Functional target: reference utils/peakSearchUtils.py:63-173
(``alt_peak_search``) -- coarse grid sweep, 8-neighborhood local maxima,
iterative per-peak window refinement -- re-designed for XLA:

- the coarse sweep is the separable-matmul spectrum (peaks.spectrum), not
  nested Python loops;
- local maxima detection is a 3x3 max-pool equality (lax.reduce_window with
  -inf padding == skimage ``local_maxima(connectivity=2)`` with borders
  allowed, up to plateau handling which is measure-zero for float spectra);
- the data-dependent peak count becomes a fixed ``max_peaks`` top-K with a
  validity mask (padded entries carry height -inf);
- refinement runs a fixed number of rounds of P x P local-grid argmax per
  peak, all peaks and all instances in parallel.  Round r has half-width
  step * reduce_factor^r and spacing 2*half/(P-1); with P >= 1/reduce_factor
  + 1 each round's span covers the previous round's quantization error, so
  the final error is ~ step * reduce_factor^iters -- a proper zoom, unlike
  the reference whose refinement window (peakSearchUtils.py:142-145) only
  spans a tenth of the coarse cell.  Results are sorted by height desc,
  matching the reference contract [tau, f, height] (main.py:113-120).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from admmnet_tpu.core.config import PeakSearchConfig
from admmnet_tpu.ops.atoms import delay_steering, doppler_steering
from admmnet_tpu.peaks.spectrum import spectrum_grid


class PeakResult(NamedTuple):
    tau: jnp.ndarray  # (..., K) delay estimates
    f: jnp.ndarray  # (..., K) doppler estimates
    height: jnp.ndarray  # (..., K) spectrum heights, -inf for padding
    valid: jnp.ndarray  # (..., K) bool


def _coarse_axes(cfg: PeakSearchConfig):
    taus = np.arange(cfg.delay_min, cfg.delay_max, cfg.delay_step, dtype=np.float32)
    # exclude the aliasing endpoint tau = delay_max (= delay_min mod 1)
    if taus.size and abs((taus[-1] - cfg.delay_min) % 1.0) < 1e-9:
        taus = taus[:-1]
    fs = np.arange(cfg.doppler_min, cfg.doppler_max, cfg.doppler_step, dtype=np.float32)
    return taus, fs


def _local_max_mask(Z: jnp.ndarray) -> jnp.ndarray:
    """8-neighborhood local maxima of (..., ny, nx), borders allowed."""
    pooled = lax.reduce_window(
        Z,
        -jnp.inf,
        lax.max,
        window_dimensions=(1,) * (Z.ndim - 2) + (3, 3),
        window_strides=(1,) * Z.ndim,
        padding="SAME",
    )
    return Z >= pooled


def _refine(phi, tau0, f0, cfg: PeakSearchConfig, Nb: int, Nd: int):
    """Fixed-round local zoom.  phi: (B, n); tau0/f0: (B, K)."""
    P = cfg.refine_points
    prec = (
        jax.lax.Precision.HIGHEST
        if cfg.refine_precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    Phi = jnp.conj(phi).reshape(phi.shape[0], Nb, Nd)
    rel = jnp.linspace(-1.0, 1.0, P, dtype=jnp.float32)

    tau, f = tau0, f0
    height = None
    half_t = cfg.delay_step
    half_f = cfg.doppler_step
    for _ in range(cfg.refine_iters):
        taus = jnp.clip(
            tau[..., None] + half_t * rel, cfg.delay_min, cfg.delay_max - 1e-6
        )  # (B, K, P)
        fs = jnp.clip(
            f[..., None] + half_f * rel, cfg.doppler_min, cfg.doppler_max - 1e-6
        )
        S = doppler_steering(fs, Nb)  # (B, K, P, Nb)
        Dc = jnp.conj(delay_steering(taus, Nd))  # (B, K, P, Nd)
        Zl = jnp.abs(jnp.einsum("bzpm,bmk,bzqk->bzpq", S, Phi, Dc,
                                 precision=prec)) ** 2
        flat = Zl.reshape(*Zl.shape[:-2], P * P)
        idx = jnp.argmax(flat, axis=-1)
        height = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
        f = jnp.take_along_axis(fs, (idx // P)[..., None], axis=-1)[..., 0]
        tau = jnp.take_along_axis(taus, (idx % P)[..., None], axis=-1)[..., 0]
        half_t *= cfg.reduce_factor
        half_f *= cfg.reduce_factor
    return tau, f, height


def find_peaks(
    phi: jnp.ndarray,
    Nb: int,
    Nd: int,
    cfg: PeakSearchConfig = PeakSearchConfig(),
) -> PeakResult:
    """Coarse-to-fine peak search on batched phi (..., Nb*Nd).

    Returns PeakResult with K = cfg.max_peaks entries per instance, sorted by
    height descending; invalid (padding) entries have height -inf.
    """
    batch_shape = phi.shape[:-1]
    phi2 = phi.reshape(-1, phi.shape[-1])
    B = phi2.shape[0]
    K = cfg.max_peaks

    taus_ax, fs_ax = _coarse_axes(cfg)
    nx, ny = taus_ax.size, fs_ax.size
    Z = spectrum_grid(phi2, taus_ax, fs_ax, Nb, Nd)  # (B, ny, nx)
    mask = _local_max_mask(Z)
    scores = jnp.where(mask, Z, -jnp.inf).reshape(B, ny * nx)
    vals, idx = lax.top_k(scores, K)
    valid = jnp.isfinite(vals)
    tau0 = jnp.asarray(taus_ax)[idx % nx]
    f0 = jnp.asarray(fs_ax)[idx // nx]
    # park invalid slots at the domain origin; they keep height -inf
    tau0 = jnp.where(valid, tau0, cfg.delay_min)
    f0 = jnp.where(valid, f0, cfg.doppler_min)

    tau_r, f_r, h_r = _refine(phi2, tau0, f0, cfg, Nb, Nd)
    h_r = jnp.where(valid, h_r, -jnp.inf)

    order = jnp.argsort(-h_r, axis=-1)
    tau_r = jnp.take_along_axis(tau_r, order, axis=-1)
    f_r = jnp.take_along_axis(f_r, order, axis=-1)
    h_r = jnp.take_along_axis(h_r, order, axis=-1)
    valid = jnp.take_along_axis(valid, order, axis=-1)

    return PeakResult(
        tau=tau_r.reshape(*batch_shape, K),
        f=f_r.reshape(*batch_shape, K),
        height=h_r.reshape(*batch_shape, K),
        valid=valid.reshape(*batch_shape, K),
    )
