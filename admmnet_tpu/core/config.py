"""Typed configuration for the framework.

The reference keeps every knob in hardcoded dict literals (reference
train.py:17-39, admm.py:36-45, utils/peakSearchUtils.py:84-93).  Here the same
knob set is preserved as frozen dataclasses so configs are hashable (usable as
jit static args), serializable, and CLI-overridable.

Axis-naming convention (kills the xbase/ybase swap class of bug in the
reference, see reference main.py:95 vs main.py:103-105):

- ``delay`` axis: tau in [0, 1), resolved by the ``Nd`` within-block symbol
  axis; atom factor ``d(tau) = exp(2j pi tau * [0..Nd-1])``.
- ``doppler`` axis: f in [-0.5, 0.5), resolved by the ``Nb`` OFDM-block axis;
  atom factor ``s(f) = exp(2j pi f * [0..Nb-1])``.
- flattened atom: ``a(tau, f) = kron(s(f), conj(d(tau)))`` with layout index
  ``m * Nd + k`` (m = block, k = symbol), matching the reference's
  ``kr(S, conj(D))`` column layout (reference main.py:29,
  utils/peakSearchUtils.py:27-31).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ProblemSpec:
    """Dimensions of one recovery instance (reference main.py:11-17)."""

    Nb: int = 10  # number of OFDM blocks (doppler axis length)
    Nd: int = 10  # data symbols per block (delay axis length)
    L_max: int = 3  # maximum number of targets

    @property
    def n(self) -> int:
        """Flattened problem size MN = Nb * Nd."""
        return self.Nb * self.Nd

    @property
    def lifted(self) -> int:
        """Side of the lifted PSD matrix G: MN + 1 (reference admm.py:54)."""
        return self.n + 1


@dataclasses.dataclass(frozen=True)
class ADMMOptions:
    """Classical-solver knobs (reference admm.py:6,36-45).

    ``phi_update`` selects between the intended diagonal phi-update
    (what the learned PhiLayer implements, reference admm_net.py:94-103) and
    ``"ref_dense"`` which reproduces the reference's broadcasting quirk at
    admm.py:78 where ``inv(diag(|b|^2)) + rho*ones(n)`` adds rho to every
    matrix entry, i.e. solves with ``D^{-1} + rho*11^T`` instead of
    ``D^{-1} + rho*I`` (handled closed-form via Sherman-Morrison here).

    ``g_update`` selects the PSD step: ``"polar"`` (default for throughput
    paths) is a matmul-only minimax quintic matrix-sign schedule (see
    ops.projections.POLAR_QUINTIC_SCHEDULE); ``"eigh"`` is the true projection onto
    the PSD cone (eigendecompose, clamp negative eigenvalues; what the learned
    GLayer does, reference admm_net.py:303-334); ``"newton_schulz"`` is a
    matmul-only (MXU-friendly) approximation via the matrix-sign Newton-Schulz
    iteration; ``"ref_identity"`` reproduces the reference's admm.py:151-179
    SVD step, which on a Hermitian input is the identity map (singular values
    of a Hermitian matrix are |eigenvalues|, so zeroing negatives is a no-op).
    """

    rho: float = 1.0
    max_iter: int = 100
    eta_abs: float = 1e-7
    eta_rel: float = 1e-7
    use_min_iter: bool = True
    min_iter: int = 5
    phi_update: str = "diag"  # "diag" | "ref_dense"
    g_update: str = "eigh"  # "eigh" | "polar" | "polar_fast" | "newton_schulz" | "ref_identity"
    newton_schulz_iters: int = 24
    # polar_fast only: 0 = all-bf16 schedule (fastest), 1 = append the
    # HIGHEST polish step (tighter eigenvalue band per projection)
    polar_fast_hi_steps: int = 0
    # polar_fast only: store the sign iterate in bf16 between schedule steps.
    # Measured negative result (RESULTS.md 3.5): the isolated projection
    # looks faster under a noisy microbench, but the full solve is ~3%
    # SLOWER (110.8k -> 107.7k iter/s, repeats=4) and phi NMSE vs eigh
    # doubles (1.1e-1 -> 2.1e-1).  Kept as a knob for larger tile sizes
    # where VPU traffic could genuinely dominate.
    polar_bf16_store: bool = False
    # fused_fast only (kernels/fused_admm_fast.py: whole fixed-iteration
    # solve in one Pallas call).  Defaults are the round-4 production
    # point -- 1,131,309 inst-iter/s at B=8192 x 100, device-resident
    # (5954x the reference), gated on anchor detection (F1 1.0) and
    # random-SNR scenes vs the exact-eigh control (RESULTS.md 3.7) --
    # reached by accuracy-for-speed trades the outer ADMM provably
    # tolerates (each gate-checked independently, see RESULTS.md 3.5):
    #   fused_schedule: PSD sign-polynomial schedule.  "full" = the 6-step
    #     POLAR_BF16_SCHEDULE (polar_fast parity, phi NMSE vs eigh ~7e-2);
    #     "sched3"/"sched2" = shortened refits at larger eigenvalue
    #     write-off (ops/projections.py).  "sched2" measured the same phi
    #     NMSE band (~8e-2) and detection as "full" at 2/3 the matmuls.
    #     1-step schedules FAIL the gates (anchor F1 0.875-0.995, random
    #     0.60-0.85) -- sched2 is the measured quality cliff edge.
    #   fused_final_hi: run the closing |M| products at HIGHEST (~6 MXU
    #     passes per matmul vs 1).  Off: one-pass noise ~4e-3 is far below
    #     the schedule write-off; measured free on all gates.
    #   fused_proj_iters / fused_inner_iters: root-finder depths of the
    #     in-kernel H-projection (outer = bisection on the constraint
    #     multiplier, inner = monotone Newton on the prox waterline; see
    #     the kernel docstring for rejected faster root-finders).  Depth
    #     ladder 16/8 -> 6/5 -> 4/3 -> 3/2 measured flat on every quality
    #     gate (3/2 re-gated on hardware for the round-3 defaults:
    #     anchor F1 1.0, 512 random-SNR scenes F1 == the exact-eigh
    #     control bit-for-bit, results/r03/sweep_gate.json).
    # kblk>16 needs (and gets) a raised Mosaic scoped-VMEM limit.  The
    # round-2 LIST layout measured K=16 best (its assembly glue scaled
    # with K); the round-3 LEAN layout's remaining serial per-program
    # costs (root-finder, diag extraction -- runs/profile_lean.py) halve
    # with doubled interleave, moving the knee: same-day B=8192 grid
    # K16/4-3 641.8k, K24/3-2 675.7k, K32/4-3 657.0k, **K32/3-2 768.7k**
    # inst-iter/s (+19.8% over the round-2 defaults measured the same
    # session; results/r03/sweep_gate.json + sweep_k16.json).
    # Round-4 production point: K=32 + warm-rooted 2-step outer bisection +
    # folded plane reads (fused_warm_root/fused_fold_diag below).
    # Same-session B=8192 device-resident grid (results/r04/sweep_r04.json +
    # gate_r04.json): k32_3_2 1,083,720 -> k32_2_2_wf **1,128,088 (+4.1%)**
    # with anchor F1 1.0, 512 random-SNR scenes F1 0.8639 vs the exact-eigh
    # control's 0.8646 (1-2 detections, inside the chaotic-trajectory band
    # of RESULTS 3.4), and anchor phi NMSE vs eigh 12x TIGHTER than the
    # round-3 point (0.060 vs 0.774 -- the warm bracket is asymptotically
    # tighter than the cold 3-step bisection).  The faster 1-bisection
    # variant (1,154,584) FAILS detection (anchor 0.958, random 0.8522)
    # and is excluded; K=48/64 do not beat K=32.
    # COUPLING (ADVICE r4): the 2-step outer depth is gate-certified only
    # JOINTLY with fused_warm_root=True (the warm bracket is what makes 2
    # bisections asymptotically tighter than the cold 3-step; sweep_r04's
    # shallow-cold variants were never gated).  If you disable
    # fused_warm_root, raise fused_proj_iters to >= 3 (the round-3
    # certified cold point) or re-gate on >= 512 random-SNR scenes.
    fused_kblk: int = 32
    fused_proj_iters: int = 2
    fused_inner_iters: int = 2
    fused_schedule: str = "sched2"  # "full" | "sched3" | "sched2"
    fused_final_hi: bool = False
    # fused_fast kernel layout: "lean" (production; B never materialized,
    # one phi transpose, no re-symmetrization) or "lists" (the validated
    # first layout, kept reachable as an escape hatch should a
    # hardware-only divergence surface in the lean invariants).
    fused_layout: str = "lean"
    # fori_loop unroll factor of the lean kernel's iteration loop.  NOTE
    # (measured round 5): Mosaic's fori_loop supports only unroll=1 or a
    # FULL unroll (=num_iters), and full unrolls of plane-heavy bodies
    # blow scoped VMEM (the cheb backward's 47-step unroll wanted 216+ MB
    # against the 128 MB chip); 1 is the only usable setting on current
    # Mosaic -- the knob is kept for future toolchain versions.  K=40 was
    # also probed and is flat vs K=32 (+0.05%, within noise).
    fused_unroll: int = 1
    # Round-4 lean-kernel rungs (kernels/fused_admm_fast.py; the two levers
    # the round-3 profile named: root-finder 30% + diag extraction 13% of
    # the K=16 iteration, runs/profile_lean.py):
    #   fused_fold_diag: extract the next iteration's plane reads (diag of
    #     G+Z/rho, corner rows of rho G+Z) from the symmetrized |M| product
    #     inside the PSD finals while it is in registers -- the G planes
    #     then leave the carry entirely (Z' and both reads are functions
    #     of A and M).
    #   fused_warm_root: carry the H-projection's outer-bisection bracket
    #     across ADMM iterations (the multiplier root drifts slowly as the
    #     iterates converge); each iteration re-clamps, bisects
    #     fused_proj_iters times, and re-widens with a 5%-of-hi floor so a
    #     drifted root is re-acquired geometrically.  Lets proj_iters run
    #     at 2 with asymptotically TIGHTER brackets than the cold 3-step.
    fused_fold_diag: bool = True
    fused_warm_root: bool = True
    # g_update="fused_exact" only (round 5, VERDICT r4 missing-2: the fast
    # phi-exact mode).  Whole-solve fused kernel running an all-HIGHEST
    # minimax quintic schedule -- the phi-faithful contract of the per-step
    # "polar" mode (reference trainPhi.py:89-94) with the XLA
    # inter-iteration glue removed.  Measured ladder (B=2048 x 100
    # device-resident, phi NMSE vs the same-instance eigh solve,
    # results/r05/exact_r05.json + exact3p_r05.json):
    #   polar per-step (round-4 exact mode)    67.0k iter/s, NMSE 1.60e-6
    #   quintic7 + cold 16/8, HIGHEST         101.0k iter/s, NMSE 1.84e-6
    #   quintic7 + warm 10/8, HIGHEST         102.9k iter/s, NMSE 1.23e-5
    #   quintic5 + cold 16/8, HIGHEST         134.3k iter/s, NMSE 1.9e-3
    #   quintic7 + cold 16/8, 3-pass (DEFAULT) 173.6k iter/s, NMSE 2.19e-6
    # The warm bracket's 5%-of-hi re-widening floor costs 7x NMSE for +2%
    # speed, and the shortened l0=1e-2 schedule fails the contract by 200x
    # (phi NMSE scales like (schedule weighted error)^~2.7) -- both
    # excluded.  The default runs the kernel's hand-rolled 3-pass
    # split-bf16 matmuls (fused_exact_three_pass: XLA's BF16_3X tier,
    # which Mosaic does not expose natively): half the MXU passes of
    # HIGHEST at a measured NMSE cost of only 1.84e-6 -> 2.19e-6, i.e.
    # the solve's accuracy is schedule-limited, not matmul-noise-limited,
    # down to the 3-pass tier.  2.59x the round-4 exact mode.
    fused_exact_schedule: str = "quintic7"  # "quintic5" | "quintic7"
    fused_exact_proj_iters: int = 16
    fused_exact_inner_iters: int = 8
    fused_exact_warm_root: bool = False
    fused_exact_three_pass: bool = True

    def __post_init__(self):
        if self.phi_update not in ("diag", "ref_dense"):
            raise ValueError(f"unknown phi_update {self.phi_update!r}")
        if self.g_update not in ("eigh", "polar", "polar_fast", "fused_fast",
                                 "fused_exact", "newton_schulz",
                                 "ref_identity"):
            raise ValueError(f"unknown g_update {self.g_update!r}")
        if self.fused_exact_schedule not in ("quintic5", "quintic7"):
            raise ValueError(
                f"unknown fused_exact_schedule {self.fused_exact_schedule!r}"
            )
        if self.fused_schedule not in ("full", "sched3", "sched2"):
            raise ValueError(f"unknown fused_schedule {self.fused_schedule!r}")
        if self.fused_layout not in ("lean", "lists"):
            raise ValueError(f"unknown fused_layout {self.fused_layout!r}")


@dataclasses.dataclass(frozen=True)
class PeakSearchConfig:
    """Coarse-to-fine 2-D spectral peak search knobs.

    Mirrors reference utils/peakSearchUtils.py:84-93 defaults.  ``max_peaks``
    is new: batched TPU search returns a fixed number of candidate peaks
    (sorted by height, padded with -inf) instead of a data-dependent count.

    The refinement here zooms properly: round r scans a ``refine_points``^2
    window spanning +-step_{r-1} at spacing step_r = reducefactor * step_{r-1}
    around the current estimate.  (The reference's window at
    peakSearchUtils.py:142-145 only spans +-step_r -- a tenth of the coarse
    cell -- so its refinement cannot leave the coarse grid cell; ours strictly
    dominates it in accuracy.)
    """

    delay_min: float = 0.0
    delay_max: float = 1.0
    delay_step: float = 0.01
    doppler_min: float = -0.5
    doppler_max: float = 0.5
    doppler_step: float = 0.01
    reduce_factor: float = 0.1
    refine_iters: int = 3
    refine_points: int = 11  # points per axis per refinement round
    max_peaks: int = 16
    # Matmul precision of the REFINE einsums ("highest" | "default").  The
    # round-5 decomposition (results/r05/e2e_decompose_r05.json) showed the
    # 3-round refine stage is the entire non-solve cost of the classical
    # deployment pipeline (~0.017 ms/scene of 0.115) while the coarse
    # NUDFT + top-K are free; the refine einsums are tiny per-peak
    # contractions where one-pass bf16 noise (~4e-3 relative on spectrum
    # values) only has to preserve an 11x11 argmax.  Gated before becoming
    # the production default (see runs/e2e_r05b.py).
    refine_precision: str = "highest"

    def __post_init__(self):
        if self.refine_precision not in ("highest", "default"):
            raise ValueError(
                f"unknown refine_precision {self.refine_precision!r}"
            )
        # zoom-coverage invariant (class docstring): each round's span must
        # cover the previous round's quantization error
        if self.refine_points < 1.0 / self.reduce_factor + 1.0 - 1e-9:
            raise ValueError(
                f"refine_points {self.refine_points} < 1/reduce_factor + 1 "
                f"({1.0 / self.reduce_factor + 1.0:g}): the refinement zoom "
                "cannot cover the previous round's quantization error"
            )


# Round-5 gated deployment point for the classical pipeline
# (results/r05/budget_r05.json + e2e_refine_r05.json, VERDICT r4 missing-1/4):
#
# - DETECTION_BUDGET_ITERS: fixed solve budget for detection-only
#   deployments.  The 512-scene random-SNR gate (PRNGKey 42, SNR 5-25 dB) is
#   FLAT in the budget from 1 to 100 iterations at every match tolerance
#   (0.05/0.02/0.01) -- the distribution's detection task saturates at the
#   matched-filter initialization, so the budget choice is certificate-
#   driven: 10 is the eta=5e-2 adaptive-convergence crossing measured in
#   round 3 (RESULTS 1.5: every anchor instance residual-converged at 10),
#   i.e. the smallest budget that is a *solve*, not just a periodogram.
#   Detection at 10: random F1 0.8639 == the exact-eigh-100 control, anchor
#   F1 1.0.  NOT for phi-faithful work (phi at 10 iterations is far from
#   the fixed point; use the full budget + polar/eigh modes).
# - PRODUCTION_PEAKS: the gated peak-search deployment config -- 2 refine
#   rounds (final quantization ~6e-5 << the solver's 0.003 tau RMSE) at
#   one-pass DEFAULT refine precision (the einsums only preserve an 11x11
#   argmax); anchor F1 1.0 / random-512 F1 within 0.0013 of the
#   3-round-HIGHEST control (chaotic band).
DETECTION_BUDGET_ITERS = 10

PRODUCTION_PEAKS = PeakSearchConfig(
    max_peaks=8, refine_iters=2, refine_precision="default"
)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Synthetic OFDM-ISAC dataset knobs (reference generate_data.py:15-44)."""

    spec: ProblemSpec = ProblemSpec()
    tau_range: Tuple[float, float] = (0.1, 0.9)
    f_range: Tuple[float, float] = (-0.4, 0.4)
    gain_std: float = 0.7  # complex reflection coeff ~ N(0, 0.7^2) per part
    snr_range: Tuple[float, float] = (5.0, 25.0)  # environment SNR_w in dB
    snr_demod: float = 7.0  # demodulation SNR_e in dB
    psk_order: int = 4  # QPSK
    train_ratio: float = 0.7
    val_ratio: float = 0.15


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Unrolled ADMM-Net architecture (reference admm_net.py:724-816)."""

    spec: ProblemSpec = ProblemSpec()
    num_layers: int = 10
    hidden_dim: int = 128
    num_heads: int = 4
    correction_hidden: int = 64  # HLayer MLP width (reference admm_net.py:127)
    value_net_hidden: int = 16  # GLayer eigenvalue MLP (reference admm_net.py:230)
    scale_net_hidden: int = 32  # ZLayer step MLP (reference admm_net.py:373)
    with_peak_head: bool = True
    epsilon: float = 1e-8
    # Reproduce the reference's accidental stop-gradients (.item() calls at
    # admm_net.py:271,426,458 and the eigenvector detach at :306).  Kept as a
    # flag so the effect can be ablated.
    ref_stop_gradients: bool = True
    # Optional learned sensing/measurement matrix (north-star config #5).
    # NOTE: the reference's "Phi" in trainPhi.py is the *output* dual
    # polynomial, not a measurement matrix (see SURVEY.md section 0.1); this
    # option is an extension, off by default.
    learned_sensing: bool = False
    # GLayer spectral-filter evaluation: "eigh" (reference parity: eigh with
    # detached eigenvectors) or "chebyshev" (matmul-only matrix function,
    # no eigendecomposition -- see ops/chebyshev.py).
    g_mode: str = "eigh"
    cheb_degree: int = 48
    # Clenshaw matmul precision for g_mode="chebyshev": "highest" (6 MXU
    # passes per f32 matmul) or "default" (ONE bf16 pass + per-step Hermitian
    # re-projection -- the polar-kernel trade; quality-gate before deploying)
    cheb_precision: str = "highest"
    # Clenshaw evaluation engine for g_mode="chebyshev": "xla" (lax.scan of
    # batched matmuls at cheb_precision) or "pallas" (fused one-pass kernel,
    # kernels/cheb_filter.py: K-interleaved instances, VMEM-resident
    # carries, in-register Hermitian re-projection; falls back to the XLA
    # one-pass path off-TPU).  Identical learned-filter math; the engines
    # differ only in matmul precision/scheduling.  Round 5: "pallas" is
    # fully differentiable (custom VJP with a checkpoint-free reversible
    # backward kernel), so it can be used for TRAINING as well as
    # inference -- see kernels/cheb_filter.py and RESULTS 3.10.
    cheb_impl: str = "xla"
    # instances per program for cheb_impl="pallas" (MXU pipeline interleave)
    cheb_kblk: int = 8
    # Peak head for the e2e ADMMNet: "attention" (reference parity,
    # admm_net.py:494-630: direct (tau, f) regression) or "spectrum"
    # (extension: differentiable coarse-to-fine spectral search with a
    # soft-argmax finish -- see models/peak_head.py SpectrumPeakHead).
    head: str = "attention"
    head_grid_step: float = 0.01
    head_refine_rounds: int = 3
    head_refine_points: int = 11
    head_reduce_factor: float = 0.2

    def __post_init__(self):
        # Typo-proofing (ADVICE r4): GLayer dispatches on string equality, so
        # e.g. cheb_impl='Pallas' would silently run the XLA engine and a
        # benchmark/deploy config could measure the wrong engine.
        if self.g_mode not in ("eigh", "chebyshev"):
            raise ValueError(f"unknown g_mode {self.g_mode!r}")
        if self.cheb_impl not in ("xla", "pallas"):
            raise ValueError(f"unknown cheb_impl {self.cheb_impl!r}")
        if self.cheb_precision not in ("highest", "default"):
            raise ValueError(f"unknown cheb_precision {self.cheb_precision!r}")
        if self.head not in ("attention", "spectrum"):
            raise ValueError(f"unknown head {self.head!r}")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-driver knobs (reference train.py:17-39, trainPhi.py:16-38)."""

    batch_size: int = 256
    epochs: int = 100
    lr: float = 1e-3
    admm_lr_scale: float = 0.5  # ADMM-layer params at 0.5x lr (train.py:107-113)
    weight_decay: float = 1e-3
    grad_clip: float = 1.0
    # CosineAnnealingWarmRestarts(T_0=10, T_mult=2, eta_min=1e-6), train.py:126-128
    sgdr_t0: int = 10
    sgdr_t_mult: int = 2
    lr_min: float = 1e-6
    patience: int = 10  # early stop (train.py:133)
    conf_threshold: float = 0.5  # detection threshold for F1 (train.py:384)
    # e2e loss target assignment: "slot" (reference parity) or "perm"
    # (permutation-invariant set matching; see train/losses.py)
    assignment: str = "slot"
    # weight of the spectral contrast term (train/losses.py
    # spectral_contrast_loss); needed to train the trunk under the spectrum
    # peak head, whose argmax positions carry no cross-cell gradient
    spectral_weight: float = 0.0
    # On resume, forget the checkpoint's best_val_loss/patience (keep params
    # + epoch).  Needed for curriculum stage switches: losses are not
    # comparable across datasets, so a harder stage would otherwise never
    # checkpoint and early-stop against the easier stage's best (measured:
    # the round-3 from-scratch SNR-curriculum run runs/spec50k).
    reset_best: bool = False
    seed: int = 0


def to_json(cfg: Any) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def _from_dict(cls, d: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue
        ft = fields[k].type
        if isinstance(v, dict) and "Nb" in v:
            v = ProblemSpec(**v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    return cls(**kwargs)


def from_json(cls, s: str):
    return _from_dict(cls, json.loads(s))
