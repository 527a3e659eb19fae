"""Projection correctness: feasibility, variational-inequality optimality,
and a scipy SLSQP oracle for the ECOS-replacement constraint projection."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from admmnet_tpu.ops import projections as proj


def _f(h, A):
    return A * np.max(np.abs(h)) + np.sum(h)


def test_l1_ball_projection_against_sort_oracle():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(8, 30)) * 3
    r = np.abs(rng.normal(size=(8,))) * 2 + 0.1
    got = np.asarray(proj.project_l1_ball(jnp.asarray(v, jnp.float32), jnp.asarray(r, jnp.float32)))
    for i in range(8):
        # sort-based exact oracle
        if np.sum(np.abs(v[i])) <= r[i]:
            want = v[i]
        else:
            u = np.sort(np.abs(v[i]))[::-1]
            css = np.cumsum(u)
            k = np.nonzero(u * np.arange(1, len(u) + 1) > (css - r[i]))[0][-1]
            tau = (css[k] - r[i]) / (k + 1.0)
            want = np.sign(v[i]) * np.maximum(np.abs(v[i]) - tau, 0)
        np.testing.assert_allclose(got[i], want, atol=2e-4)


def test_sum_inf_projection_feasible_and_optimal():
    rng = np.random.default_rng(2)
    n = 40
    t = rng.normal(size=(16, n)).astype(np.float32) * 2
    A = (np.abs(rng.normal(size=(16,))) * 50 + 1).astype(np.float32)
    h = np.asarray(proj.project_sum_inf(jnp.asarray(t), jnp.asarray(A)))
    for i in range(16):
        assert _f(h[i], A[i]) <= 1.0 + 1e-3
        # variational inequality: <t - h, x - h> <= 0 for all feasible x
        for _ in range(50):
            x = rng.normal(size=n)
            fx = _f(x, A[i])
            if fx > 1:  # shrink into the set (0 is interior, f(0)=0)
                x = x * (0.95 / fx)
            ip = np.dot(t[i] - h[i], x - h[i])
            assert ip <= 1e-3 * (1 + np.linalg.norm(t[i])), ip


def test_sum_inf_projection_matches_slsqp_oracle():
    rng = np.random.default_rng(3)
    n = 20
    for trial in range(5):
        t = rng.normal(size=n) * 1.5
        A = 44.0 if trial % 2 == 0 else 3.0  # 44 ~ 2*sqrt(100)*2+4 regime
        got = np.asarray(
            proj.project_sum_inf(jnp.asarray(t, jnp.float32), jnp.float32(A))
        )
        # Smooth epigraph QP: variables (h, m); |h_i| <= m; A*m + sum(h) <= 1.
        def obj(x):
            return 0.5 * np.sum((x[:n] - t) ** 2)

        def jac(x):
            g = np.zeros(n + 1)
            g[:n] = x[:n] - t
            return g

        from scipy.optimize import LinearConstraint

        I = np.eye(n)
        ones = np.ones((n, 1))
        # m - h_i >= 0 ; m + h_i >= 0 ; 1 - A*m - sum(h) >= 0
        Amat = np.vstack(
            [
                np.hstack([-I, ones]),
                np.hstack([I, ones]),
                np.hstack([-np.ones((1, n)), -A * np.ones((1, 1))]),
            ]
        )
        cons = LinearConstraint(
            Amat,
            np.concatenate([np.zeros(2 * n), [-1.0]]),
            np.full(2 * n + 1, np.inf),
        )
        x0 = np.zeros(n + 1)
        res = minimize(
            obj, x0, jac=jac, constraints=[cons], method="trust-constr",
            options={"maxiter": 3000, "gtol": 1e-12, "xtol": 1e-14},
        )
        assert res.status in (1, 2), res.message
        # objective values must agree (minimizer unique by strong convexity)
        f_got = 0.5 * np.sum((got - t) ** 2)
        f_ref = res.fun
        assert f_got <= f_ref + 1e-3 * (1 + f_ref), (f_got, f_ref)
        np.testing.assert_allclose(got, res.x[:n], atol=1e-2)


def test_sum_inf_projection_identity_inside_set():
    t = np.full(10, 0.005, dtype=np.float32)  # f = A*0.005 + 0.05 small
    got = np.asarray(proj.project_sum_inf(jnp.asarray(t), jnp.float32(2.0)))
    np.testing.assert_allclose(got, t, atol=1e-6)


def test_sum_inf_projection_of_zero_is_zero():
    """The reference solver feeds t=0 on its degenerate path; proj(0)=0."""
    t = np.zeros((3, 12), dtype=np.float32)
    got = np.asarray(proj.project_sum_inf(jnp.asarray(t), jnp.float32(44.6)))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def _rand_hermitian(rng, m, batch=()):
    X = rng.normal(size=(*batch, m, m)) + 1j * rng.normal(size=(*batch, m, m))
    return ((X + np.conj(np.swapaxes(X, -1, -2))) / 2).astype(np.complex64)


def test_psd_project_eigh_matches_numpy_clamp():
    rng = np.random.default_rng(4)
    M = _rand_hermitian(rng, 21, (5,))
    got = np.asarray(proj.psd_project_eigh(jnp.asarray(M)))
    w, V = np.linalg.eigh(M)
    want = (V * np.maximum(w, 0)[..., None, :]) @ np.conj(np.swapaxes(V, -1, -2))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # PSD check
    wg = np.linalg.eigvalsh(got)
    assert wg.min() > -1e-4


def test_psd_project_newton_schulz_close_to_exact():
    rng = np.random.default_rng(5)
    M = _rand_hermitian(rng, 33, (4,))
    exact = np.asarray(proj.psd_project_eigh(jnp.asarray(M)))
    approx = np.asarray(proj.psd_project_newton_schulz(jnp.asarray(M), iters=30))
    # relative Frobenius error small
    err = np.linalg.norm(approx - exact, axis=(-1, -2)) / np.linalg.norm(
        exact, axis=(-1, -2)
    )
    assert err.max() < 0.06, err
