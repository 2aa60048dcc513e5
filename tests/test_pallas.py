"""Pallas TPU kernel tests (interpreter mode on the CPU test mesh).

Covers ops/dd.py (double-float arithmetic), ops/pallas_chol.py (blocked
factor/solve) and ops/pallas_newton.py (fused Newton-direction kernel)
against float64 references.  On TPU the same kernels compile natively;
these tests pin down the numerics, which are backend-independent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interiorpoint_tpu.ops import dd
from interiorpoint_tpu.ops.pallas_chol import (cholesky_blocked,
                                               cholesky_solve_blocked)
from interiorpoint_tpu.ops.pallas_newton import reduced_newton_dir, supported


def test_dd_split_join_roundtrip():
    # dd keeps ~48 of f64's 52 mantissa bits: relative error < 2^-48
    rng = np.random.default_rng(0)
    x = rng.standard_normal(512) * np.exp(rng.uniform(-10, 10, 512))
    hi, lo = dd.split_f64(jnp.asarray(x))
    rel = np.abs(np.asarray(dd.join_f64(hi, lo)) - x) / np.abs(x)
    assert rel.max() < 2.0**-47


def test_dd_mul_precision():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(1000) * np.exp(rng.uniform(-8, 8, 1000))
    b = rng.standard_normal(1000) * np.exp(rng.uniform(-8, 8, 1000))
    ah, al = dd.split_f64(jnp.asarray(a))
    bh, bl = dd.split_f64(jnp.asarray(b))
    ph, pl_ = jax.jit(dd.dd_mul)(ah, al, bh, bl)
    rel = np.abs(np.asarray(dd.join_f64(ph, pl_)) - a * b) / np.abs(a * b)
    assert rel.max() < 1e-12


def test_dd_matvec_beats_f32_by_many_digits():
    rng = np.random.default_rng(2)
    M = rng.standard_normal((640, 256))
    x = rng.standard_normal(256)
    Mh, Ml = dd.split_f64(jnp.asarray(M))
    xh, xl = dd.split_f64(jnp.asarray(x)[None, :])
    rh, rl = jax.jit(dd.dd_matvec_cols)(Mh, Ml, xh, xl)
    got = np.asarray(dd.join_f64(rh, rl))[:, 0]
    ref = M @ x
    assert (np.abs(got - ref) / np.abs(ref).max()).max() < 1e-11


@pytest.mark.parametrize("n", [1, 60, 128, 200, 384])
def test_pallas_cholesky_blocked(n):
    rng = np.random.default_rng(n)
    M = rng.standard_normal((n, n)).astype(np.float32)
    H = M @ M.T + n * np.eye(n, dtype=np.float32)
    L, Dinv = cholesky_blocked(jnp.asarray(H), interpret=True)
    Lref = np.linalg.cholesky(H.astype(np.float64))
    assert np.abs(np.asarray(L) - Lref).max() / np.abs(Lref).max() < 5e-6
    B = rng.standard_normal((n, 3)).astype(np.float32)
    X = cholesky_solve_blocked(L, Dinv, jnp.asarray(B), interpret=True)
    Xref = np.linalg.solve(H.astype(np.float64), B)
    assert (np.abs(np.asarray(X) - Xref).max()
            / (np.abs(Xref).max() + 1e-30)) < 5e-5


def test_pallas_cholesky_nan_on_indefinite():
    H = -np.eye(64, dtype=np.float32)
    L, _ = cholesky_blocked(jnp.asarray(H), interpret=True)
    assert np.isnan(np.asarray(L)).any()


@pytest.mark.parametrize("t", [1.0, 1e6])
@pytest.mark.parametrize("qp", [False, True])
def test_fused_newton_direction(t, qp):
    rng = np.random.default_rng(42)
    k, r = 300, 100
    C = rng.standard_normal((k, r))
    z = rng.standard_normal(r) * 0.1
    s_true = rng.uniform(0.01, 2.0, k)
    d = C @ z + s_true
    c = rng.standard_normal(r)
    tc = t * c
    H = C.T @ ((1.0 / s_true**2)[:, None] * C)
    g = tc + C.T @ (1.0 / s_true)
    tP = None
    if qp:
        M = rng.standard_normal((r, r))
        P = M @ M.T / r + np.eye(r)
        tP = t * P
        H = H + tP
        g = g + tP @ z
    dx_ref = np.linalg.solve(H, -g)
    dx, g_out, rn = reduced_newton_dir(
        jnp.asarray(C), jnp.asarray(d), jnp.asarray(tc), jnp.asarray(z),
        None if tP is None else jnp.asarray(tP), interpret=True)
    assert np.abs(np.asarray(dx) - dx_ref).max() / np.abs(dx_ref).max() < 1e-7
    assert np.abs(np.asarray(g_out) - g).max() / np.abs(g).max() < 1e-10
    assert float(rn) < 1e-4


def test_supported_budget():
    assert supported(2200, 200, False)
    assert not supported(60000, 4096, True)
