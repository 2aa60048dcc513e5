"""Double-float (float32 pair) arithmetic for TPU kernels.

TPU compute units have no float64: XLA emulates it, and the emulated f64
matmul/cholesky are 50-500x slower than f32 on the MXU (profiled on TPU
v5e: one 200x200 f64 Cholesky ~10 ms in-chain; the f64 barrier-Hessian
assembly CtD2C ~2 ms per Newton step).  Double-float ("dd") arithmetic
represents a value as an unevaluated sum hi + lo of two float32s
(~2^-48 ~ 4e-15 relative precision) built from error-free transformations
(Dekker 1971, Knuth TAOCP v2) — VPU-friendly, Pallas-compatible, and
precise enough to stand in for f64 in iterative-refinement residuals.

Used by ops/pallas_ddsolve.py (fused Newton-direction kernel) and tested
against float64 on CPU.  All functions operate elementwise on arrays and
work identically inside Pallas kernels and in plain XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Dekker split constant for float32 (24-bit mantissa): 2^12 + 1.
_SPLIT = 4097.0


def two_sum(a, b):
    """Error-free sum: a + b = s + e exactly (6 flops, Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (3 flops, Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (Dekker split; no FMA
    dependence — TPU VPU f32 mul/add are IEEE round-to-nearest)."""
    p = a * b
    ta = a * _SPLIT
    ahi = ta - (ta - a)
    alo = a - ahi
    tb = b * _SPLIT
    bhi = tb - (tb - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def dd_add(xhi, xlo, yhi, ylo):
    """(xhi+xlo) + (yhi+ylo) as a dd pair."""
    s, e = two_sum(xhi, yhi)
    e = e + (xlo + ylo)
    return fast_two_sum(s, e)


def dd_sub(xhi, xlo, yhi, ylo):
    return dd_add(xhi, xlo, -yhi, -ylo)


def dd_mul(xhi, xlo, yhi, ylo):
    """(xhi+xlo) * (yhi+ylo) as a dd pair."""
    p, e = two_prod(xhi, yhi)
    e = e + (xhi * ylo + xlo * yhi)
    return fast_two_sum(p, e)


def dd_mul_f32(xhi, xlo, y):
    """(xhi+xlo) * y with plain-f32 y."""
    p, e = two_prod(xhi, y)
    e = e + xlo * y
    return fast_two_sum(p, e)


def dd_neg(xhi, xlo):
    return -xhi, -xlo


def split_f64(x):
    """Split a float64 array into a dd pair of float32s (hi = round(x),
    lo = round(x - hi)).  Elementwise — cheap even in emulated f64."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def join_f64(hi, lo):
    """Recombine a dd pair into float64 (exact: both summands representable)."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def dd_reduce(hi, lo, axis: int):
    """Compensated sum of a dd array along ``axis`` via halving folds.

    Tree reduction with two_sum at every node keeps the error at the
    dd level (~4e-15 relative) instead of f32's sqrt(n)*6e-8.  Shapes are
    static, so the fold is unrolled Python control flow (Pallas-safe).
    Returns a dd pair with ``axis`` reduced to size 1 (keepdims).
    """
    def take(arr, sl):
        idx = [slice(None)] * arr.ndim
        idx[axis] = sl
        return arr[tuple(idx)]

    while hi.shape[axis] > 1:
        m = hi.shape[axis]
        if m % 2:
            # pad odd lengths with an exact zero slot instead of folding
            # the remainder into slot 0: the fold produced a ZERO-SIZED
            # concat operand once a stage reached m == 3 (h == 1), which
            # Mosaic rejects ("vector types must have positive constant
            # sizes") — hit by any rp with a factor of 3 (e.g. 384)
            zshape = list(hi.shape)
            zshape[axis] = 1
            z = jnp.zeros(zshape, hi.dtype)
            hi = jnp.concatenate([hi, z], axis=axis)
            lo = jnp.concatenate([lo, z], axis=axis)
            m += 1
        h = m // 2
        ah, al = take(hi, slice(0, h)), take(lo, slice(0, h))
        bh, bl = take(hi, slice(h, 2 * h)), take(lo, slice(h, 2 * h))
        hi, lo = dd_add(ah, al, bh, bl)
    return hi, lo


def dd_matvec_cols(Mhi, Mlo, xhi, xlo):
    """dd product M @ x where x is a row-broadcast dd pair of shape
    (1, n) against M of shape (m, n); returns dd pair of shape (m, 1).

    Elementwise two_prod + compensated tree reduction: every term's
    rounding error is captured, so the result is accurate to ~4e-15
    relative — the property plain f32 (and bf16 MXU) matmuls lack.
    """
    ph, pl_ = dd_mul(Mhi, Mlo, xhi, xlo)
    return dd_reduce(ph, pl_, axis=1)


def dd_matvec_rows(Mhi, Mlo, yhi, ylo):
    """dd product M.T @ y with y column-broadcast, shape (m, 1), against
    M of shape (m, n); returns dd pair of shape (1, n)."""
    ph, pl_ = dd_mul(Mhi, Mlo, yhi, ylo)
    return dd_reduce(ph, pl_, axis=0)


# ---------------------------------------------------------------------------
# Plain-XLA dd contractions over statically split f64 operands.  Used by the
# barrier oracles on TPU (ops/barrier.py, ops/socp.py) where the emulated-f64
# einsums would otherwise dominate the Newton step; the splits are computed
# once at oracle build and captured by the closures.
# ---------------------------------------------------------------------------


# Above this many elements in the product array, the flat halving-fold
# reduction's ~log2(axis) concat stages on huge operands blow single-core
# XLA:TPU compile time (measured: 60-80 min at (11000, 1000)); the chunked
# fori_loop reduction keeps the graph O(1) in the operand size.
_LOOP_REDUCE_LIMIT = 2 ** 22
_LOOP_CHUNK = 512


def _dd_reduce_any(ph, pl_, axis):
    """Compensated reduction along ``axis``: flat tree for small operands,
    fori_loop over fixed slabs (O(1) graph size) for large ones.  Returns
    a dd pair with ``axis`` reduced to size 1 (keepdims), like dd_reduce."""
    if ph.size <= _LOOP_REDUCE_LIMIT:
        return dd_reduce(ph, pl_, axis=axis)

    ph = jnp.moveaxis(ph, axis, 0)
    pl_ = jnp.moveaxis(pl_, axis, 0)
    m = ph.shape[0]
    S = -(-m // _LOOP_CHUNK)
    pad = S * _LOOP_CHUNK - m
    if pad:
        zshape = (pad,) + ph.shape[1:]
        z = jnp.zeros(zshape, ph.dtype)
        ph = jnp.concatenate([ph, z], axis=0)
        pl_ = jnp.concatenate([pl_, z], axis=0)
    rest = ph.shape[1:]
    ph = ph.reshape((S, _LOOP_CHUNK) + rest)
    pl_ = pl_.reshape((S, _LOOP_CHUNK) + rest)

    def body(s, acc):
        ah, al = acc
        sh, sl = dd_reduce(ph[s], pl_[s], axis=0)    # slab tree -> (1, rest)
        return dd_add(ah, al, sh[0], sl[0])

    z0 = jnp.zeros(rest, ph.dtype)
    h, l = lax.fori_loop(0, S, body, (z0, z0))
    h = jnp.moveaxis(h[None], 0, axis)
    l = jnp.moveaxis(l[None], 0, axis)
    return h, l


def dd_mv(Mhi, Mlo, x):
    """dd ``M @ x`` reducing the LAST axis of M against f64 ``x``; returns
    f64 of shape ``M.shape[:-1]``.  Works for (m, n) and stacked (k, m, n)."""
    xhi, xlo = split_f64(x)
    ph, pl_ = dd_mul(Mhi, Mlo, xhi, xlo)
    h, l = _dd_reduce_any(ph, pl_, axis=Mhi.ndim - 1)
    return join_f64(h[..., 0], l[..., 0])


def dd_tmv(Mhi, Mlo, y):
    """dd ``M.T @ y`` for 2-D M of shape (m, n) and f64 y of shape (m,);
    returns f64 of shape (n,)."""
    yhi, ylo = split_f64(y)
    ph, pl_ = dd_mul(Mhi, Mlo, yhi[:, None], ylo[:, None])
    h, l = _dd_reduce_any(ph, pl_, axis=0)
    return join_f64(h[0, :], l[0, :])
