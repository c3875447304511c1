"""Pallas TPU kernel: 14-offset shift-stencil sum over the vertex lattice.

The row-normalized vertex adjacency of the regular Kuhn grid is a fixed
stencil whose 14 offsets all lie within {-1, 0, 1}^3
(nn.gcn.LatticeAdjacency).  The XLA depthwise-conv formulation measured
~40x off the VPU roofline (57 ms/step at res-50); this kernel computes

    out[b, i, j, k, c] = sum_off x[b, i+di, j+dj, k+dk, c]

with x zero-padded by one cell on every spatial axis, so there are no
validity masks anywhere: every out-of-lattice neighbor read lands on an
explicit zero.

Layout: (B, I, J, K, C) with K in sublanes and C in the 128 lanes; the
grid walks (batch, i-row, channel-block) and each step ships the i-1 / i
/ i+1 row planes (consecutive steps reuse two of the three, so HBM
traffic is ~3x the array, all sequential).  j-shifts are static row
slices, k-shifts are rolls (safe: the wrapped-in values are the zero
padding).  Storage follows the input dtype (bf16 under the model's bf16
compute dtype — halving VMEM + traffic); accumulation is f32.

The offset set is symmetric (off in S <=> -off in S), making the
un-normalized stencil self-transpose: for the row-normalized neighbor
mean out = invdeg * S(x) the VJP is gx = S(invdeg * g) — the same kernel
applied to the scaled cotangent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil3d_kernel(xm_ref, x0_ref, xp_ref, o_ref, *, offsets):
    """One (batch, i-row, channel-block) tile.

    xm/x0/xp: (1, 1, JP, KP, CB) VMEM — row planes i-1, i, i+1;
    o: (1, 1, JP, KP, CB) VMEM output.
    """
    planes = {-1: xm_ref, 0: x0_ref, 1: xp_ref}
    jp = x0_ref.shape[2]
    acc = jnp.zeros(x0_ref.shape[2:], jnp.float32)
    for (di, dj, dk) in offsets:
        src = planes[di][0, 0]  # (JP, KP, CB)
        if dj > 0:
            seg = jax.lax.slice_in_dim(src, dj, jp, axis=0)
            seg = jnp.pad(seg, ((0, dj), (0, 0), (0, 0)))
        elif dj < 0:
            seg = jax.lax.slice_in_dim(src, 0, jp + dj, axis=0)
            seg = jnp.pad(seg, ((-dj, 0), (0, 0), (0, 0)))
        else:
            seg = src
        if dk != 0:
            # wrapped-in values are the zero padding (KP > n+1)
            seg = jnp.roll(seg, -dk, axis=1)
        acc = acc + seg.astype(jnp.float32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def stencil_fits_vmem(n: int, c_block: int = 128,
                      itemsize: int = 2) -> bool:
    """Whether one (j, k) plane block fits the ~16MB VMEM budget.

    Per grid step: 3 input planes (double-buffered, `itemsize` bytes) +
    1 f32 output plane (double-buffered) + ~2 plane-sized f32
    temporaries.  Beyond this (n >~ 60 for bf16) callers fall back to
    the XLA depthwise conv.
    """
    jp = _round_up(n + 2, 8)
    kp = _round_up(n + 2, 8)
    plane = jp * kp * c_block
    budget = 3 * plane * 2 * itemsize + plane * 4 * 2 + 2 * plane * 4
    return budget < 14 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("n", "offsets", "c_block", "interpret")
)
def stencil_sum(
    x_bxvxc: jnp.ndarray,
    n: int,
    offsets,
    c_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """sum_off shift_off(x) over the n^3 vertex lattice (module
    docstring).  x is (B, n^3, C); returns the same shape in f32."""
    b, v, c = x_bxvxc.shape
    assert v == n * n * n, (v, n)
    for off in offsets:
        assert all(-1 <= d <= 1 for d in off), off

    ip = n + 2
    jp = _round_up(n + 2, 8)
    kp = _round_up(n + 2, 8)
    cp = _round_up(c, c_block)
    # storage keeps the caller's dtype (bf16 halves VMEM + traffic when
    # the model's compute dtype opts in); accumulation is f32 regardless
    xg = x_bxvxc.reshape(b, n, n, n, c)
    xg = jnp.pad(
        xg,
        ((0, 0), (1, 1), (1, jp - n - 1), (1, kp - n - 1), (0, cp - c)),
    )  # (B, IP, JP, KP, CP), zeros outside the lattice

    nc = cp // c_block
    grid = (b, ip, nc)

    def imap(di):
        def f(bi, ii, ci):
            return (bi, jnp.clip(ii + di, 0, ip - 1), 0, 0, ci)
        return f

    blk = (1, 1, jp, kp, c_block)
    out = pl.pallas_call(
        functools.partial(_stencil3d_kernel, offsets=tuple(offsets)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk, imap(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, imap(0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, imap(1), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            blk, lambda bi, ii, ci: (bi, ii, 0, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ip, jp, kp, cp), jnp.float32),
        interpret=interpret,
    )(xg, xg, xg)
    # NOTE: i-edge clamping feeds garbage only into the i = 0 / ip-1 pad
    # rows, which this interior slice discards.
    return out[:, 1:n + 1, 1:n + 1, 1:n + 1, :c].reshape(b, v, c)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4)
)
def lattice_neighbor_mean(
    x_bxvxc: jnp.ndarray,
    inv_deg_v: jnp.ndarray,
    n: int,
    offsets,
    interpret: bool = False,
) -> jnp.ndarray:
    """Row-normalized neighbor mean (adj @ x) on the regular lattice.

    out = invdeg * S(x); the symmetric offset set makes the VJP
    gx = S(invdeg * g) — the same pallas kernel, no transpose kernel.
    """
    s = stencil_sum(x_bxvxc, n, offsets, interpret=interpret)
    return s * inv_deg_v[None, :, None]


def _lnm_fwd(x, inv_deg, n, offsets, interpret):
    out = lattice_neighbor_mean(x, inv_deg, n, offsets, interpret)
    return out, (inv_deg, jnp.zeros((0,), x.dtype))


def _lnm_bwd(n, offsets, interpret, res, g):
    inv_deg, dtype_token = res
    gx = stencil_sum(
        (g * inv_deg[None, :, None]).astype(dtype_token.dtype),
        n, offsets, interpret=interpret,
    )
    return (gx.astype(dtype_token.dtype), None)


lattice_neighbor_mean.defvjp(_lnm_fwd, _lnm_bwd)
