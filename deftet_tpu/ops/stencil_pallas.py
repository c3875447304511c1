"""Pallas TPU kernel: 14-offset shift-stencil sum over the vertex lattice.

The row-normalized vertex adjacency of the regular Kuhn grid is a fixed
stencil whose 14 offsets all lie within {-1, 0, 1}^3
(nn.gcn.LatticeAdjacency).  The XLA depthwise-conv formulation measured
~40x off the VPU roofline (57 ms/step at res-50); this kernel computes

    out[b, i, j, k, c] = scale[i, j, k] * sum_off x[b, i+di, j+dj, k+dk, c]

with x zero-padded by one cell on every spatial axis, so there are no
validity masks anywhere: every out-of-lattice neighbor read lands on an
explicit zero.

Layout: (B, I, J, K, C) with K in sublanes and C in the 128 lanes; the
grid walks (batch, out-row, channel-block) and each step ships the i-1 /
i / i+1 row planes (consecutive steps reuse two of the three, so HBM
traffic is ~3x the array, all sequential).  j-shifts are static row
slices, k-shifts are rolls (safe: the wrapped-in values are the zero
padding).  Storage follows the input dtype on BOTH sides (bf16 under the
model's bf16 compute dtype — halving VMEM + traffic); accumulation is
f32.

The per-vertex output scale (the row-normalizing 1/degree) is applied
INSIDE the kernel: an f32 output + external multiply/cast measured an
extra full f32 pass over the padded grid (~10 ms/step at res-50 across
the GCN's 12 stencil applications).  The scale plane is (1, JP, KP, 1) —
KP in sublanes matching the accumulator, lane-broadcast over channels.

The offset set is symmetric (off in S <=> -off in S), making the
un-normalized stencil self-transpose: for the row-normalized neighbor
mean out = invdeg * S(x) the VJP is gx = S(invdeg * g) — the same
kernel with unit output scale on the pre-scaled cotangent (the invdeg
multiply fuses with the kernel's input pad in XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil3d_kernel(xm_ref, x0_ref, xp_ref, s_ref, o_ref, *, offsets):
    """One (batch, out-row, channel-block) tile.

    xm/x0/xp: (1, 1, JP, KP, CB) VMEM — padded-row planes i-1, i, i+1
    around the output row; s: (1, JP, KP, 1) output scale plane;
    o: (1, 1, JP, KP, CB) VMEM output (storage dtype).
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
    o_ref[0, 0] = (acc * s_ref[0]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def stencil_fits_vmem(n: int, c_block: int = 128,
                      itemsize: int = 2) -> bool:
    """Whether one (j, k) plane block fits the ~16MB VMEM budget.

    Per grid step: 3 input planes + 1 output plane (double-buffered,
    `itemsize` bytes) + ~2 plane-sized f32 temporaries.  Beyond this
    (n >~ 64 for bf16) callers fall back to the XLA depthwise conv.
    """
    jp = _round_up(n + 2, 8)
    kp = _round_up(n + 2, 8)
    plane = jp * kp * c_block
    budget = 4 * plane * 2 * itemsize + 2 * plane * 4
    return budget < 14 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("n", "offsets", "c_block", "interpret")
)
def stencil_sum(
    x_bxvxc: jnp.ndarray,
    n: int,
    offsets,
    scale_v: jnp.ndarray | None = None,
    c_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """scale * sum_off shift_off(x) over the n^3 vertex lattice (module
    docstring).  x is (B, n^3, C); scale_v is (n^3,) or None (unit
    scale).  Returns (B, n^3, C) in x's dtype; accumulation is f32."""
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

    if scale_v is None:
        sg = jnp.ones((n, jp, kp, 1), jnp.float32)
    else:
        sg = scale_v.astype(jnp.float32).reshape(n, n, n, 1)
        sg = jnp.pad(sg, ((0, 0), (1, jp - n - 1), (1, kp - n - 1), (0, 0)))

    nc = cp // c_block
    grid = (b, n, nc)

    def imap(di):
        # output row r reads padded rows r + 1 + di (pads at 0 / ip-1)
        def f(bi, ri, ci):
            return (bi, ri + 1 + di, 0, 0, ci)
        return f

    blk = (1, 1, jp, kp, c_block)
    out = pl.pallas_call(
        functools.partial(_stencil3d_kernel, offsets=tuple(offsets)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk, imap(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, imap(0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, imap(1), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, jp, kp, 1), lambda bi, ri, ci: (ri, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            blk, lambda bi, ri, ci: (bi, ri, 0, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n, jp, kp, cp), x_bxvxc.dtype
        ),
        interpret=interpret,
    )(xg, xg, xg, sg)
    return out[:, :, 1:n + 1, 1:n + 1, :c].reshape(b, v, c)


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

    out = invdeg * S(x), scaled in-kernel; the symmetric offset set
    makes the VJP gx = S(invdeg * g) — the same kernel applied to the
    scaled cotangent (the scale there is an input pre-multiply, which
    XLA fuses with the kernel's pad).
    """
    return stencil_sum(
        x_bxvxc, n, offsets, scale_v=inv_deg_v, interpret=interpret
    )


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
