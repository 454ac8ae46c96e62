"""Fused residual block as a Pallas TPU kernel (inference hot path).

BASELINE.json's north star calls for leaf evaluations batching into a
"Pallas-fused residual policy-value network". The MCTS leaf-eval forward is
inference: BatchNorm folds into the convolutions, so one residual block is

    y = relu(conv3x3(x)·s1 + b1);  out = relu(conv3x3(y)·s2 + b2 + x)

This kernel computes BOTH convolutions of a block for a batch tile while the
activations stay resident in VMEM — the intermediate ``y`` and the residual
stream never round-trip to HBM (the win over XLA's per-conv fusion; boards
are tiny, so conv arithmetic intensity is low and HBM traffic dominates).

Layout: everything is 2-D ``[rows=TB·H·W, C]`` — Mosaic-friendly (no
in-kernel rank changes; sublanes = flattened batch·board, lanes = channels).
A 3×3 'same' conv is 9 shifted matmuls on the MXU: the spatial shift
(dy, dx) becomes a FLAT roll by ``dy·W + dx`` along the row axis plus a
border-validity mask. Rolling across row/sample boundaries lands exactly on
the positions the mask zeroes (a col overflow walks into the next row, a row
overflow into the next sample — both masked), so flat-roll + mask ==
zero-padded 2-D shift. Weights are packed [9, C, C]; batch-norm is folded
in by `fold_batchnorm`.

Interpret-mode equality vs the Flax block is tested in tests/test_pallas.py
(SURVEY.md §4 "Unit (net)"); `use_pallas` in NetConfig A/B-switches the
whole net between this kernel and pure XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_flat(x2d: jnp.ndarray, w9: jnp.ndarray, h: int,
                  w_sz: int) -> jnp.ndarray:
    """9-tap shifted-matmul 3×3 'same' conv on the flat [R, C] view."""
    r, _ = x2d.shape
    cout = w9.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    hw = h * w_sz
    hpos = (i % hw) // w_sz
    wpos = i % w_sz
    acc = jnp.zeros((r, cout), jnp.float32)
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shift = dy * w_sz + dx
            # jnp.roll works both in-kernel (slice+concat, nonzero shift)
            # and in plain XLA (unit tests call this helper directly)
            xs = jnp.roll(x2d, -shift, axis=0) if shift else x2d
            valid = ((hpos + dy >= 0) & (hpos + dy < h)
                     & (wpos + dx >= 0) & (wpos + dx < w_sz))
            xs = jnp.where(valid, xs, 0)
            acc = acc + jnp.dot(xs, w9[k],
                                preferred_element_type=jnp.float32)
            k += 1
    return acc


def _resblock_kernel(h, w_sz, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     out_ref):
    x = x_ref[...]
    y = _conv3x3_flat(x, w1_ref[...], h, w_sz)
    y = jnp.maximum(y + b1_ref[...].astype(jnp.float32), 0.0)
    y = y.astype(x.dtype)
    z = _conv3x3_flat(y, w2_ref[...], h, w_sz)
    z = z + b2_ref[...].astype(jnp.float32) + x.astype(jnp.float32)
    out_ref[...] = jnp.maximum(z, 0.0).astype(x.dtype)


def fused_resblock(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                   w2: jnp.ndarray, b2: jnp.ndarray,
                   batch_tile: int = 8, interpret: bool = False
                   ) -> jnp.ndarray:
    """x [B,H,W,C]; w1/w2 [9,C,C] packed 3×3 kernels (BN folded); b1/b2 [C]."""
    b, h, w, c = x.shape
    # tile constraint: the block's sublane dim (tb·h·w) must be a multiple
    # of 8 unless it covers the whole array
    tb = min(batch_tile, b)
    while tb > 1 and (b % tb or (tb * h * w) % 8):
        tb -= 1
    if (tb * h * w) % 8 and b * h * w % 8 == 0:
        tb = b  # fall back to one whole-array block
    grid = (b // tb,)
    rows = tb * h * w
    x2d = x.reshape(b * h * w, c)
    b1 = b1.reshape(1, c)
    b2 = b2.reshape(1, c)
    flops = 2 * b * h * w * c * c * 9 * 2
    out = pl.pallas_call(
        functools.partial(_resblock_kernel, h, w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
        interpret=interpret,
    )(x2d, w1, b1, w2, b2)
    return out.reshape(b, h, w, c)


def pack_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Flax Conv kernel [3, 3, Cin, Cout] → packed [9, Cin, Cout]."""
    return k.reshape(9, k.shape[2], k.shape[3])


def fold_batchnorm(kernel: jnp.ndarray, bn_scale, bn_bias, bn_mean, bn_var,
                   eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BatchNorm into the preceding conv.

    conv(x)·γ/√(σ²+ε) + (β − μγ/√(σ²+ε))  →  (W', b').
    kernel: [..., Cin, Cout]; BN params: [Cout].
    """
    inv = bn_scale * jax.lax.rsqrt(bn_var + eps)
    w = kernel * inv  # broadcasts over trailing Cout axis
    b = bn_bias - bn_mean * inv
    return w, b
