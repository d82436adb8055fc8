"""Fused Pallas conv tower: the whole 4-layer encoder forward as ONE
VMEM-resident kernel (a decoder twin would follow the same scheme but is
not implemented — see STATUS below for why neither currently compiles).

Why: the learner is HBM-bandwidth-bound (PERFORMANCE.md roofline), and the
XLA lowering of the conv towers streams every intermediate activation
(~375 MB/tower-pass at the flagship 1500-frame workload) through HBM.  All
four layers of one tower fit comfortably in VMEM for a block of frames, so a
fused kernel reduces the tower's HBM traffic to "read input once, write
output once" (~31 MB for the encoder) — everything between lives on-chip.

Kernel strategy (reference: VariationalAutoEncoder.py:33-42 — 4x stride-2
Conv(k4, p1) + SiLU, channels 3 -> f1 -> f2 -> 2f2 -> 4f2):

A k4/s2/p1 conv needs input rows 2i-1 .. 2i+2 for output row i.  With the
input written into a zero-padded VMEM scratch P at offset (+1, +1), those
taps become P[2i .. 2i+3] — aligned to 2-row blocks.  Viewing P as
(N, U, 2, V, 2, C) (pure dim-split reshape), the conv is 16 accumulating
matmuls over the channel dim:

    y[:, i, j, :] = sum_{a,b in 0..3} P6[:, i+a//2, a%2, j+b//2, b%2, :] @ W[a, b]

i.e. per tap one (N*Ho*Wo, C) x (C, Co) MXU contraction — no im2col
materialisation, no strided memory access (the parity split happens at
VMEM-value level).  Bias + SiLU fuse in-kernel; the next layer consumes the
result straight from VMEM.

The grid walks blocks of frames; layer weights use constant index maps so
they stay resident across grid steps.

STATUS — experimental, interpret-mode only (kept for when Mosaic grows the
needed lowerings; see PERFORMANCE.md "fused-Pallas investigation"): the
compiled TPU path is blocked by current Mosaic limits — no strided slicing
at value or ref level, 128-lane padding of small channel dims (C=3 costs
42x VMEM), concat vpad-offset mismatches, and compile-time blowups on the
16-tap dot accumulation.  XLA's native conv lowering measures at 50-65% of
HBM bandwidth per op, so the unfused path is within ~2x of streaming
roofline anyway.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


# --------------------------------------------------------------------------- #
# Encoder forward
# --------------------------------------------------------------------------- #


def _conv_k4s2p1(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 p_ref, acc_dtype=jnp.float32) -> jnp.ndarray:
    """One k4/s2/p1 conv + bias + SiLU computed from a VMEM padded scratch.

    x: (N, H, W, C) value; w: (4, 4, C, Co); p_ref: scratch (N, H+2, W+2, C).
    Returns (N, H/2, W/2, Co) in x.dtype.

    The 16 tap slices concatenate into ONE (N*Ho*Wo, 16C) patch matrix and a
    single MXU dot against w.reshape(16C, Co) — w's (a, b, c) order is
    exactly the concat order, so no weight rearrangement is needed.
    """
    n, h, wd, c = x.shape
    co = w.shape[-1]
    ho, wo = h // 2, wd // 2

    # The interior is fully overwritten below and TPU scratch persists across
    # (sequential) grid steps, so the zero border only needs writing once.
    @pl.when(pl.program_id(0) == 0)
    def _():
        p_ref[:] = jnp.zeros_like(p_ref)

    p_ref[:, 1:h + 1, 1:wd + 1, :] = x
    p6 = p_ref[:].reshape(n, ho + 1, 2, wo + 1, 2, c)
    taps = []
    for a in range(4):
        du, rh = divmod(a, 2)
        for bb in range(4):
            dv, rw = divmod(bb, 2)
            taps.append(p6[:, du:du + ho, rh, dv:dv + wo, rw, :]
                        .reshape(n * ho * wo, c))
    patch = jnp.concatenate(taps, axis=-1)
    y = jnp.dot(patch, w.reshape(16 * c, co), preferred_element_type=acc_dtype)
    y = jax.nn.silu(y + b.astype(acc_dtype))
    return y.astype(x.dtype).reshape(n, ho, wo, co)


def _encoder_kernel(obs_ref, w0, b0, w1, b1, w2, b2, w3, b3, out_ref,
                    p0, p1, p2, p3, *, dtype):
    # u8 -> compute dtype, normalised to [-0.5, 0.5] (WorldModel.py:156).
    # (Mosaic has no direct u8->float cast; widen through i32 first.)
    x = obs_ref[:].astype(jnp.int32).astype(jnp.float32)
    x = (x / 255.0 - 0.5).astype(dtype)
    x = _conv_k4s2p1(x, w0[:], b0[:], p0)
    x = _conv_k4s2p1(x, w1[:], b1[:], p1)
    x = _conv_k4s2p1(x, w2[:], b2[:], p2)
    x = _conv_k4s2p1(x, w3[:], b3[:], p3)
    out_ref[:] = x.reshape(x.shape[0], -1)


def encoder_forward(obs_u8: jnp.ndarray, weights: Sequence[jnp.ndarray],
                    biases: Sequence[jnp.ndarray], dtype=jnp.bfloat16,
                    block: int = 10, interpret: bool | None = None) -> jnp.ndarray:
    """Fused 4-layer encoder tower: (N, H, W, 3) u8 -> (N, F) features.

    weights[l]: (4, 4, C_l, C_{l+1}) HWIO (flax Conv layout); biases[l]: (C,).
    Numerics: conv accumulation in f32, activations carried in `dtype`
    between layers — same as the XLA path (flax Conv with dtype=bf16).
    """
    if interpret is None:
        interpret = _interpret_default()
    n, h, w, cin = obs_u8.shape
    pad = (-n) % block
    if pad:
        obs_u8 = jnp.concatenate(
            [obs_u8, jnp.zeros((pad,) + obs_u8.shape[1:], obs_u8.dtype)], 0)
    nb = obs_u8.shape[0] // block
    chans = [cin] + [wt.shape[-1] for wt in weights]
    feat = (h // 16) * (w // 16) * chans[-1]

    wspecs = []
    args = []
    for wt, bs in zip(weights, biases):
        wspecs += [
            pl.BlockSpec(wt.shape, lambda i: (0,) * 4, memory_space=pltpu.VMEM),
            pl.BlockSpec(bs.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ]
        args += [wt.astype(dtype), bs.astype(jnp.float32)]

    scratch = [
        pltpu.VMEM((block, h // 2 ** l + 2, w // 2 ** l + 2, chans[l]), dtype)
        for l in range(4)
    ]

    out = pl.pallas_call(
        functools.partial(_encoder_kernel, dtype=dtype),
        grid=(nb,),
        in_specs=[pl.BlockSpec((block, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((block, feat), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((obs_u8.shape[0], feat), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(obs_u8, *args)
    return out[:n]
