"""Fused Pallas GRU cell for the RSSM scan body (the BASELINE north star's
"Pallas-fused GRU cell").

Forward: one kernel computes all six gate matmuls + the elementwise gate math
with every operand resident in VMEM (at the flagship shapes — x (B,1027),
h (B,600) — weights total ~12 MB f32, fitting VMEM), instead of XLA's separate
gemm + elementwise fusions.  Gate weights are laid out per-gate (r,z,n) and
padded to lane multiples so gate slicing never crosses tile boundaries.

Backward: an analytic custom VJP in plain XLA (recompute-free — the forward
saves the gate activations).  This keeps the kernel usable inside
``jax.grad``-ed scans (pallas_call alone is not differentiable).

Equivalence with the XLA path (nets.gru.gru_cell_core) is covered by
tests/test_pallas.py; the cell is enabled via runtime.use_pallas_gru.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gate_math(x, h,
               wir_ref, wiz_ref, win_ref,
               whr_ref, whz_ref, whn_ref,
               bir_ref, biz_ref, bin_ref,
               bhr_ref, bhz_ref, bhn_ref):
    """Six gate matmuls + elementwise GRU update on VMEM values (shared by
    the single-step and whole-scan kernels).  Returns f32 (out, r, z, n, hn)."""
    f32 = jnp.float32
    gr = (jnp.dot(x, wir_ref[:], preferred_element_type=f32)
          + jnp.dot(h, whr_ref[:], preferred_element_type=f32)
          + bir_ref[:] + bhr_ref[:])
    gz = (jnp.dot(x, wiz_ref[:], preferred_element_type=f32)
          + jnp.dot(h, whz_ref[:], preferred_element_type=f32)
          + biz_ref[:] + bhz_ref[:])
    hn = jnp.dot(h, whn_ref[:], preferred_element_type=f32) + bhn_ref[:]
    r = jax.nn.sigmoid(gr)
    z = jax.nn.sigmoid(gz)
    n = jnp.tanh(jnp.dot(x, win_ref[:], preferred_element_type=f32)
                 + bin_ref[:] + r * hn)
    out = (1.0 - z) * n + z * h.astype(f32)
    return out, r, z, n, hn


def _gru_kernel(x_ref, h_ref,
                wir_ref, wiz_ref, win_ref,
                whr_ref, whz_ref, whn_ref,
                bir_ref, biz_ref, bin_ref,
                bhr_ref, bhz_ref, bhn_ref,
                out_ref, r_ref, z_ref, n_ref, hn_ref):
    out, r, z, n, hn = _gate_math(
        x_ref[:], h_ref[:], wir_ref, wiz_ref, win_ref, whr_ref, whz_ref,
        whn_ref, bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref)
    out_ref[:] = out.astype(out_ref.dtype)
    r_ref[:] = r.astype(r_ref.dtype)
    z_ref[:] = z.astype(z_ref.dtype)
    n_ref[:] = n.astype(n_ref.dtype)
    hn_ref[:] = hn.astype(hn_ref.dtype)


def _split_gates(w: jnp.ndarray, hidden: int):
    """(D, 3H) torch-gate-order fused kernel -> three (D, H) blocks (r, z, n)."""
    return w[:, :hidden], w[:, hidden:2 * hidden], w[:, 2 * hidden:]


def _pad2(a: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def _pad_gate_params(wi, wh, bi, bh, H: int, Ip: int, Hp: int):
    """Split fused (D, 3H) torch-order gate weights/biases into per-gate
    blocks padded to tile-aligned (Ip/Hp, Hp) / (1, Hp) shapes (shared by
    the single-step and whole-scan wrappers)."""
    wirs = [_pad2(w, Ip, Hp) for w in _split_gates(wi, H)]
    whrs = [_pad2(w, Hp, Hp) for w in _split_gates(wh, H)]
    bis = [jnp.pad(b, (0, Hp - H)).reshape(1, Hp) for b in
           (bi[:H], bi[H:2 * H], bi[2 * H:])]
    bhs = [jnp.pad(b, (0, Hp - H)).reshape(1, Hp) for b in
           (bh[:H], bh[H:2 * H], bh[2 * H:])]
    return wirs, whrs, bis, bhs


def _forward_padded(x, h, wi, wh, bi, bh):
    """Run the kernel on tile-aligned padded operands; returns unpadded
    (out, residual gate activations)."""
    B, I = x.shape
    H = h.shape[-1]
    dtype = x.dtype
    sub = 8 if dtype == jnp.float32 else 16
    Bp, Ip, Hp = _round_up(B, sub), _round_up(I, 128), _round_up(H, 128)

    xp = _pad2(x, Bp, Ip)
    hp = _pad2(h, Bp, Hp)
    wirs, whrs, bis, bhs = _pad_gate_params(wi, wh, bi, bh, H, Ip, Hp)

    out_shapes = tuple(jax.ShapeDtypeStruct((Bp, Hp), jnp.float32) for _ in range(5))
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    n_inputs = 14
    out, r, z, n, hn = pl.pallas_call(
        _gru_kernel,
        out_shape=out_shapes,
        in_specs=[vmem()] * n_inputs,
        out_specs=tuple(vmem() for _ in range(5)),
    )(xp, hp, *wirs, *whrs, *bis, *bhs)
    crop = lambda a: a[:B, :H]
    return crop(out).astype(dtype), (crop(r), crop(z), crop(n), crop(hn))


@jax.custom_vjp
def gru_cell_pallas(x, h, wi, wh, bi, bh):
    """Fused GRU step with torch nn.GRUCell semantics (SequenceModel.py:13-24).

    x: (B, I); h: (B, H); wi: (I, 3H); wh: (H, 3H); bi, bh: (3H,).
    """
    out, _ = _forward_padded(x, h, wi, wh, bi, bh)
    return out


def _fwd(x, h, wi, wh, bi, bh):
    out, (r, z, n, hn) = _forward_padded(x, h, wi, wh, bi, bh)
    return out, (x, h, wi, wh, r, z, n, hn)


def _bwd(res, g):
    x, h, wi, wh, r, z, n, hn = res
    H = h.shape[-1]
    g = g.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    dz = g * (hf - n) * z * (1.0 - z)
    dn = g * (1.0 - z) * (1.0 - n * n)
    dr = dn * hn * r * (1.0 - r)
    dn_r = dn * r

    wir, wiz, win = _split_gates(wi, H)
    whr, whz, whn = _split_gates(wh, H)

    d_gates_i = jnp.concatenate([dr, dz, dn], axis=-1)          # (B, 3H)
    d_gates_h = jnp.concatenate([dr, dz, dn_r], axis=-1)

    dx = dr @ wir.T + dz @ wiz.T + dn @ win.T
    dh = g * z + dr @ whr.T + dz @ whz.T + dn_r @ whn.T
    dwi = x.astype(jnp.float32).T @ d_gates_i
    dwh = hf.T @ d_gates_h
    dbi = jnp.sum(d_gates_i, axis=0)
    dbh = jnp.sum(d_gates_h, axis=0)
    cast = lambda a, like: a.astype(like.dtype)
    return (cast(dx, x), cast(dh, h), cast(dwi, wi), cast(dwh, wh),
            cast(dbi, jnp.zeros(1, dtype=wi.dtype)), cast(dbh, jnp.zeros(1, dtype=wh.dtype)))


gru_cell_pallas.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------- #
# Whole-scan GRU: one kernel over all T steps (grid-over-time)
# --------------------------------------------------------------------------- #


def _gru_scan_kernel(x_ref, h0_ref,
                     wir_ref, wiz_ref, win_ref,
                     whr_ref, whz_ref, whn_ref,
                     bir_ref, biz_ref, bin_ref,
                     bhr_ref, bhz_ref, bhn_ref,
                     out_ref, r_ref, z_ref, n_ref, hn_ref,
                     h_carry):
    """One grid step = one timestep; the recurrent state lives in a VMEM
    scratch that persists across grid steps (TPU grids run sequentially),
    and the six gate weight blocks use constant index maps so they stay
    VMEM-resident for the whole scan instead of being re-read from HBM
    every step (the cost that makes per-step pallas_calls lose to XLA)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_carry[:] = h0_ref[:].astype(jnp.float32)

    out, r, z, n, hn = _gate_math(
        x_ref[0], h_carry[:], wir_ref, wiz_ref, win_ref, whr_ref, whz_ref,
        whn_ref, bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref)
    h_carry[:] = out
    out_ref[0] = out
    r_ref[0] = r
    z_ref[0] = z
    n_ref[0] = n
    hn_ref[0] = hn


def gru_scan_forward(xs, h0, wi, wh, bi, bh):
    """All-T GRU unroll in ONE pallas_call (torch nn.GRUCell semantics per
    step, SequenceModel.py:13-24).

    xs: (T, B, I); h0: (B, H); wi: (I, 3H); wh: (H, 3H); bi/bh: (3H,).
    Returns (h_seq (T, B, H) f32, residuals (r, z, n, hn) each (T, B, H) f32).
    """
    T, B, I = xs.shape
    H = h0.shape[-1]
    sub = 8 if xs.dtype == jnp.float32 else 16
    Bp, Ip, Hp = _round_up(B, sub), _round_up(I, 128), _round_up(H, 128)

    xp = jnp.pad(xs, ((0, 0), (0, Bp - B), (0, Ip - I)))
    hp = _pad2(h0.astype(jnp.float32), Bp, Hp)
    wirs, whrs, bis, bhs = _pad_gate_params(wi, wh, bi, bh, H, Ip, Hp)

    seq_spec = pl.BlockSpec((1, Bp, Hp), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0),
                                        memory_space=pltpu.VMEM)
    out_shapes = tuple(jax.ShapeDtypeStruct((T, Bp, Hp), jnp.float32)
                       for _ in range(5))
    outs = pl.pallas_call(
        _gru_scan_kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, Bp, Ip), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  const2((Bp, Hp))]
                 + [const2((Ip, Hp))] * 3 + [const2((Hp, Hp))] * 3
                 + [const2((1, Hp))] * 6,
        out_specs=tuple(seq_spec for _ in range(5)),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((Bp, Hp), jnp.float32)],
    )(xp, hp, *wirs, *whrs, *bis, *bhs)
    crop = lambda a: a[:, :B, :H]
    h_seq, r, z, n, hn = (crop(o) for o in outs)
    return h_seq, (r, z, n, hn)
