"""Whole-imagination Pallas kernel: the H-step dream rollout as ONE
grid-over-time pallas_call with every weight VMEM-resident.

This is the north star's "Pallas-fused GRU cell inside the lax.scan" taken to
its TPU-native conclusion: the imagination recurrence (actor MLP -> tanh
-Normal sample -> GRU -> dynamics-prior MLP -> unimix STE categorical sample,
reference Dreamer.py:143-175 / WorldModel.py:72-77 / Agent.py:202-210)
cannot be fused ACROSS time by XLA because each step's input depends on the
previous step's sampled latent; a lax.scan therefore re-reads ~9 MB of
actor+GRU+dyn weights from HBM every one of the H=30 steps.  Here the grid
runs over time, the weights use constant index maps (loaded into VMEM once,
resident for the whole scan), and the recurrent (h, z) state lives in VMEM
scratch that persists across grid steps (TPU grids execute sequentially).

Numerics mirror ops/fused_scans._imagine_step op-for-op (same compute dtype,
f32 LayerNorm stats, f32 sampling math, precomputed eps/gum noise => the SAME
RNG stream as the module scans).  The backward pass is fused_scans'
_imagine_bwd, reused unchanged: its residuals are only (params, h0, z0, eps,
gum, h_seq, z_seq), all of which this kernel produces.

Padding strategy: every feature dim is padded to lane multiples (128) and the
batch to sublane multiples; concatenated inputs ([h ‖ z], [z ‖ a]) are never
materialized — each Dense against a concat is computed as a SPLIT matmul
(h @ W_top + z @ W_bot) so padding never lands inside a contraction.  Padded
weight/scale/bias columns are zero, which keeps LayerNorm statistics (masked
by construction: zero-padded activations contribute zero to sum and sum-of-
squares, and the true fan-in is used as the divisor) and all downstream
matmuls exact.

VMEM budget at the flagship config (H=600, latent 32x32, hiddens 200,
bfloat16 compute): ~9 MB of weights + ~1.5 MB of per-step buffers — fits the
~16 MB/core budget.  float32 compute at flagship shapes does NOT fit; the
wrapper asserts and callers fall back to the XLA scan (parity tests run the
kernel at small dims where f32 fits).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def _ceil(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _Dims(NamedTuple):
    """Static layout: true and padded sizes (all padded dims lane-aligned)."""

    B: int
    Bp: int
    H: int      # GRU hidden
    Hp: int
    Z: int      # latent rows*classes
    rows: int
    classes: int
    A: int      # action dim
    Ap: int
    AH: int     # actor hidden width (both layers)
    AHp: int
    DH: int     # dyn hidden width
    DHp: int
    horizon: int
    unimix: float
    min_std: float
    dtype: Any


def _pad2(a, rows, cols):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def _pad_row(a, cols):
    return jnp.pad(a, (0, cols - a.shape[0])).reshape(1, cols)


def _prep_weights(params, d: _Dims):
    """Split/pad/cast every weight once on the host side of the call.

    Concat-consuming kernels are split at the concat boundary; GRU fused
    (in, 3H) kernels are split per gate (r, z, n) so gate slicing inside the
    kernel never crosses a padded boundary.  Matmul operands are cast to the
    compute dtype HERE (matching the XLA path's `.astype(x.dtype)` at use);
    LayerNorm scale/bias and all biases stay f32 (flax keeps LN math f32 and
    the XLA path adds biases in compute dtype — biases are therefore cast).
    """
    ap, dp, gp = params["actor"], params["dyn"], params["gru"]
    c = lambda w: w.astype(d.dtype)

    def split_rows(w, split):
        return w[:split], w[split:]

    # Actor Dense_0 consumes [h ‖ z].
    a0_h, a0_z = split_rows(ap["Dense_0"]["kernel"], d.H)
    # GRU consumes [z ‖ action]; per-gate blocks of the fused (in, 3H) kernels.
    def gates(w):
        return w[:, : d.H], w[:, d.H: 2 * d.H], w[:, 2 * d.H:]

    wi_z, wi_a = split_rows(gp["kernel_i"], d.Z)
    gi_z = [c(_pad2(w, d.Z, d.Hp)) for w in gates(wi_z)]
    gi_a = [c(_pad2(w, d.Ap, d.Hp)) for w in gates(wi_a)]
    gh = [c(_pad2(w, d.Hp, d.Hp)) for w in gates(gp["kernel_h"])]
    gbi = [c(_pad_row(b, d.Hp)) for b in
           (gp["bias_i"][: d.H], gp["bias_i"][d.H: 2 * d.H], gp["bias_i"][2 * d.H:])]
    gbh = [c(_pad_row(b, d.Hp)) for b in
           (gp["bias_h"][: d.H], gp["bias_h"][d.H: 2 * d.H], gp["bias_h"][2 * d.H:])]

    ops = [
        # --- actor ---
        c(_pad2(a0_h, d.Hp, d.AHp)), c(_pad2(a0_z, d.Z, d.AHp)),
        c(_pad_row(ap["Dense_0"]["bias"], d.AHp)),
        _pad_row(ap["LayerNorm_0"]["scale"], d.AHp).astype(f32),
        _pad_row(ap["LayerNorm_0"]["bias"], d.AHp).astype(f32),
        c(_pad2(ap["Dense_1"]["kernel"], d.AHp, d.AHp)),
        c(_pad_row(ap["Dense_1"]["bias"], d.AHp)),
        _pad_row(ap["LayerNorm_1"]["scale"], d.AHp).astype(f32),
        _pad_row(ap["LayerNorm_1"]["bias"], d.AHp).astype(f32),
        c(_pad2(ap["mu_head"]["kernel"], d.AHp, d.Ap)),
        c(_pad_row(ap["mu_head"]["bias"], d.Ap)),
        c(_pad2(ap["log_sig_head"]["kernel"], d.AHp, d.Ap)),
        c(_pad_row(ap["log_sig_head"]["bias"], d.Ap)),
        # --- gru (r, z, n per-gate blocks) ---
        *gi_z, *gi_a, *gh, *gbi, *gbh,
        # --- dyn prior head ---
        c(_pad2(dp["Dense_0"]["kernel"], d.Hp, d.DHp)),
        c(_pad_row(dp["Dense_0"]["bias"], d.DHp)),
        _pad_row(dp["LayerNorm_0"]["scale"], d.DHp).astype(f32),
        _pad_row(dp["LayerNorm_0"]["bias"], d.DHp).astype(f32),
        c(_pad2(dp["Dense_1"]["kernel"], d.DHp, d.DHp)),
        c(_pad_row(dp["Dense_1"]["bias"], d.DHp)),
        _pad_row(dp["LayerNorm_1"]["scale"], d.DHp).astype(f32),
        _pad_row(dp["LayerNorm_1"]["bias"], d.DHp).astype(f32),
        c(_pad2(dp["Dense_2"]["kernel"], d.DHp, d.Z)),
        c(_pad_row(dp["Dense_2"]["bias"], d.Z)),
    ]
    return ops


_N_WEIGHTS = 13 + 15 + 10  # actor + gru + dyn operand counts above


def _ln_silu(x_f32, scale_ref, bias_ref, true_width: int):
    """LayerNorm (flax op order, f32 stats over the TRUE width — zero padding
    contributes zero to both sums) + SiLU, returning f32 output.
    Matches fused_scans._layernorm + jax.nn.silu (up to reduction order)."""
    n = jnp.asarray(true_width, f32)
    mu = jnp.sum(x_f32, axis=-1, keepdims=True) / n
    var = jnp.maximum(0.0, jnp.sum(x_f32 * x_f32, axis=-1, keepdims=True) / n
                      - mu * mu)
    y = (x_f32 - mu) * (jax.lax.rsqrt(var + 1e-5) * scale_ref[:]) + bias_ref[:]
    return jax.nn.silu(y)


def _split_dense(x1, w1_ref, x2, w2_ref, b_ref, out_dtype):
    """Dense over a CONCAT input as two f32-accumulated partial contractions
    (one rounding to the compute dtype, then the bias add in compute dtype —
    the closest match to XLA's single full-width dot + bias)."""
    s = (jnp.dot(x1, w1_ref[:], preferred_element_type=f32)
         + jnp.dot(x2, w2_ref[:], preferred_element_type=f32))
    return s.astype(out_dtype) + b_ref[:].astype(out_dtype)


def _dense_ref(x, w_ref, b_ref, out_dtype):
    """nn.Dense matching fused_scans._dense exactly: an XLA bf16 dot IS an
    f32-accumulated contraction rounded to bf16 (Mosaic additionally REQUIRES
    the 32-bit accumulator to be explicit), then the bias add in compute
    dtype."""
    s = jnp.dot(x, w_ref[:], preferred_element_type=f32)
    return s.astype(out_dtype) + b_ref[:].astype(out_dtype)


def _imagine_kernel(d: _Dims,
                    eps_ref, gum_ref,
                    a0h_ref, a0z_ref, a0b_ref, aln0s_ref, aln0b_ref,
                    a1_ref, a1b_ref, aln1s_ref, aln1b_ref,
                    amu_ref, amub_ref, asig_ref, asigb_ref,
                    gizr_ref, gizz_ref, gizn_ref,
                    giar_ref, giaz_ref, gian_ref,
                    ghr_ref, ghz_ref, ghn_ref,
                    gbir_ref, gbiz_ref, gbin_ref,
                    gbhr_ref, gbhz_ref, gbhn_ref,
                    d0_ref, d0b_ref, dln0s_ref, dln0b_ref,
                    d1_ref, d1b_ref, dln1s_ref, dln1b_ref,
                    d2_ref, d2b_ref,
                    h0_ref, z0_ref,
                    hseq_ref, zseq_ref, aseq_ref, museq_ref, sigseq_ref,
                    hfin_ref, zfin_ref,
                    h_c, z_c):
    t = pl.program_id(0)
    dt = d.dtype

    @pl.when(t == 0)
    def _():
        h_c[:] = h0_ref[:]
        z_c[:] = z0_ref[:]

    h = h_c[:]                      # (Bp, Hp) f32 — pre-step state
    z = z_c[:]                      # (Bp, Zp=Z) f32
    hseq_ref[0] = h
    zseq_ref[0] = z

    # ---- actor: [h ‖ z] -> mu, sigma (split matmuls; LN over true width) ----
    hd, zd = h.astype(dt), z.astype(dt)
    a_pre = _split_dense(hd, a0h_ref, zd, a0z_ref, a0b_ref, dt)
    a1 = _ln_silu(a_pre.astype(f32), aln0s_ref, aln0b_ref, d.AH).astype(dt)
    a_pre2 = _dense_ref(a1, a1_ref, a1b_ref, dt)
    a2 = _ln_silu(a_pre2.astype(f32), aln1s_ref, aln1b_ref, d.AH).astype(dt)
    mu = _dense_ref(a2, amu_ref, amub_ref, dt).astype(f32)
    sig_raw = _dense_ref(a2, asig_ref, asigb_ref, dt).astype(f32)
    sigma = jax.nn.softplus(jnp.clip(sig_raw, -5.0, 2.0)) + d.min_std
    action = jnp.tanh(mu + sigma * eps_ref[0])          # (Bp, Ap) f32
    # Padded action lanes: tanh(0 + sigma_pad * 0) = 0 (eps padding is zero).
    museq_ref[0] = mu
    sigseq_ref[0] = sigma
    aseq_ref[0] = action

    # ---- GRU on x = [z ‖ action] (per-gate split matmuls) ----
    ad = action.astype(dt)
    gi_r = _split_dense(zd, gizr_ref, ad, giar_ref, gbir_ref, dt)
    gi_z = _split_dense(zd, gizz_ref, ad, giaz_ref, gbiz_ref, dt)
    gi_n = _split_dense(zd, gizn_ref, ad, gian_ref, gbin_ref, dt)
    gh_r = _dense_ref(hd, ghr_ref, gbhr_ref, dt)
    gh_z = _dense_ref(hd, ghz_ref, gbhz_ref, dt)
    gh_n = _dense_ref(hd, ghn_ref, gbhn_ref, dt)
    # Gate elementwise math in f32: Mosaic's bf16 logistic lowering is broken
    # (f32->bf16 vector.broadcast verification error), and the XLA path's
    # extra bf16 roundings here only LOSE precision — the pre-activations are
    # already bf16-rounded, so values agree within bf16 eps (tested).
    r = jax.nn.sigmoid(gi_r.astype(f32) + gh_r.astype(f32))
    zz = jax.nn.sigmoid(gi_z.astype(f32) + gh_z.astype(f32))
    n = jnp.tanh(gi_n.astype(f32) + r * gh_n.astype(f32))
    h_next = (1.0 - zz) * n + zz * h                    # (Bp, Hp) f32
    # Padded columns: biases are zero-padded => gates sigmoid(0)=.5, tanh(0)=0,
    # h padding 0 => h_next padding 0.  (Exactly zero, so the next step's
    # matmuls see clean padding.)

    # ---- dynamics prior -> unimix STE categorical sample ----
    hn_d = h_next.astype(dt)
    d_pre = _dense_ref(hn_d, d0_ref, d0b_ref, dt)
    d1 = _ln_silu(d_pre.astype(f32), dln0s_ref, dln0b_ref, d.DH).astype(dt)
    d_pre2 = _dense_ref(d1, d1_ref, d1b_ref, dt)
    d2 = _ln_silu(d_pre2.astype(f32), dln1s_ref, dln1b_ref, d.DH).astype(dt)
    logits = _dense_ref(d2, d2_ref, d2b_ref, dt).astype(f32)  # (Bp, Z)

    # Group softmax/argmax over the classes of each latent row.  Mosaic
    # cannot split the minor (lane) dim — (B, 1024) -> (B, 32, 32) is an
    # unsupported shape cast — so transpose first: with batch on lanes,
    # splitting Z = rows x classes only touches MAJOR dims, and the class
    # reductions become sublane reductions.
    lg3 = logits.T.reshape(d.rows, d.classes, d.Bp)     # [row, class, b]
    m = jnp.max(lg3, axis=1, keepdims=True)
    e = jnp.exp(lg3 - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)
    k = d.classes
    probs = (1.0 - d.unimix) * probs + d.unimix / k     # core.dists.unimix_probs
    gum3 = gum_ref[0].T.reshape(d.rows, d.classes, d.Bp)
    scores = jnp.log(probs) + gum3
    best = jnp.max(scores, axis=1, keepdims=True)
    class_ids = jax.lax.broadcasted_iota(jnp.int32, (d.rows, d.classes, d.Bp), 1)
    # argmax with first-index tie-breaking (== jnp.argmax == categorical):
    winner = jnp.min(jnp.where(scores >= best, class_ids, k), axis=1,
                     keepdims=True)
    onehot = (class_ids == winner).astype(f32)
    z_next = ((onehot + probs) - probs).reshape(d.Z, d.Bp).T  # STE fwd value

    h_c[:] = h_next
    z_c[:] = z_next
    hfin_ref[:] = h_next
    zfin_ref[:] = z_next


def imagine_rollout_pallas(params: Dict[str, Any], h0, z0, eps, gum, *,
                           rows: int, classes: int, unimix: float,
                           min_std: float, dtype) -> tuple:
    """Run the full H-step imagination as one Pallas program.

    params: {"gru", "dyn", "actor"} flax subtrees (f32).
    h0 (B, H) f32; z0 (B, Z) f32; eps (T, B, A) f32; gum (T, B, rows, classes).
    Returns (h_fin, z_fin, h_seq, z_seq, a_seq, mu_seq, sig_seq) — identical
    layout/semantics to fused_scans._imagine_fwd's forward value.
    """
    T, B, A = eps.shape
    H = h0.shape[-1]
    Z = z0.shape[-1]
    AH = params["actor"]["Dense_0"]["bias"].shape[0]
    DH = params["dyn"]["Dense_0"]["bias"].shape[0]
    assert Z == rows * classes, (Z, rows, classes)
    sub = 8  # carries/outputs are f32
    d = _Dims(B=B, Bp=_ceil(B, sub), H=H, Hp=_ceil(H, 128), Z=Z,
              rows=rows, classes=classes, A=A, Ap=_ceil(A, 128),
              AH=AH, AHp=_ceil(AH, 128), DH=DH, DHp=_ceil(DH, 128),
              horizon=T, unimix=unimix, min_std=min_std, dtype=dtype)
    # The latent must itself be lane-clean: rows*classes stays unpadded as a
    # flat (B, Z) operand, so Z must be a lane multiple (32x32=1024 is).
    assert Z % 128 == 0, f"latent dim {Z} must be a multiple of 128"

    weights = _prep_weights(params, d)
    eps_p = jnp.pad(eps.astype(f32), ((0, 0), (0, d.Bp - B), (0, d.Ap - A)))
    gum_p = jnp.pad(gum.astype(f32).reshape(T, B, Z),
                    ((0, 0), (0, d.Bp - B), (0, 0)))
    h0_p = _pad2(h0.astype(f32), d.Bp, d.Hp)
    z0_p = _pad2(z0.astype(f32), d.Bp, d.Z)

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    step3 = lambda cols: pl.BlockSpec((1, d.Bp, cols), lambda t: (t, 0, 0),
                                      memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda t: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)

    in_specs = ([step3(d.Ap), step3(d.Z)]
                + [const(w.shape) for w in weights]
                + [const((d.Bp, d.Hp)), const((d.Bp, d.Z))])
    out_shape = (
        jax.ShapeDtypeStruct((T, d.Bp, d.Hp), f32),   # h_seq (pre-step)
        jax.ShapeDtypeStruct((T, d.Bp, d.Z), f32),    # z_seq (pre-step)
        jax.ShapeDtypeStruct((T, d.Bp, d.Ap), f32),   # actions
        jax.ShapeDtypeStruct((T, d.Bp, d.Ap), f32),   # mu
        jax.ShapeDtypeStruct((T, d.Bp, d.Ap), f32),   # sigma
        jax.ShapeDtypeStruct((d.Bp, d.Hp), f32),      # h_fin
        jax.ShapeDtypeStruct((d.Bp, d.Z), f32),       # z_fin
    )
    out_specs = (step3(d.Hp), step3(d.Z), step3(d.Ap), step3(d.Ap),
                 step3(d.Ap), const((d.Bp, d.Hp)), const((d.Bp, d.Z)))

    outs = pl.pallas_call(
        functools.partial(_imagine_kernel, d),
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((d.Bp, d.Hp), f32),
                        pltpu.VMEM((d.Bp, d.Z), f32)],
    )(eps_p, gum_p, *weights, h0_p, z0_p)

    h_seq, z_seq, a_seq, mu_seq, sig_seq, h_fin, z_fin = outs
    cb, ca, ch = (slice(None, B), slice(None, A), slice(None, H))
    return (h_fin[cb, ch], z_fin[cb, :],
            h_seq[:, cb, ch], z_seq[:, cb, :], a_seq[:, cb, ca],
            mu_seq[:, cb, ca], sig_seq[:, cb, ca])
