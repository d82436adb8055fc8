"""RSSM time scans with DEFERRED weight gradients (custom VJP).

Why this exists (measured on TPU v5e, tools/xprof_summary.py): the default
``lax.scan`` transpose accumulates full weight-gradient matrices in the
backward loop carry — f32[1027,1800] for the GRU input kernel alone, plus
every actor/dynamics-head kernel — costing ~15 MB of HBM read+write per
timestep and a chain of tiny (in,B)x(B,out) outer-product matmuls that leave
the MXU idle.  The imagination scan's backward while-loop was the single
hottest op in the fused learner iteration (~20 ms of 34 ms).

These custom-VJP scans restructure the backward pass the TPU-native way:

- the reverse-time scan computes ONLY the carry/input cotangents (small
  matmuls against W^T, same shape as the forward) and EMITS the per-step
  pre-activation gradients ("taps") and layer inputs as stacked outputs;
- every weight gradient is then ONE MXU-shaped contraction over the
  flattened (T*B) axis: dW = einsum('tbi,tbo->io', acts, dtaps) — 30 outer
  products become one (in x 1500) @ (1500 x out) matmul;
- LayerNorm scale/bias gradients reduce over the saved normalized inputs.

Numerical semantics are IDENTICAL to autodiff through the module-based scans
(same forward ops, same gradient formulas — only the summation order of the
weight-gradient reduction differs); tests/test_fused_scans.py asserts
forward bit-parity and gradient allclose against the autodiff path.

Parameter trees are the flax trees of dreamer_tpu.nets (WMNets / Actor):
  gru:   {kernel_i (in,3H), kernel_h (H,3H), bias_i, bias_h}   [nets/gru.py]
  MLP:   {Dense_0, LayerNorm_0, ..., Dense_n}                   [nets/mlp.py]
  actor: {Dense_0, LayerNorm_0, Dense_1, LayerNorm_1, mu_head, log_sig_head}

RNG parity: callers precompute the per-step normal/gumbel draws with the
same key-split structure the module scans used (jax.random.categorical IS
argmax(gumbel(key) + logits)), so sampled trajectories are bit-identical to
the non-fused path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dreamer_tpu.core.dists import actor_mu_sigma, unimix_probs

f32 = jnp.float32


# --------------------------------------------------------------------------- #
# Raw layer primitives mirroring flax semantics exactly (nets/mlp.py, gru.py)
# --------------------------------------------------------------------------- #


def _dense(p: Dict[str, jnp.ndarray], x: jnp.ndarray, tap: jnp.ndarray | None):
    """nn.Dense with dtype=x.dtype: params cast to the compute dtype."""
    y = x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return y if tap is None else y + tap.astype(y.dtype)


def _layernorm(p: Dict[str, jnp.ndarray], x: jnp.ndarray,
               tap: jnp.ndarray | None, eps: float = 1e-5):
    """nn.LayerNorm(eps=1e-5): stats forced to f32, y cast back to x.dtype.

    Matches flax's op order: y = (x - mu) * (rsqrt(var+eps) * scale) + bias,
    with fast variance max(0, E[x^2] - E[x]^2) (flax _compute_stats).
    """
    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * p["scale"]
    y = (xf - mu) * mul + p["bias"]
    if tap is not None:
        y = y + tap
    return y.astype(x.dtype)


def _ln_xhat(p: Dict[str, jnp.ndarray], x: jnp.ndarray, eps: float = 1e-5):
    """The normalized input xhat = (x - mu) * rsqrt(var + eps), for dscale."""
    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


def _gru_core(p, x, h, tap_gi, tap_gh):
    """Torch-semantics GRU cell on pre-cast inputs (nets/gru.py gru_cell_core)
    with taps at the two fused gate pre-activations."""
    gi = x @ p["kernel_i"].astype(x.dtype) + p["bias_i"].astype(x.dtype)
    gh = h @ p["kernel_h"].astype(h.dtype) + p["bias_h"].astype(h.dtype)
    if tap_gi is not None:
        gi = gi + tap_gi.astype(gi.dtype)
        gh = gh + tap_gh.astype(gh.dtype)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _mlp(p: Dict[str, Any], x: jnp.ndarray, n_hidden: int, prefix: str,
         taps: Dict[str, jnp.ndarray] | None, acts: Dict[str, jnp.ndarray] | None):
    """nets/mlp.MLP: [Dense -> LayerNorm -> SiLU] x n_hidden + final Dense.

    Records layer inputs into ``acts`` (for the deferred dW contraction) and
    adds ``taps`` at every Dense/LayerNorm output when provided.
    """
    t = (lambda name: taps[prefix + name]) if taps is not None else (lambda name: None)
    for i in range(n_hidden):
        if acts is not None:
            acts[prefix + f"Dense_{i}"] = x
        pre = _dense(p[f"Dense_{i}"], x, t(f"Dense_{i}"))
        if acts is not None:
            acts[prefix + f"LayerNorm_{i}"] = pre
        x = jax.nn.silu(_layernorm(p[f"LayerNorm_{i}"], pre, t(f"LayerNorm_{i}")))
    if acts is not None:
        acts[prefix + f"Dense_{n_hidden}"] = x
    return _dense(p[f"Dense_{n_hidden}"], x, t(f"Dense_{n_hidden}"))


def _sample_ste(probs: jnp.ndarray, gumbel: jnp.ndarray) -> jnp.ndarray:
    """STE one-hot with a precomputed gumbel draw == jax.random.categorical."""
    idx = jnp.argmax(jnp.log(probs) + gumbel, axis=-1)
    onehot = jax.nn.one_hot(idx, probs.shape[-1], dtype=probs.dtype)
    return onehot + probs - jax.lax.stop_gradient(probs)


# --------------------------------------------------------------------------- #
# Deferred-dW assembly
# --------------------------------------------------------------------------- #


def _dense_grads(acts: jnp.ndarray, dtaps: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """dW = acts^T dpre over the flattened (T*B) axis; db = sum(dpre)."""
    dw = jnp.einsum("tbi,tbo->io", acts, dtaps.astype(acts.dtype),
                    preferred_element_type=f32)
    return {"kernel": dw, "bias": jnp.sum(dtaps.astype(f32), axis=(0, 1))}


def _ln_grads(pre_acts: jnp.ndarray, p_ln, dtaps: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """dscale = sum(dtap * xhat); dbias = sum(dtap) — xhat recomputed."""
    xhat = _ln_xhat(p_ln, pre_acts)
    d = dtaps.astype(f32)
    return {"scale": jnp.sum(d * xhat, axis=(0, 1)),
            "bias": jnp.sum(d, axis=(0, 1))}


def _mlp_grads(p, n_hidden: int, prefix: str, acts, dtaps) -> Dict[str, Any]:
    out = {}
    for i in range(n_hidden):
        out[f"Dense_{i}"] = _dense_grads(acts[prefix + f"Dense_{i}"],
                                         dtaps[prefix + f"Dense_{i}"])
        out[f"LayerNorm_{i}"] = _ln_grads(acts[prefix + f"LayerNorm_{i}"],
                                          p[f"LayerNorm_{i}"],
                                          dtaps[prefix + f"LayerNorm_{i}"])
    out[f"Dense_{n_hidden}"] = _dense_grads(acts[prefix + f"Dense_{n_hidden}"],
                                            dtaps[prefix + f"Dense_{n_hidden}"])
    return out


def _zeros_taps(shapes: Dict[str, Tuple[int, ...]], dtype) -> Dict[str, jnp.ndarray]:
    return {k: jnp.zeros(s, dtype) for k, s in shapes.items()}


# --------------------------------------------------------------------------- #
# Imagination scan (rssm.imagine fused path)
# --------------------------------------------------------------------------- #


class _ImagineCfg(NamedTuple):
    horizon: int
    unimix: float
    latent_dim: int
    rows: int
    classes: int
    dtype: Any
    unroll: int
    n_actor_hidden: int = 2
    n_dyn_hidden: int = 2
    min_std: float = 1e-3   # policy sigma floor (must match Actor.min_std)


def _imagine_step(params, cfg: _ImagineCfg, carry, eps, gum, taps, want_acts):
    """One imagination step in raw jnp; mirrors rssm.imagine's scan body +
    Actor.__call__ exactly (same op order / dtypes)."""
    h, z = carry
    acts = {} if want_acts else None
    gp, dp, ap = params["gru"], params["dyn"], params["actor"]
    t = (lambda name: taps[name]) if taps is not None else (lambda name: None)

    # Actor (nets/actor_critic.Actor): [h ‖ z] -> (mu, sigma), f32 outputs.
    xa = jnp.concatenate([h, z], axis=-1).astype(cfg.dtype)
    if acts is not None:
        acts["a.Dense_0"] = xa
    a1pre = _dense(ap["Dense_0"], xa, t("a.Dense_0"))
    if acts is not None:
        acts["a.LayerNorm_0"] = a1pre
    a1 = jax.nn.silu(_layernorm(ap["LayerNorm_0"], a1pre, t("a.LayerNorm_0")))
    if acts is not None:
        acts["a.Dense_1"] = a1
    a2pre = _dense(ap["Dense_1"], a1, t("a.Dense_1"))
    if acts is not None:
        acts["a.LayerNorm_1"] = a2pre
    a2 = jax.nn.silu(_layernorm(ap["LayerNorm_1"], a2pre, t("a.LayerNorm_1")))
    if acts is not None:
        acts["a.head_in"] = a2   # shared input of mu_head AND log_sig_head
    mu_raw = _dense(ap["mu_head"], a2, t("a.mu_head")).astype(f32)
    sig_raw = _dense(ap["log_sig_head"], a2, t("a.log_sig_head")).astype(f32)
    mu, sigma = actor_mu_sigma(mu_raw, sig_raw, min_std=cfg.min_std)

    # rsample (core/dists.tanh_normal_sample with precomputed eps)
    action = jnp.tanh(mu + sigma * eps)

    # GRU step (WMNets.gru_step): x = [z ‖ a] cast to compute dtype.
    xg = jnp.concatenate([z, action], axis=-1).astype(cfg.dtype)
    hg = h.astype(cfg.dtype)
    if acts is not None:
        acts["g.i"] = xg
        acts["g.h"] = hg
    h_next = _gru_core(gp, xg, hg, t("g.i"), t("g.h")).astype(f32)

    # Prior head (WMNets.prior_logits = dyn MLP on h'), then unimix STE sample.
    logits = _mlp(dp, h_next.astype(cfg.dtype), cfg.n_dyn_hidden, "d.", taps, acts)
    logits = logits.reshape(logits.shape[:-1] + (cfg.rows, cfg.classes))
    probs = unimix_probs(logits, cfg.unimix)
    z_next = _sample_ste(probs, gum).reshape(z.shape[:-1] + (cfg.latent_dim,))

    return (h_next, z_next), (h, z, action, mu, sigma), acts


def _imagine_tap_shapes(params, B: int) -> Dict[str, Tuple[int, ...]]:
    ap, dp, gp = params["actor"], params["dyn"], params["gru"]
    shapes = {}
    for i in range(2):
        shapes[f"a.Dense_{i}"] = (B, ap[f"Dense_{i}"]["bias"].shape[0])
        shapes[f"a.LayerNorm_{i}"] = (B, ap[f"LayerNorm_{i}"]["bias"].shape[0])
        shapes[f"d.Dense_{i}"] = (B, dp[f"Dense_{i}"]["bias"].shape[0])
        shapes[f"d.LayerNorm_{i}"] = (B, dp[f"LayerNorm_{i}"]["bias"].shape[0])
    shapes["a.mu_head"] = (B, ap["mu_head"]["bias"].shape[0])
    shapes["a.log_sig_head"] = (B, ap["log_sig_head"]["bias"].shape[0])
    shapes["d.Dense_2"] = (B, dp["Dense_2"]["bias"].shape[0])
    shapes["g.i"] = (B, gp["bias_i"].shape[0])
    shapes["g.h"] = (B, gp["bias_h"].shape[0])
    return shapes


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def imagine_scan(cfg: _ImagineCfg, params, h0, z0, eps, gum):
    """H-step imagination.  params = {gru, dyn, actor} flax subtrees (f32).

    eps: (H, B, A) normal draws; gum: (H, B, rows, classes) gumbel draws.
    Returns (h_fin, z_fin, h_seq, z_seq, a_seq, mu_seq, sig_seq), sequences
    time-major (H, B, ...) with h_seq[t] the PRE-step state (as rssm.imagine).
    """
    return _imagine_fwd(cfg, params, h0, z0, eps, gum)[0]


def _imagine_fwd(cfg, params, h0, z0, eps, gum):
    def step(carry, xs):
        e, g = xs
        carry2, ys, _ = _imagine_step(params, cfg, carry, e, g, None, False)
        return carry2, ys

    (h_fin, z_fin), ys = jax.lax.scan(step, (h0, z0), (eps, gum),
                                      unroll=cfg.unroll)
    out = (h_fin, z_fin) + ys
    return out, (params, h0, z0, eps, gum, ys[0], ys[1])


def _imagine_bwd(cfg, res, cots):
    params, h0, z0, eps, gum, h_seq, z_seq = res
    d_hfin, d_zfin, d_hseq, d_zseq, d_aseq, d_museq, d_sigseq = cots
    B = h0.shape[0]
    tap_shapes = _imagine_tap_shapes(params, B)
    zero_taps = _zeros_taps(tap_shapes, f32)

    def bwd_step(carry, xs):
        dh_next, dz_next = carry
        h_t, z_t, e_t, g_t, dh_t, dz_t, da_t, dmu_t, dsig_t = xs

        def f(c, taps):
            carry2, ys, acts = _imagine_step(params, cfg, c, e_t, g_t, taps, True)
            return (carry2, ys), acts

        _, pullback, acts = jax.vjp(f, (h_t, z_t), zero_taps, has_aux=True)
        cot = ((dh_next, dz_next), (dh_t, dz_t, da_t, dmu_t, dsig_t))
        (dc, dtaps) = pullback(cot)
        return dc, (dtaps, acts)

    # reverse=True walks xs back-to-front in place — no flipped copies of the
    # nine stacked arrays (materialized %reverse ops in the profile).
    xs = (h_seq, z_seq, eps, gum, d_hseq, d_zseq, d_aseq, d_museq, d_sigseq)
    (dh0, dz0), (dtaps, acts) = jax.lax.scan(
        bwd_step, (d_hfin, d_zfin), xs, unroll=cfg.unroll, reverse=True)

    dactor = _actor_grads(params["actor"], acts, dtaps)
    ddyn = _mlp_grads(params["dyn"], cfg.n_dyn_hidden, "d.", acts, dtaps)
    dgru = {
        "kernel_i": jnp.einsum("tbi,tbo->io", acts["g.i"],
                               dtaps["g.i"].astype(acts["g.i"].dtype),
                               preferred_element_type=f32),
        "bias_i": jnp.sum(dtaps["g.i"].astype(f32), axis=(0, 1)),
        "kernel_h": jnp.einsum("tbi,tbo->io", acts["g.h"],
                               dtaps["g.h"].astype(acts["g.h"].dtype),
                               preferred_element_type=f32),
        "bias_h": jnp.sum(dtaps["g.h"].astype(f32), axis=(0, 1)),
    }
    dparams = {"gru": dgru, "dyn": ddyn, "actor": dactor}
    return (dparams, dh0, dz0, jnp.zeros_like(eps), jnp.zeros_like(gum))


def _actor_grads(ap, acts, dtaps):
    """Actor trunk = the standard MLP trunk (reuse _mlp_grads' per-layer
    assembly) + the two heads, whose shared input activation is stored ONCE
    ('a.head_in') and contracted against each head's dtaps."""
    out = {}
    for i in range(2):
        out[f"Dense_{i}"] = _dense_grads(acts[f"a.Dense_{i}"], dtaps[f"a.Dense_{i}"])
        out[f"LayerNorm_{i}"] = _ln_grads(acts[f"a.LayerNorm_{i}"],
                                          ap[f"LayerNorm_{i}"],
                                          dtaps[f"a.LayerNorm_{i}"])
    out["mu_head"] = _dense_grads(acts["a.head_in"], dtaps["a.mu_head"])
    out["log_sig_head"] = _dense_grads(acts["a.head_in"], dtaps["a.log_sig_head"])
    return out


imagine_scan.defvjp(_imagine_fwd, _imagine_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def imagine_scan_pallas(cfg: _ImagineCfg, params, h0, z0, eps, gum):
    """imagine_scan with the FORWARD as one whole-rollout Pallas kernel
    (ops/imagine_pallas: grid over time, weights VMEM-resident) and the SAME
    deferred-dW backward — its residuals are only (params, h0, z0, eps, gum,
    h_seq, z_seq), all of which the kernel emits.

    Per-step math is op-equivalent; whole-rollout outputs are not bit-equal
    to the XLA scan (reduction-order noise amplifies through the recurrence
    and can eventually flip a sampled category) — single-step parity is exact
    on TPU (tools/try_imagine_pallas --horizon 1) and whole-scan parity holds
    in interpret mode (tests/test_imagine_pallas.py)."""
    return _imagine_pallas_fwd(cfg, params, h0, z0, eps, gum)[0]


def _imagine_pallas_fwd(cfg, params, h0, z0, eps, gum):
    from dreamer_tpu.ops.imagine_pallas import imagine_rollout_pallas

    out = imagine_rollout_pallas(
        params, h0, z0, eps, gum, rows=cfg.rows, classes=cfg.classes,
        unimix=cfg.unimix, min_std=cfg.min_std, dtype=cfg.dtype)
    h_seq, z_seq = out[2], out[3]
    return out, (params, h0, z0, eps, gum, h_seq, z_seq)


imagine_scan_pallas.defvjp(_imagine_pallas_fwd, _imagine_bwd)


# --------------------------------------------------------------------------- #
# Posterior (observe) scan (rssm.observe_sequence fused path)
# --------------------------------------------------------------------------- #


class _ObserveCfg(NamedTuple):
    unimix: float
    latent_dim: int
    rows: int
    classes: int
    dtype: Any
    unroll: int
    n_post_hidden: int = 1


def _observe_step(params, cfg: _ObserveCfg, carry, feat, a_prev, gum, taps, want_acts):
    """One posterior step: h' = GRU([z‖a], h); z' ~ q(.|feat, h').

    Mirrors rssm.observe_sequence's scan body (gru_step + posterior_logits +
    _sample) exactly.
    """
    h, z = carry
    acts = {} if want_acts else None
    gp, pp = params["gru"], params["post"]
    t = (lambda name: taps[name]) if taps is not None else (lambda name: None)

    xg = jnp.concatenate([z, a_prev], axis=-1).astype(cfg.dtype)
    hg = h.astype(cfg.dtype)
    if acts is not None:
        acts["g.i"] = xg
        acts["g.h"] = hg
    h_next = _gru_core(gp, xg, hg, t("g.i"), t("g.h")).astype(f32)

    # WMNets.posterior_logits: [feat ‖ h'] through the posterior MLP.
    xp = jnp.concatenate([feat, h_next.astype(cfg.dtype)], axis=-1)
    logits = _mlp(pp, xp, cfg.n_post_hidden, "p.", taps, acts)
    logits = logits.reshape(logits.shape[:-1] + (cfg.rows, cfg.classes))
    probs = unimix_probs(logits, cfg.unimix)
    z_next = _sample_ste(probs, gum).reshape(z.shape[:-1] + (cfg.latent_dim,))

    return (h_next, z_next), (h_next, z_next, logits), acts


def _observe_tap_shapes(params, B: int) -> Dict[str, Tuple[int, ...]]:
    gp, pp = params["gru"], params["post"]
    return {
        "g.i": (B, gp["bias_i"].shape[0]),
        "g.h": (B, gp["bias_h"].shape[0]),
        "p.Dense_0": (B, pp["Dense_0"]["bias"].shape[0]),
        "p.LayerNorm_0": (B, pp["LayerNorm_0"]["bias"].shape[0]),
        "p.Dense_1": (B, pp["Dense_1"]["bias"].shape[0]),
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def observe_scan(cfg: _ObserveCfg, params, h0, z0, feats, a_in, gum):
    """T-step posterior unroll.  params = {gru, post} flax subtrees.

    feats: (T, B, F) encoder features (compute dtype); a_in: (T, B, A) f32
    previous actions; gum: (T, B, rows, classes) gumbel draws.
    Returns (h_seq, z_seq, logits_seq) time-major; h_seq[t] is the POST-step
    state (as rssm.observe_sequence).
    """
    return _observe_fwd(cfg, params, h0, z0, feats, a_in, gum)[0]


def _observe_fwd(cfg, params, h0, z0, feats, a_in, gum):
    def step(carry, xs):
        ft, at, gt = xs
        carry2, ys, _ = _observe_step(params, cfg, carry, ft, at, gt, None, False)
        return carry2, ys

    _, ys = jax.lax.scan(step, (h0, z0), (feats, a_in, gum), unroll=cfg.unroll)
    h_seq, z_seq, logit_seq = ys
    return ys, (params, h0, z0, feats, a_in, gum, h_seq, z_seq)


def _observe_bwd(cfg, res, cots):
    params, h0, z0, feats, a_in, gum, h_seq, z_seq = res
    d_hseq, d_zseq, d_logitseq = cots
    B = h0.shape[0]
    zero_taps = _zeros_taps(_observe_tap_shapes(params, B), f32)

    # Pre-step carries: carry entering step t is the output of step t-1.
    h_prev = jnp.concatenate([h0[None], h_seq[:-1]], axis=0)
    z_prev = jnp.concatenate([z0[None], z_seq[:-1]], axis=0)

    def bwd_step(carry, xs):
        dh_next, dz_next = carry
        h_t, z_t, f_t, a_t, g_t, dh_t, dz_t, dl_t = xs

        def f(c, ft, taps):
            carry2, ys, acts = _observe_step(params, cfg, c, ft, a_t, g_t, taps, True)
            return (carry2, ys), acts

        _, pullback, acts = jax.vjp(f, (h_t, z_t), f_t, zero_taps, has_aux=True)
        cot = ((dh_next, dz_next), (dh_t, dz_t, dl_t))
        (dc, dfeat, dtaps) = pullback(cot)
        return dc, (dtaps, acts, dfeat)

    # reverse=True: xs consumed back-to-front with no flipped copies, and the
    # stacked ys (incl. dfeats) come out in natural time order.
    xs = (h_prev, z_prev, feats, a_in, gum, d_hseq, d_zseq, d_logitseq)
    (dh0, dz0), (dtaps, acts, dfeats) = jax.lax.scan(
        bwd_step, (jnp.zeros_like(h0), jnp.zeros_like(z0)), xs,
        unroll=cfg.unroll, reverse=True)

    dpost = _mlp_grads(params["post"], cfg.n_post_hidden, "p.", acts, dtaps)
    dgru = {
        "kernel_i": jnp.einsum("tbi,tbo->io", acts["g.i"],
                               dtaps["g.i"].astype(acts["g.i"].dtype),
                               preferred_element_type=f32),
        "bias_i": jnp.sum(dtaps["g.i"].astype(f32), axis=(0, 1)),
        "kernel_h": jnp.einsum("tbi,tbo->io", acts["g.h"],
                               dtaps["g.h"].astype(acts["g.h"].dtype),
                               preferred_element_type=f32),
        "bias_h": jnp.sum(dtaps["g.h"].astype(f32), axis=(0, 1)),
    }
    dparams = {"gru": dgru, "post": dpost}
    return (dparams, dh0, dz0, dfeats, jnp.zeros_like(a_in), jnp.zeros_like(gum))


observe_scan.defvjp(_observe_fwd, _observe_bwd)


# --------------------------------------------------------------------------- #
# Episode-boundary-reset variant (wm.reset_on_episode_start)
# --------------------------------------------------------------------------- #


def _observe_step_reset(params, cfg: _ObserveCfg, carry, feat, a_prev, gum,
                        f_t, taps, want_acts):
    """_observe_step with the episode-boundary reset applied FIRST: where
    is_first[t]=1 the incoming carry (h, z) and previous action are zeroed —
    the t=0 episode-start condition, applied mid-scan (rssm.observe_sequence
    docstring).  The mask lives inside this function so the backward's
    per-step jax.vjp cuts the carry cotangent at boundaries automatically."""
    h, z = carry
    m = (1.0 - f_t)[:, None]
    carry = (h * m, z * m)
    a_prev = a_prev * m.astype(a_prev.dtype)
    return _observe_step(params, cfg, carry, feat, a_prev, gum, taps, want_acts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def observe_scan_reset(cfg: _ObserveCfg, params, h0, z0, feats, a_in, gum,
                       is_first):
    """observe_scan + per-step episode-boundary resets (is_first: (T, B) f32).

    Kept as a SEPARATE entry point so non-terminating configs keep the
    unchanged observe_scan trace (and its compilation cache entries)."""
    return _observe_reset_fwd(cfg, params, h0, z0, feats, a_in, gum,
                              is_first)[0]


def _observe_reset_fwd(cfg, params, h0, z0, feats, a_in, gum, is_first):
    def step(carry, xs):
        ft, at, gt, bt = xs
        carry2, ys, _ = _observe_step_reset(params, cfg, carry, ft, at, gt,
                                            bt, None, False)
        return carry2, ys

    _, ys = jax.lax.scan(step, (h0, z0), (feats, a_in, gum, is_first),
                         unroll=cfg.unroll)
    h_seq, z_seq, _ = ys
    return ys, (params, h0, z0, feats, a_in, gum, is_first, h_seq, z_seq)


def _observe_reset_bwd(cfg, res, cots):
    params, h0, z0, feats, a_in, gum, is_first, h_seq, z_seq = res
    d_hseq, d_zseq, d_logitseq = cots
    B = h0.shape[0]
    zero_taps = _zeros_taps(_observe_tap_shapes(params, B), f32)

    h_prev = jnp.concatenate([h0[None], h_seq[:-1]], axis=0)
    z_prev = jnp.concatenate([z0[None], z_seq[:-1]], axis=0)

    def bwd_step(carry, xs):
        dh_next, dz_next = carry
        h_t, z_t, f_t, a_t, g_t, b_t, dh_t, dz_t, dl_t = xs

        def f(c, ft, taps):
            carry2, ys, acts = _observe_step_reset(params, cfg, c, ft, a_t,
                                                   g_t, b_t, taps, True)
            return (carry2, ys), acts

        _, pullback, acts = jax.vjp(f, (h_t, z_t), f_t, zero_taps, has_aux=True)
        cot = ((dh_next, dz_next), (dh_t, dz_t, dl_t))
        (dc, dfeat, dtaps) = pullback(cot)
        return dc, (dtaps, acts, dfeat)

    xs = (h_prev, z_prev, feats, a_in, gum, is_first, d_hseq, d_zseq,
          d_logitseq)
    (dh0, dz0), (dtaps, acts, dfeats) = jax.lax.scan(
        bwd_step, (jnp.zeros_like(h0), jnp.zeros_like(z0)), xs,
        unroll=cfg.unroll, reverse=True)

    dpost = _mlp_grads(params["post"], cfg.n_post_hidden, "p.", acts, dtaps)
    dgru = {
        "kernel_i": jnp.einsum("tbi,tbo->io", acts["g.i"],
                               dtaps["g.i"].astype(acts["g.i"].dtype),
                               preferred_element_type=f32),
        "bias_i": jnp.sum(dtaps["g.i"].astype(f32), axis=(0, 1)),
        "kernel_h": jnp.einsum("tbi,tbo->io", acts["g.h"],
                               dtaps["g.h"].astype(acts["g.h"].dtype),
                               preferred_element_type=f32),
        "bias_h": jnp.sum(dtaps["g.h"].astype(f32), axis=(0, 1)),
    }
    dparams = {"gru": dgru, "post": dpost}
    return (dparams, dh0, dz0, dfeats, jnp.zeros_like(a_in),
            jnp.zeros_like(gum), jnp.zeros_like(is_first))


observe_scan_reset.defvjp(_observe_reset_fwd, _observe_reset_bwd)

