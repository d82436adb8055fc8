"""Microbenchmark the conv towers (encoder / decoder) in isolation.

The full-iteration profile attributes the bulk of WM-update time to the conv
towers (PERFORMANCE.md).  This tool times them standalone at the flagship
workload shapes (B*T = 1500 frames of 64x64x3).  CAUTION: wall-clock timing
of chained async dispatches under-reports device time ~10x through the
remote tunnel — use tools/xprof_summary.py for per-op truth; this tool is
for quick relative comparisons only:

  enc_fwd   : u8 obs -> normalize -> 4 convs -> flat features
  enc_grad  : d(sum(features))/d(params)      [obs needs no input grad]
  dec_fwd   : (h, z) -> upscaler MLP -> 4 deconvs -> tanh recon
  dec_grad  : d(sum(recon))/d(params, h, z)

Prints ms per call and achieved GB/s against the minimal-traffic estimate.
"""

from __future__ import annotations

import argparse
import json

from _bench_common import make_trainer_and_buf, time_fn

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=1500)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    # NOTE: the fused Pallas conv kernel (ops/conv_pallas.py) is interpret-
    # mode only — Mosaic cannot compile it yet (PERFORMANCE.md) — so this
    # tool times the XLA tower it would replace, not an A/B of the two.
    trainer, state, buf, cfg = make_trainer_and_buf()
    rssm = trainer.rssm
    params = state.wm.params
    n = args.frames
    h, w = cfg.wm.obs_size
    key = jax.random.PRNGKey(0)
    obs_u8 = (jax.random.uniform(key, (n, h, w, 3)) * 255).astype(jnp.uint8)
    hid = jax.random.normal(key, (n, cfg.wm.hidden_dim), jnp.float32)
    lat = jax.nn.one_hot(
        jax.random.randint(key, (n, cfg.wm.latent_rows), 0, cfg.wm.latent_classes),
        cfg.wm.latent_classes).reshape(n, -1)

    @jax.jit
    def enc_fwd(p, o):
        o = o.astype(rssm.dtype) / 255.0 - 0.5
        return rssm.encode_obs(p, o)

    @jax.jit
    def enc_grad(p, o):
        # Differentiate only the encoder subtree (enc_conv*): grad-ing the
        # whole WM tree would also materialize zero gradients for the
        # decoder/GRU/head params and pollute the timing.
        enc = {k: v for k, v in p.items() if k.startswith("enc_conv")}
        rest = {k: v for k, v in p.items() if not k.startswith("enc_conv")}

        def loss(enc_p):
            return jnp.sum(enc_fwd({**enc_p, **rest}, o).astype(jnp.float32))

        return jax.grad(loss)(enc)

    @jax.jit
    def dec_fwd(p, hh, zz):
        return rssm.decode(p, hh, zz)

    @jax.jit
    def dec_grad(p, hh, zz):
        def loss(p, hh, zz):
            return jnp.sum(dec_fwd(p, hh, zz).astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1, 2))(p, hh, zz)

    out = {}
    out["enc_fwd_ms"] = round(time_fn(enc_fwd, params, obs_u8, iters=args.iters), 3)
    out["enc_grad_ms"] = round(time_fn(enc_grad, params, obs_u8, iters=args.iters), 3)
    out["dec_fwd_ms"] = round(time_fn(dec_fwd, params, hid, lat, iters=args.iters), 3)
    out["dec_grad_ms"] = round(time_fn(dec_grad, params, hid, lat, iters=args.iters), 3)

    # Minimal HBM traffic (MB) if each tower ran as ONE fused VMEM-resident
    # program: read inputs once + write outputs once.
    mb = 1e-6
    f = cfg.wm.encoder_filters_2 * 4 * (h // 16) * (w // 16)
    out["enc_min_mb"] = round((n * h * w * 3 * 1 + n * f * 2) * mb, 1)
    out["dec_min_mb"] = round(
        (n * (cfg.wm.hidden_dim + cfg.wm.latent_dim) * 4 + n * h * w * 3 * 2) * mb, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
