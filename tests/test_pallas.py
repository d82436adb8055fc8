"""Pallas fused GRU cell: forward + backward equivalence with the XLA path
(interpret mode on CPU; the compiled path is exercised on TPU by bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer_tpu.nets.gru import gru_cell_core


@pytest.fixture(scope="module")
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _rand_inputs(key, B=10, I=37, H=29, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    scale = 1.0 / np.sqrt(H)
    x = jax.random.normal(ks[0], (B, I), dtype)
    h = jax.random.normal(ks[1], (B, H), dtype)
    wi = jax.random.uniform(ks[2], (I, 3 * H), dtype, -scale, scale)
    wh = jax.random.uniform(ks[3], (H, 3 * H), dtype, -scale, scale)
    bi = jax.random.uniform(ks[4], (3 * H,), dtype, -scale, scale)
    bh = jax.random.uniform(ks[5], (3 * H,), dtype, -scale, scale)
    return x, h, wi, wh, bi, bh


class TestPallasGRU:
    def test_forward_matches_core(self, rng, interpret_mode):
        from dreamer_tpu.ops.gru_pallas import gru_cell_pallas

        args = _rand_inputs(rng)
        ref = gru_cell_core(*args)
        out = gru_cell_pallas(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_forward_aligned_shapes(self, rng, interpret_mode):
        from dreamer_tpu.ops.gru_pallas import gru_cell_pallas

        args = _rand_inputs(rng, B=16, I=256, H=128)
        np.testing.assert_allclose(np.asarray(gru_cell_pallas(*args)),
                                   np.asarray(gru_cell_core(*args)), rtol=1e-5, atol=1e-5)

    def test_backward_matches_core(self, rng, interpret_mode):
        from dreamer_tpu.ops.gru_pallas import gru_cell_pallas

        args = _rand_inputs(rng, B=6, I=17, H=13)

        def loss_pallas(*a):
            return jnp.sum(jnp.tanh(gru_cell_pallas(*a)) * jnp.arange(13.0))

        def loss_core(*a):
            return jnp.sum(jnp.tanh(gru_cell_core(*a)) * jnp.arange(13.0))

        g_pallas = jax.grad(loss_pallas, argnums=tuple(range(6)))(*args)
        g_core = jax.grad(loss_core, argnums=tuple(range(6)))(*args)
        for gp, gc, name in zip(g_pallas, g_core, ["x", "h", "wi", "wh", "bi", "bh"]):
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gc),
                                       rtol=2e-4, atol=2e-5, err_msg=name)

    def test_inside_scan_with_grad(self, rng, interpret_mode):
        """The cell must be scannable + differentiable (RSSM usage)."""
        from dreamer_tpu.ops.gru_pallas import gru_cell_pallas

        x, h, wi, wh, bi, bh = _rand_inputs(rng, B=4, I=11, H=9)
        xs = jnp.stack([x * (i + 1) * 0.1 for i in range(5)])

        def roll(fn, wi_):
            def step(carry, x_t):
                out = fn(x_t, carry, wi_, wh, bi, bh)
                return out, out
            final, _ = jax.lax.scan(step, h, xs)
            return jnp.sum(final ** 2)

        g_p = jax.grad(lambda w: roll(gru_cell_pallas, w))(wi)
        g_c = jax.grad(lambda w: roll(gru_cell_core, w))(wi)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_c), rtol=2e-4, atol=2e-5)


class TestPallasGRUScan:
    def test_whole_scan_matches_xla_scan(self, rng, interpret_mode):
        """gru_scan_forward (ONE kernel over all T, grid-over-time, weights
        VMEM-resident) computes exactly lax.scan over gru_cell_core."""
        from dreamer_tpu.ops.gru_pallas import gru_scan_forward

        T, B, I, H = 5, 10, 37, 29
        ks = jax.random.split(rng, 6)
        s = 1.0 / np.sqrt(H)
        xs = jax.random.normal(ks[0], (T, B, I), jnp.float32)
        h0 = jax.random.normal(ks[1], (B, H), jnp.float32)
        wi = jax.random.uniform(ks[2], (I, 3 * H), jnp.float32, -s, s)
        wh = jax.random.uniform(ks[3], (H, 3 * H), jnp.float32, -s, s)
        bi = jax.random.uniform(ks[4], (3 * H,), jnp.float32, -s, s)
        bh = jax.random.uniform(ks[5], (3 * H,), jnp.float32, -s, s)

        def step(h, x):
            h2 = gru_cell_core(x, h, wi, wh, bi, bh)
            return h2, h2

        _, ref = jax.lax.scan(step, h0, xs)
        out, (r, z, n, hn) = gru_scan_forward(xs, h0, wi, wh, bi, bh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        for res in (r, z, n, hn):
            assert res.shape == (T, B, H)
            assert np.isfinite(np.asarray(res)).all()
