"""Pallas fused GRU scan: forward + backward parity vs the lax.scan
reference (interpret mode on CPU; the same kernels compile on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikea_recommender_tpu.models.gru import _gru_scan, gru_layer_apply, init_gru_layer
from ikea_recommender_tpu.ops.gru_pallas import gru_scan_pallas

B, T, E, H = 16, 7, 12, 8


def _setup(seed=0):
    params = init_gru_layer(jax.random.key(seed), E, H)
    rs = np.random.RandomState(seed)
    x = rs.randn(B, T, E).astype(np.float32)
    xw = np.einsum("bte,eh->bth", x, np.asarray(params["wi"])) + np.asarray(
        params["bi"]
    )
    lens = rs.randint(1, T + 1, size=(B,))
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    return params, jnp.asarray(xw), jnp.asarray(mask)


@pytest.mark.parametrize("masked", [True, False])
def test_forward_parity(masked):
    params, xw, mask = _setup()
    m = mask if masked else None
    y_ref, h_ref = _gru_scan(xw, params["wh"], params["bh"], m)
    y_pl, h_pl = gru_scan_pallas(xw, params["wh"], params["bh"], mask=m)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=1e-5)


def test_forward_parity_reverse():
    params, xw, mask = _setup(1)
    y_ref, h_ref = _gru_scan(xw, params["wh"], params["bh"], mask, reverse=True)
    y_pl, h_pl = gru_scan_pallas(xw, params["wh"], params["bh"], mask, reverse=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=1e-5)


@pytest.mark.parametrize("masked", [True, False])
def test_backward_parity(masked):
    params, xw, mask = _setup(2)
    m = mask if masked else None
    wh, bh = params["wh"], params["bh"]

    def loss_ref(xw, wh, bh):
        y, h = _gru_scan(xw, wh, bh, m)
        return jnp.sum(y * 0.3) + jnp.sum(h**2)

    def loss_pl(xw, wh, bh):
        y, h = gru_scan_pallas(xw, wh, bh, mask=m)
        return jnp.sum(y * 0.3) + jnp.sum(h**2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(xw, wh, bh)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(xw, wh, bh)
    for a, b, name in zip(g_pl, g_ref, ("dxw", "dwh", "dbh")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name
        )


def test_backbone_scan_impl_switch():
    """gru_layer_apply(scan_impl='pallas') == 'xla' end to end, incl. grad."""
    params, _, mask = _setup(3)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(B, T, E).astype(np.float32))
    lens = jnp.asarray(rs.randint(1, T + 1, size=(B,)))

    y1, h1 = gru_layer_apply(params, x, lens, scan_impl="xla")
    y2, h2 = gru_layer_apply(params, x, lens, scan_impl="pallas")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-5)

    def loss(p, impl):
        _, h = gru_layer_apply(p, x, lens, scan_impl=impl)
        return jnp.sum(h**2)

    g1 = jax.grad(lambda p: loss(p, "xla"))(params)
    g2 = jax.grad(lambda p: loss(p, "pallas"))(params)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g2[k]), np.asarray(g1[k]), atol=2e-4, err_msg=k
        )


def test_batch_tile_h_aware():
    """The r4 VMEM fix: the backward's batch tile shrinks with H so the
    three (H, 3H) weight-class buffers + streamed blocks fit scoped VMEM
    (the H-blind tile failed to compile at H=512, T>=50 —
    docs/performance.md)."""
    from ikea_recommender_tpu.ops.gru_pallas import _batch_tile

    assert _batch_tile(256, 64) == 256
    assert _batch_tile(256, 64, backward=True) == 256
    # r5 contract (the r4 18H/14MB model still OOMed the real chip at
    # H=512/T=200 — measured ~34H B/row of scoped usage): 36H B/row
    # against a 13MB backward budget.
    for B in (256, 512):
        for H in (64, 128, 256, 512):
            bt = _batch_tile(B, H, backward=True)
            assert bt % 8 == 0 and B % bt == 0
            fixed = 3 * H * 3 * H * 4
            assert fixed + 36 * H * 4 * bt <= 13 * 1024 * 1024
    # H=512 pins BT=32: BT=64 intermittently exceeded scoped VMEM
    # (T-dependent Mosaic buffering — docs/performance.md r5 rows)
    assert _batch_tile(256, 512, backward=True) == 32
    # the B=256 tiles the r4 regime table measured are unchanged
    assert _batch_tile(256, 256, backward=True) == 256
    assert _batch_tile(256, 128, backward=True) == 256


def test_backward_parity_h512_tiled():
    """Grad parity through the BATCH-TILED backward (nb > 1) at a width
    that forces the tile below B — the regime the r3 kernel could not
    compile (H=512-class; interpret-mode CPU run uses H=256/B=32 to keep
    runtime sane while still exercising nb=2 via a forced small tile)."""
    import ikea_recommender_tpu.ops.gru_pallas as gp

    Bb, Tt, Hh = 32, 5, 16
    params = init_gru_layer(jax.random.key(9), E, Hh)
    rs = np.random.RandomState(9)
    xw = jnp.asarray(rs.randn(Bb, Tt, 3 * Hh).astype(np.float32))
    mask = jnp.asarray(
        (np.arange(Tt)[None, :] < rs.randint(1, Tt + 1, (Bb, 1))).astype(
            np.float32
        )
    )
    orig = gp._batch_tile
    gp._batch_tile = lambda B, H, backward=False: 16  # force nb=2
    try:
        def loss_pl(xw, wh, bh):
            y, h = gru_scan_pallas(xw, wh, bh, mask=mask)
            return jnp.sum(y * 0.3) + jnp.sum(h**2)

        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(
            xw, params["wh"], params["bh"]
        )
    finally:
        gp._batch_tile = orig

    def loss_ref(xw, wh, bh):
        y, h = _gru_scan(xw, wh, bh, mask)
        return jnp.sum(y * 0.3) + jnp.sum(h**2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(xw, params["wh"], params["bh"])
    for a, b, name in zip(g_pl, g_ref, ("dxw", "dwh", "dbh")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name
        )
