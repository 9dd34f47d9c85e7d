"""GRU encoder semantics: parity with torch.nn.GRU (packed + unpacked),
masked-recurrence length handling, bidirectional concat."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ikea_recommender_tpu.models.backbone import (
    BackboneConfig,
    apply_backbone,
    init_backbone,
)
from ikea_recommender_tpu.models.gru import gru_layer_apply, init_gru_layer

torch = pytest.importorskip("torch")


def _copy_to_torch_gru(params_fwd, torch_gru, layer=0, suffix=""):
    """Load our (E,3H)[r|z|n] params into torch's (3H,E)[r|z|n] layout."""
    with torch.no_grad():
        getattr(torch_gru, f"weight_ih_l{layer}{suffix}").copy_(
            torch.tensor(np.asarray(params_fwd["wi"]).T)
        )
        getattr(torch_gru, f"weight_hh_l{layer}{suffix}").copy_(
            torch.tensor(np.asarray(params_fwd["wh"]).T)
        )
        getattr(torch_gru, f"bias_ih_l{layer}{suffix}").copy_(
            torch.tensor(np.asarray(params_fwd["bi"]))
        )
        getattr(torch_gru, f"bias_hh_l{layer}{suffix}").copy_(
            torch.tensor(np.asarray(params_fwd["bh"]))
        )


def test_unmasked_matches_torch():
    B, T, E, H = 4, 6, 5, 7
    key = jax.random.key(0)
    params = init_gru_layer(key, E, H)
    x = np.random.RandomState(0).randn(B, T, E).astype(np.float32)

    y, h = gru_layer_apply(params, jnp.asarray(x), lengths=None)

    tg = torch.nn.GRU(E, H, batch_first=True)
    _copy_to_torch_gru(params, tg)
    with torch.no_grad():
        y_t, h_t = tg(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(y), y_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_t[0].numpy(), atol=1e-5)


def test_masked_matches_torch_packed():
    """Length-masked recurrence == torch pack_padded_sequence final hidden."""
    B, T, E, H = 5, 8, 4, 6
    params = init_gru_layer(jax.random.key(1), E, H)
    rs = np.random.RandomState(1)
    x = rs.randn(B, T, E).astype(np.float32)
    lens = np.array([1, 3, 8, 5, 2])

    _, h = gru_layer_apply(params, jnp.asarray(x), lengths=jnp.asarray(lens))

    tg = torch.nn.GRU(E, H, batch_first=True)
    _copy_to_torch_gru(params, tg)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lens), batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        _, h_t = tg(packed)
    np.testing.assert_allclose(np.asarray(h), h_t[0].numpy(), atol=1e-5)


def test_reverse_masked_matches_torch_packed_bidir():
    """Reverse masked scan == torch packed bidirectional backward hidden."""
    B, T, E, H = 3, 7, 4, 5
    p_fwd = init_gru_layer(jax.random.key(2), E, H)
    p_bwd = init_gru_layer(jax.random.key(3), E, H)
    rs = np.random.RandomState(2)
    x = rs.randn(B, T, E).astype(np.float32)
    lens = np.array([2, 7, 4])

    _, h_f = gru_layer_apply(p_fwd, jnp.asarray(x), jnp.asarray(lens))
    _, h_b = gru_layer_apply(p_bwd, jnp.asarray(x), jnp.asarray(lens), reverse=True)

    tg = torch.nn.GRU(E, H, batch_first=True, bidirectional=True)
    _copy_to_torch_gru(p_fwd, tg)
    _copy_to_torch_gru(p_bwd, tg, suffix="_reverse")
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lens), batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        _, h_t = tg(packed)
    np.testing.assert_allclose(np.asarray(h_f), h_t[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_b), h_t[1].numpy(), atol=1e-5)


def test_backbone_pad_consumption_convention():
    """true_len=1 on an all-pad state consumes exactly one pad token: the
    result must differ from a zero-length hypothetical and match torch's
    packed GRU fed one pad embedding."""
    cfg = BackboneConfig(num_items=10, embedding_dim=4, hidden_dim=4)
    params = init_backbone(jax.random.key(4), cfg)
    pad = cfg.padding_idx
    s = jnp.full((1, 5), pad, dtype=jnp.int32)
    h1 = apply_backbone(params, cfg, s, jnp.array([1]))
    h2 = apply_backbone(params, cfg, s, jnp.array([2]))
    assert not np.allclose(np.asarray(h1), 0.0)
    # consuming two identical pad tokens differs from one
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_multilayer_head_uses_last_layer():
    cfg = BackboneConfig(num_items=10, embedding_dim=4, hidden_dim=4, gru_layers=2)
    cfg_first = BackboneConfig(
        num_items=10, embedding_dim=4, hidden_dim=4, gru_layers=2, head_layer="first"
    )
    params = init_backbone(jax.random.key(5), cfg)
    s = jnp.array([[1, 2, 3, 0, 0]], dtype=jnp.int32)
    lens = jnp.array([3])
    h_last = apply_backbone(params, cfg, s, lens)
    h_first = apply_backbone(params, cfg_first, s, lens)
    assert not np.allclose(np.asarray(h_last), np.asarray(h_first))

    # parity of the 2-layer final hidden vs torch
    tg = torch.nn.GRU(4, 4, num_layers=2, batch_first=True)
    _copy_to_torch_gru(params["gru"][0]["fwd"], tg, layer=0)
    _copy_to_torch_gru(params["gru"][1]["fwd"], tg, layer=1)
    emb = np.asarray(params["embedding"])[np.asarray(s)]
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(emb), torch.tensor(np.asarray(lens)), batch_first=True,
        enforce_sorted=False,
    )
    with torch.no_grad():
        _, h_t = tg(packed)
    np.testing.assert_allclose(np.asarray(h_last)[0], h_t[1, 0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_first)[0], h_t[0, 0].numpy(), atol=1e-5)


def test_frozen_pad_embedding_is_zero():
    cfg = BackboneConfig(
        num_items=6, embedding_dim=3, hidden_dim=3, train_pad_embed=False
    )
    params = init_backbone(jax.random.key(6), cfg)
    np.testing.assert_allclose(np.asarray(params["embedding"][cfg.padding_idx]), 0.0)
