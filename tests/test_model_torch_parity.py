"""Full-model parity: our GRU4Rec vs a torch replica of the reference model.

The replica reimplements the reference forward exactly
(``/root/reference/recommenders/models/GRU4Rec/model.py:6-82``):
nn.Embedding(padding_idx) -> pack_padded_sequence -> nn.GRU -> final hidden
-> nn.Linear. We copy OUR params into the torch modules and compare logits
and CE loss over variable-length batches — anchoring embedding pad
semantics, masked-recurrence ≡ packed-sequence equivalence, and head wiring
in one check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
from ikea_recommender_tpu.models.families import (
    apply_model,
    init_model,
    model_config_from_train,
)

torch = pytest.importorskip("torch")


def _torch_gru4rec(params, A, E, H, pad_id, train_pad_embed):
    emb = torch.nn.Embedding(
        A + 1, E, padding_idx=None if train_pad_embed else pad_id
    )
    gru = torch.nn.GRU(E, H, batch_first=True)
    head = torch.nn.Linear(H, A)
    bb = params["backbone"]
    sup = params["sup_head"]
    with torch.no_grad():
        emb.weight.copy_(torch.tensor(np.asarray(bb["embedding"])))
        g = bb["gru"][0]["fwd"]
        gru.weight_ih_l0.copy_(torch.tensor(np.asarray(g["wi"]).T))
        gru.weight_hh_l0.copy_(torch.tensor(np.asarray(g["wh"]).T))
        gru.bias_ih_l0.copy_(torch.tensor(np.asarray(g["bi"])))
        gru.bias_hh_l0.copy_(torch.tensor(np.asarray(g["bh"])))
        head.weight.copy_(torch.tensor(np.asarray(sup["kernel"]).T))
        head.bias.copy_(torch.tensor(np.asarray(sup["bias"])))

    def forward(states, lengths):
        # the reference forward (model.py:60-80, packed path, h[0] head input)
        x = emb(torch.tensor(states))
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x, torch.tensor(lengths), batch_first=True, enforce_sorted=False
        )
        _, h = gru(packed)
        return head(h[0])

    return forward


@pytest.mark.parametrize("train_pad_embed", [True, False])
def test_gru4rec_logits_match_torch_reference(train_pad_embed):
    A, E, H, T, B = 50, 12, 16, 8, 32
    tc = TrainConfig(
        model="gru4rec",
        embedding_size=E,
        hidden_state_size=H,
        state_size=T,
        train_padding_embed=train_pad_embed,
        use_packed_seq=True,
        padding_position="end",
    )
    mc = model_config_from_train(tc, DataConfig(num_items=A))
    params = init_model(jax.random.key(3), mc)

    rs = np.random.RandomState(0)
    lengths = rs.randint(1, T + 1, B).astype(np.int64)
    states = np.full((B, T), A, dtype=np.int64)  # pad id = num_items
    for i, L in enumerate(lengths):
        states[i, :L] = rs.randint(0, A, L)

    (ours,) = apply_model(
        params, mc, jnp.asarray(states, jnp.int32), jnp.asarray(lengths, jnp.int32)
    )
    with torch.no_grad():
        theirs = _torch_gru4rec(params, A, E, H, A, train_pad_embed)(
            states, lengths
        ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-5)

    # CE loss parity (the training objective, model.py:131-158)
    actions = rs.randint(0, A, B)
    ours_ce = float(
        -jnp.mean(
            jax.nn.log_softmax(ours, axis=-1)[jnp.arange(B), jnp.asarray(actions)]
        )
    )
    theirs_ce = float(
        torch.nn.functional.cross_entropy(
            torch.tensor(theirs), torch.tensor(actions)
        )
    )
    assert abs(ours_ce - theirs_ce) < 1e-4


def test_len1_empty_state_consumes_one_pad_token():
    """true_len=1 'empty' states run the GRU over one pad token (reference
    preprocessing forces len>=1, data_utils/preprocessing.py:260) — output
    must equal torch on an all-pad length-1 sequence, not a zero state."""
    A, E, H, T = 30, 8, 8, 5
    tc = TrainConfig(
        model="gru4rec", embedding_size=E, hidden_state_size=H, state_size=T
    )
    mc = model_config_from_train(tc, DataConfig(num_items=A))
    params = init_model(jax.random.key(1), mc)
    states = np.full((2, T), A, dtype=np.int64)
    lengths = np.array([1, 1], dtype=np.int64)
    (ours,) = apply_model(
        params, mc, jnp.asarray(states, jnp.int32), jnp.asarray(lengths, jnp.int32)
    )
    with torch.no_grad():
        theirs = _torch_gru4rec(params, A, E, H, A, True)(states, lengths).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-5)
    assert not np.allclose(np.asarray(ours)[0], 0.0)
