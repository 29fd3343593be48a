"""Model families: sparse-attention graph transformer + sparse sequence
transformer, end to end over the packed SDDMM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.formats import random_mask
from bsmr_sddmm_tpu.models import (GraphTransformer, init_params,
                                   make_forward, make_train_step)
from bsmr_sddmm_tpu.models.sparse_transformer import (
    SparseTransformer, local_strided_mask)
from bsmr_sddmm_tpu.models import sparse_transformer as st


def test_local_strided_mask_structure():
    m = local_strided_mask(512, window=32, stride=64)
    assert m.rows == m.cols == 512
    rows = m.coo_rows()
    # causal: col <= row everywhere
    assert np.all(m.col_indices <= rows)
    # position 0 attends only to itself
    assert m.row_offsets[1] - m.row_offsets[0] == 1
    # a late position sees its window plus strided summaries
    deg = m.row_nnz()
    assert deg[-1] >= 32


def test_sparse_transformer_forward_and_attention_oracle():
    model = SparseTransformer(seq_len=256, vocab_size=64, head_dim=32,
                              num_heads=2, num_layers=1)
    cfg = SddmmConfig(k=32, panel_height=16, dense_chunk=16,
                      residual_chunk=2048, delta=0.05)
    mask = local_strided_mask(256, window=32, stride=64)
    forward, dplan, plan = st.make_forward(model, mask=mask, config=cfg)
    params = st.init_params(model)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, 256), jnp.int32)
    logits = jax.jit(forward)(params, tokens, dplan)
    assert logits.shape == (256, 64)
    assert bool(jnp.all(jnp.isfinite(logits)))

    # oracle: masked dense attention must match the sparse pipeline
    d = model.model_dim
    x = jnp.take(params["embed"], tokens, axis=0) + params["pos"]
    lp = params["layer_0"]
    xn = st._layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
    h, hd = model.num_heads, model.head_dim
    q = (xn @ lp["wq"]).reshape(256, h, hd)
    k = (xn @ lp["wk"]).reshape(256, h, hd)
    v = (xn @ lp["wv"]).reshape(256, h, hd)
    dense_mask = np.zeros((256, 256), np.float32)
    dense_mask[mask.coo_rows(), mask.col_indices] = 1.0
    logits_h = jnp.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
    logits_h = jnp.where(dense_mask[None] > 0, logits_h, -jnp.inf)
    alpha = jax.nn.softmax(logits_h, axis=-1)
    ref_attn = jnp.einsum("hqk,khd->qhd", alpha, v).reshape(256, d)
    ref_out = x + ref_attn @ lp["wo"]

    # recompute the model's attention output for layer 0
    from bsmr_sddmm_tpu.ops.graph import (csr_segment_ids, edge_softmax,
                                          spmm)
    from bsmr_sddmm_tpu.ops.sddmm import make_sddmm_body
    body = make_sddmm_body(plan, cfg)
    seg = jnp.asarray(csr_segment_ids(mask))
    col = jnp.asarray(mask.col_indices.astype(np.int32))

    def one_head(qh, kh, vh):
        s = body(qh, kh, dplan) / np.sqrt(hd)
        a = edge_softmax(s, seg, 256)
        return spmm(a, col, seg, vh, 256)

    heads = jax.vmap(one_head, in_axes=(1, 1, 1), out_axes=1)(q, k, v)
    got = x + heads.reshape(256, d) @ lp["wo"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-4)


def test_sparse_transformer_train_step():
    model = SparseTransformer(seq_len=128, vocab_size=32, head_dim=16,
                              num_heads=2, num_layers=1)
    cfg = SddmmConfig(k=16, panel_height=16, dense_chunk=16,
                      residual_chunk=1024, delta=0.05)
    forward, dplan, _ = st.make_forward(model, config=cfg, window=16,
                                        stride=32)
    params = st.init_params(model)
    opt_init, train_step = st.make_train_step(model, forward)
    opt_state = opt_init(params)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, 32, 128), jnp.int32)
    step = jax.jit(train_step)
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, tokens, dplan)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # memorizing one sequence
