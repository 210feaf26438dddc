import jax.numpy as jnp
import numpy as np
import torch

from speechclip_plus_tpu.ops import (
    batch_norm_apply,
    init_bn_params,
    init_bn_state,
    kw_bn_dynamic,
    kw_bn_fixed,
)


def _np(x):
    return np.asarray(x)


def test_batch_norm_matches_torch_train_and_eval():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 8)).astype(np.float32)
    gamma = rng.normal(size=(8,)).astype(np.float32)
    beta = rng.normal(size=(8,)).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(8)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(gamma))
        tbn.bias.copy_(torch.from_numpy(beta))

    params = {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}
    state = init_bn_state(8)

    # train step
    tbn.train()
    t_out = tbn(torch.from_numpy(x)).detach().numpy()
    j_out, state = batch_norm_apply(jnp.asarray(x), params, state, training=True)
    np.testing.assert_allclose(_np(j_out), t_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(state["mean"]), tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(_np(state["var"]), tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)

    # eval uses running stats
    tbn.eval()
    x2 = rng.normal(size=(4, 8)).astype(np.float32)
    t_out2 = tbn(torch.from_numpy(x2)).detach().numpy()
    j_out2, _ = batch_norm_apply(jnp.asarray(x2), params, state, training=False)
    np.testing.assert_allclose(_np(j_out2), t_out2, rtol=1e-4, atol=1e-5)


def test_kw_bn_fixed_eachkw_parallel_matches_torch():
    rng = np.random.default_rng(1)
    B, K, D = 6, 4, 5
    kw = rng.normal(size=(B, K, D)).astype(np.float32)
    tbn = torch.nn.BatchNorm1d(K * D)
    tbn.train()
    t_in = torch.from_numpy(kw).permute(0, 2, 1).reshape(B, -1)
    t_out = tbn(t_in).reshape(B, D, K).permute(0, 2, 1).detach().numpy()

    params = {
        "scale": jnp.ones((K * D,), jnp.float32),
        "bias": jnp.zeros((K * D,), jnp.float32),
    }
    state = init_bn_state(K * D)
    j_out, _ = kw_bn_fixed(
        jnp.asarray(kw), params, state, batchnorm_type="eachKw", parallel=True, training=True
    )
    np.testing.assert_allclose(_np(j_out), t_out, rtol=1e-4, atol=1e-5)


def test_kw_bn_fixed_eachkw_per_keyword_matches_torch():
    rng = np.random.default_rng(2)
    B, K, D = 8, 3, 4
    kw = rng.normal(size=(B, K, D)).astype(np.float32)
    bns = [torch.nn.BatchNorm1d(D) for _ in range(K)]
    for bn in bns:
        bn.train()
    t_out = torch.stack(
        [bns[k](torch.from_numpy(kw[:, k])) for k in range(K)], dim=1
    ).detach().numpy()

    params = {
        "scale": jnp.ones((K, D), jnp.float32),
        "bias": jnp.zeros((K, D), jnp.float32),
    }
    state = {"mean": jnp.zeros((K, D)), "var": jnp.ones((K, D))}
    j_out, new_state = kw_bn_fixed(
        jnp.asarray(kw), params, state, batchnorm_type="eachKw", parallel=False, training=True
    )
    np.testing.assert_allclose(_np(j_out), t_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        _np(new_state["mean"][1]), bns[1].running_mean.numpy(), rtol=1e-4, atol=1e-6
    )


def test_kw_bn_same_matches_torch():
    rng = np.random.default_rng(3)
    B, K, D = 5, 6, 3
    kw = rng.normal(size=(B, K, D)).astype(np.float32)
    tbn = torch.nn.BatchNorm1d(D)
    tbn.train()
    # torch path: BN1d over (B, D, K) normalizes channel D over (B, K)
    t_out = tbn(torch.from_numpy(kw).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()

    params = {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
    state = init_bn_state(D)
    j_out, _ = kw_bn_fixed(
        jnp.asarray(kw), params, state, batchnorm_type="same", training=True
    )
    np.testing.assert_allclose(_np(j_out), t_out, rtol=1e-4, atol=1e-5)


def test_kw_bn_same_with_lengths_only_valid_positions():
    rng = np.random.default_rng(4)
    B, K, D = 3, 5, 4
    kw = rng.normal(size=(B, K, D)).astype(np.float32)
    lens = np.array([2, 5, 3])

    # torch oracle: flatten valid rows, BN, write back (padding unchanged)
    tbn = torch.nn.BatchNorm1d(D)
    tbn.train()
    t_kw = torch.from_numpy(kw.copy())
    flat = torch.cat([t_kw[b, : lens[b]] for b in range(B)], dim=0)
    out_flat = tbn(flat)
    off = 0
    for b in range(B):
        t_kw[b, : lens[b]] = out_flat[off : off + lens[b]]
        off += lens[b]

    params = {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
    state = init_bn_state(D)
    j_out, _ = kw_bn_fixed(
        jnp.asarray(kw), params, state, batchnorm_type="same", training=True,
        seq_lens=jnp.asarray(lens),
    )
    np.testing.assert_allclose(_np(j_out), t_kw.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_kw_bn_dynamic_matches_torch():
    rng = np.random.default_rng(5)
    B, T, D = 4, 7, 6
    kw = rng.normal(size=(B, T, D)).astype(np.float32)
    tbn = torch.nn.BatchNorm1d(D)
    tbn.train()
    t_out = tbn(torch.from_numpy(kw).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()

    params = {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
    state = init_bn_state(D)
    j_out, _ = kw_bn_dynamic(jnp.asarray(kw), params, state, training=True)
    np.testing.assert_allclose(_np(j_out), t_out, rtol=1e-4, atol=1e-5)


def test_init_from_token_embedding_stats():
    rng = np.random.default_rng(6)
    emb = rng.normal(size=(100, 16)).astype(np.float32)
    params = init_bn_params(emb.mean(0), emb.std(0, ddof=1), std_scale=2.0)
    np.testing.assert_allclose(_np(params["bias"]), emb.mean(0), rtol=1e-5)
    np.testing.assert_allclose(_np(params["scale"]), emb.std(0, ddof=1) * 2.0, rtol=1e-5)
