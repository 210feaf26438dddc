import jax
import jax.numpy as jnp
import numpy as np

from speechclip_plus_tpu.ops import integrate_and_fire, scale_alpha
from speechclip_plus_tpu.ops.cif import MAX_FEAT_LEN


def _oracle_cif(inputs, alpha, threshold=1.0, tail_thresh=0.5, inference=False):
    """Event-driven scalar simulation of integrate-and-fire (independent of
    both the reference's scatter formulation and our bin-overlap matmul)."""
    S, D = inputs.shape
    fires = []
    integrate = 0.0
    acc = np.zeros(D, dtype=np.float64)
    residue_mass = 0.0
    for s in range(S):
        a = float(alpha[s])
        while integrate + a >= threshold - 1e-9:
            take = threshold - integrate
            acc = acc + take * inputs[s]
            fires.append(acc)
            acc = np.zeros(D, dtype=np.float64)
            a -= take
            integrate = 0.0
            residue_mass = 0.0
        integrate += a
        residue_mass += a
        acc = acc + a * inputs[s]
    n_fires = len(fires)
    if inference and residue_mass >= tail_thresh:
        fires.append(acc * threshold / residue_mass)
    return np.stack(fires, axis=0) if fires else np.zeros((0, D)), n_fires


def _rand_case(B=3, S=20, D=4, seed=0, scale=0.4):
    rng = np.random.default_rng(seed)
    inputs = rng.normal(size=(B, S, D)).astype(np.float32)
    alpha = (rng.uniform(size=(B, S)) * scale).astype(np.float32)
    return inputs, alpha


def test_matches_event_driven_oracle_training():
    inputs, alpha = _rand_case(seed=1)
    out = integrate_and_fire(jnp.asarray(inputs), jnp.asarray(alpha))
    feats = np.asarray(out["dsample_feats"])
    lens = np.asarray(out["dsample_feats_length"])
    for b in range(inputs.shape[0]):
        fires, n = _oracle_cif(inputs[b], alpha[b])
        n = max(min(n, MAX_FEAT_LEN), 1)
        assert lens[b] == n
        np.testing.assert_allclose(feats[b, :n], fires[:n], rtol=1e-4, atol=1e-4)


def test_matches_oracle_with_multifire_frames():
    # alpha > 1 per frame (as happens after train-time upscaling)
    rng = np.random.default_rng(2)
    inputs = rng.normal(size=(1, 10, 3)).astype(np.float32)
    alpha = (rng.uniform(size=(1, 10)) * 2.5).astype(np.float32)
    out = integrate_and_fire(jnp.asarray(inputs), jnp.asarray(alpha))
    fires, n = _oracle_cif(inputs[0], alpha[0])
    n = min(n, MAX_FEAT_LEN)
    lens = int(np.asarray(out["dsample_feats_length"])[0])
    assert lens == n
    np.testing.assert_allclose(
        np.asarray(out["dsample_feats"])[0, :n], fires[:n], rtol=1e-4, atol=1e-4
    )


def test_inference_tail_handling():
    rng = np.random.default_rng(3)
    inputs = rng.normal(size=(2, 12, 3)).astype(np.float32)
    # sample 0: residue ~0.8 (extends); sample 1: residue ~0.2 (dropped)
    alpha = np.zeros((2, 12), dtype=np.float32)
    alpha[0, :11] = 0.8 * 11 / 11  # sum 8.8 -> 8 fires + 0.8 residue
    alpha[0] = 8.8 / 12
    alpha[1] = 5.2 / 12
    out = integrate_and_fire(
        jnp.asarray(inputs), jnp.asarray(alpha), is_inference=True
    )
    feats = np.asarray(out["dsample_feats"])
    lens = np.asarray(out["dsample_feats_length"])
    for b in range(2):
        fires, _ = _oracle_cif(inputs[b], alpha[b], inference=True)
        assert lens[b] == len(fires), (b, lens[b], len(fires))
        np.testing.assert_allclose(feats[b, : lens[b]], fires, rtol=1e-4, atol=1e-4)
        # everything past the length must be zero in inference mode
        assert np.abs(feats[b, lens[b]:]).sum() == 0


def test_scale_alpha_hits_target():
    _, alpha = _rand_case(seed=4)
    target = jnp.asarray([5, 9, 3])
    scaled = scale_alpha(jnp.asarray(alpha), target)
    np.testing.assert_allclose(
        np.asarray(scaled.sum(1)), np.asarray(target) + 1e-5, rtol=1e-5
    )


def test_gradients_flow_through_alpha_and_inputs():
    inputs, alpha = _rand_case(B=1, S=8, D=2, seed=5, scale=0.9)

    def f(a, x):
        out = integrate_and_fire(x, a)
        return (out["dsample_feats"] ** 2).sum()

    ga, gx = jax.grad(f, argnums=(0, 1))(jnp.asarray(alpha), jnp.asarray(inputs))
    assert np.isfinite(np.asarray(ga)).all() and np.abs(np.asarray(ga)).sum() > 0
    assert np.isfinite(np.asarray(gx)).all() and np.abs(np.asarray(gx)).sum() > 0


def test_static_output_shape_and_masks():
    inputs, alpha = _rand_case(seed=6)
    out = integrate_and_fire(jnp.asarray(inputs), jnp.asarray(alpha))
    B, S, D = inputs.shape
    assert out["dsample_feats"].shape == (B, MAX_FEAT_LEN, D)
    assert out["dsample_feats_pad_mask"].shape == (B, MAX_FEAT_LEN)
    lens = np.asarray(out["dsample_feats_length"])
    mask = np.asarray(out["dsample_feats_pad_mask"])
    for b in range(B):
        assert mask[b, : lens[b]].sum() == 0
        assert mask[b, lens[b]:].all()


def test_fired_marks_count_matches_lengths():
    inputs, alpha = _rand_case(B=2, S=30, D=2, seed=7, scale=0.5)
    out = integrate_and_fire(jnp.asarray(inputs), jnp.asarray(alpha))
    marks = np.asarray(out["fired_marks"])
    lens = np.asarray(out["dsample_feats_length"])
    total = np.floor(np.asarray(alpha).sum(1))
    for b in range(2):
        assert marks[b].sum() >= lens[b] - 1  # multi-fire frames mark once
        assert lens[b] == max(1, min(int(total[b]), MAX_FEAT_LEN))
