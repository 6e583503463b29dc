"""Learned loop-closure embedding (the match_laser_scans model in JAX)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nautilus_tpu.loop_closure import embedding
from nautilus_tpu.ingest.synthetic import synthesize


@pytest.fixture(scope="module")
def params():
    p = embedding.load_params()
    if p is None:
        pytest.skip("no trained weights present")
    return p


@pytest.fixture(scope="module")
def heldout():
    """A world seed far outside the training range (seed=0..187)."""
    raw, gt = synthesize(num_nodes=40, world_kind="building", num_beams=360,
                         seed=9001, odom_noise_trans=0.03,
                         odom_noise_rot=0.01)
    return raw, gt


def test_rotation_invariance(params, heldout):
    """Rotating a scan must not move its embedding (FFT-magnitude
    construction makes this exact up to binning)."""
    raw, _ = heldout
    pts = np.asarray(raw.points[5])
    msk = np.asarray(raw.points_mask[5])
    th = 1.234
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    za = embedding.embed(params, jnp.asarray(pts), jnp.asarray(msk))
    zb = embedding.embed(params, jnp.asarray(pts @ R.T), jnp.asarray(msk))
    sim = float(jnp.dot(za, zb))
    # invariance is exact in the spectrum but the occupancy histogram
    # re-bins under rotation; 0.95 still far exceeds unrelated-pair sims
    assert sim > 0.95


def test_same_place_scores_higher_than_far(params, heldout):
    """Held-out world: <=1 m pairs must outscore >8 m pairs on average,
    with a usable threshold between the means."""
    raw, gt = heldout
    pts, msk = jnp.asarray(raw.points), jnp.asarray(raw.points_mask)
    z = jax.vmap(lambda p, m: embedding.embed(params, p, m))(pts, msk)
    z = np.asarray(z)
    d = np.linalg.norm(gt[:, None, :2] - gt[None, :, :2], axis=-1)
    sims = 0.5 * (z @ z.T + 1.0)
    iu = np.triu_indices(len(gt), k=1)
    far_cut = max(np.percentile(d[iu], 80), 2.0)   # farthest quintile
    near = sims[iu][d[iu] <= 1.0]
    far = sims[iu][d[iu] >= far_cut]
    assert len(near) > 3 and len(far) > 3
    assert near.mean() > far.mean() + 0.05


def test_score_range_and_self(params, heldout):
    raw, _ = heldout
    s = embedding.embedding_match_score(
        params, raw.points[3], raw.points_mask[3],
        raw.points[3], raw.points_mask[3])
    assert float(s) == pytest.approx(1.0, abs=1e-5)


def test_weights_roundtrip(tmp_path):
    p = embedding.init_params(7)
    path = embedding.save_params(p, tmp_path / "w.npz")
    q = embedding.load_params(path)
    for k in p:
        np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(q[k]))
    assert embedding.load_params(tmp_path / "missing.npz") is None


class TestGatePlumbing:
    def _state(self):
        from nautilus_tpu.ingest.synthetic import make_problem
        state, _ = make_problem(num_nodes=10, world_kind="room",
                                num_beams=180, seed=11)
        return state

    def test_forced_embedding_requires_weights(self, monkeypatch, tmp_path):
        from nautilus_tpu.loop_closure.auto_lc import descriptor_gate
        monkeypatch.setattr(embedding, "_WEIGHTS_PATH",
                            tmp_path / "none.npz")
        state = self._state()
        with pytest.raises(FileNotFoundError):
            descriptor_gate(state, [(0, 5)], 0.5,
                            use_learned_embedding=True)

    def test_auto_falls_back_to_hand_descriptor(self, monkeypatch,
                                                tmp_path):
        from nautilus_tpu.loop_closure.auto_lc import descriptor_gate
        monkeypatch.setattr(embedding, "_WEIGHTS_PATH",
                            tmp_path / "none.npz")
        state = self._state()
        kept = descriptor_gate(state, [(0, 1)], 0.0)
        assert kept == [(0, 1)]   # threshold 0 keeps everything

    def test_embedding_gate_runs_when_weights_exist(self):
        if embedding.load_params() is None:
            pytest.skip("no trained weights present")
        from nautilus_tpu.loop_closure.auto_lc import descriptor_gate
        state = self._state()
        kept = descriptor_gate(state, [(0, 1), (0, 9)], 0.0,
                               use_learned_embedding=True)
        assert kept == [(0, 1), (0, 9)]
