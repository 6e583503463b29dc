"""Geometry tests, including the reference's six line-distance cases
(reference test/solver_test.cc:12-64)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nautilus_tpu.core import geometry as geo


class TestDistanceToLineSegment:
    """The six cases from reference test/solver_test.cc."""

    SEG = (jnp.array([0.0, 0.0]), jnp.array([2.0, 2.0]))

    def dist(self, p):
        return float(geo.distance_to_line_segment(jnp.array(p), *self.SEG))

    def test_trivial_on_line(self):
        assert self.dist([1.0, 1.0]) == pytest.approx(0.0, abs=1e-6)

    def test_trivial_off_line(self):
        assert self.dist([0.0, 2.0]) == pytest.approx(2.0 * math.sin(math.pi / 4), rel=1e-5)

    def test_negative_off_line(self):
        assert self.dist([2.0, 0.0]) == pytest.approx(2.0 * math.sin(math.pi / 4), rel=1e-5)

    def test_from_endpoint(self):
        assert self.dist([4.0, 4.0]) == pytest.approx(math.sqrt(8), rel=1e-5)

    def test_from_start(self):
        assert self.dist([-2.0, -2.0]) == pytest.approx(math.sqrt(8), rel=1e-5)

    def test_line_is_endpoint(self):
        assert self.dist([2.0, 2.0]) == pytest.approx(0.0, abs=1e-6)

    def test_batched_and_differentiable(self):
        pts = jnp.array([[1.0, 1.0], [0.0, 2.0], [4.0, 4.0]])
        d = geo.distance_to_line_segment(pts, *self.SEG)
        assert d.shape == (3,)
        g = jax.grad(lambda p: geo.distance_to_line_segment(p, *self.SEG))(
            jnp.array([0.0, 2.0]))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_degenerate_segment(self):
        s = jnp.array([1.0, 1.0])
        d = geo.distance_to_line_segment(jnp.array([2.0, 1.0]), s, s)
        assert float(d) == pytest.approx(1.0, rel=1e-5)


class TestAngles:
    def test_angle_mod_range(self):
        for a in [-10.0, -3.2, 0.0, 3.2, 10.0, 100.0]:
            m = float(geo.angle_mod(a))
            assert -math.pi - 1e-6 <= m <= math.pi + 1e-6
            # f32 wrap of large angles loses a few ulps; production angles
            # are already near-wrapped.
            assert math.isclose(math.sin(m), math.sin(a), abs_tol=1e-4)
            assert math.isclose(math.cos(m), math.cos(a), abs_tol=1e-4)

    def test_angle_diff(self):
        assert float(geo.angle_diff(math.pi - 0.1, -math.pi + 0.1)) == pytest.approx(-0.2, abs=1e-6)

    def test_normals_similar(self):
        n1 = jnp.array([1.0, 0.0])
        n2 = jnp.array([-1.0, 0.0])  # anti-parallel counts as similar
        thresh = math.cos(math.radians(20.0))
        assert bool(geo.normals_similar(n1, n2, thresh))
        n3 = jnp.array([0.0, 1.0])
        assert not bool(geo.normals_similar(n1, n3, thresh))


class TestSE2:
    def test_transform_roundtrip(self, rng):
        pose = jnp.array([1.5, -2.0, 0.7])
        pts = jnp.asarray(rng.normal(size=(17, 2)), dtype=jnp.float32)
        w = geo.pose_transform_points(pose, pts)
        back = geo.pose_inverse_transform_points(pose, w)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)

    def test_relative_transform(self, rng):
        a = jnp.array([1.0, 2.0, 0.3])
        b = jnp.array([-0.5, 0.7, -1.1])
        pts = jnp.asarray(rng.normal(size=(5, 2)), dtype=jnp.float32)
        direct = geo.relative_pose_transform_points(a, b, pts)
        via_world = geo.pose_inverse_transform_points(
            b, geo.pose_transform_points(a, pts))
        np.testing.assert_allclose(np.asarray(direct), np.asarray(via_world), atol=1e-5)

    def test_scatter_matrix_score(self):
        line = jnp.stack([jnp.linspace(0, 1, 50), jnp.zeros(50)], axis=-1)
        assert float(geo.scatter_matrix_score(line)) < 0.01
        theta = jnp.linspace(0, 2 * jnp.pi, 100, endpoint=False)
        circle = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
        assert float(geo.scatter_matrix_score(circle)) > 0.9
