"""Utility-surface tests: polynomial solvers, odometry helpers."""

import numpy as np
import pytest

from nautilus_tpu.ingest.synthetic import make_problem
from nautilus_tpu.solve.hitl import (solved_odom_factors_between,
                                     total_odom_change)
from nautilus_tpu.utils.polynomial import solve_cubic, solve_quadratic


class TestQuadratic:
    def test_two_roots(self):
        roots = solve_quadratic(1, -3, 2)  # (x-1)(x-2)
        np.testing.assert_allclose(roots, [1.0, 2.0], atol=1e-12)

    def test_no_real_roots(self):
        assert solve_quadratic(1, 0, 1) == []

    def test_double_root(self):
        np.testing.assert_allclose(solve_quadratic(1, -2, 1), [1.0])

    def test_linear_degenerate(self):
        np.testing.assert_allclose(solve_quadratic(0, 2, -4), [2.0])

    def test_stability_large_b(self):
        # x^2 + 1e8 x + 1: naive formula loses the small root.
        r = solve_quadratic(1, 1e8, 1)
        assert len(r) == 2
        assert r[0] == pytest.approx(-1e8, rel=1e-9)
        assert r[1] == pytest.approx(-1e-8, rel=1e-6)


class TestCubic:
    @pytest.mark.parametrize("roots", [
        [1.0], [-2.0, 0.5, 3.0], [0.0, 0.0, 2.0]])
    def test_reconstructed(self, roots):
        # Build polynomial from roots, solve, compare.
        c = np.poly(roots if len(roots) == 3 else roots * 3)
        got = solve_cubic(*c)
        for r in set(np.round(roots, 9)):
            assert any(abs(g - r) < 1e-6 for g in got), (roots, got)

    def test_degenerate_quadratic(self):
        np.testing.assert_allclose(solve_cubic(0, 1, -3, 2), [1.0, 2.0])


class TestOdomHelpers:
    def test_between_nodes_wrapped(self):
        state, _ = make_problem(num_nodes=6, world_kind="room", num_beams=180)
        state.solution[:, 2] = np.linspace(3.0, -3.0, 6)  # crosses wrap
        ii, jj, trans, rot = solved_odom_factors_between(state, 1, 4)
        assert list(ii) == [1, 2, 3]
        assert list(jj) == [2, 3, 4]
        # Wrapped: each step is -1.2 raw -> stays -1.2 (within pi).
        np.testing.assert_allclose(rot, -1.2, atol=1e-9)

    def test_total_change(self):
        trans = np.array([[1.0, 0.0], [0.5, 0.5]])
        rot = np.array([3.0, 3.0])   # 6.0 wraps
        t, r = total_odom_change(trans, rot)
        np.testing.assert_allclose(t, [1.5, 0.5])
        assert r == pytest.approx(6.0 - 2 * np.pi)


def test_rate_loop_paces_and_recovers():
    import time as _time
    from nautilus_tpu.utils.timer import RateLoop
    loop = RateLoop(hz=50.0)
    t0 = _time.perf_counter()
    for _ in range(3):
        loop.sleep()
    assert _time.perf_counter() - t0 >= 0.05  # 3 periods at 20 ms, minus phase
    # An over-long pass resets the phase instead of bursting.
    _time.sleep(0.1)
    t1 = _time.perf_counter()
    loop.sleep()
    loop.sleep()
    # Lower bound asserts the pacing; the upper bound only guards against
    # a burst-compensation bug (sleeping for the whole missed 0.1 s), so
    # keep it generous — tight wall-clock ceilings flake on loaded hosts.
    assert 0.015 <= _time.perf_counter() - t1 <= 1.0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        RateLoop(0)
