"""Vector map extraction: fused cloud -> line segments -> CSV.

Replaces the reference's VectorMaps::ExtractLines native call
(src/optimization/solver.cc:581-624, third_party vector_maps) with a
host-side sequential-RANSAC extractor: repeatedly fit the strongest line
among remaining points, clip it to the inlier extent, split on gaps, and
remove consumed points.  Off the hot path (runs once per /vectorize_output
command), so plain numpy is the right tool.

Output contract matches the reference: CSV rows
``start_x,start_y,end_x,end_y`` (solver.cc:608-618).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np


def _fit_line(pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Total-least-squares line fit -> (point_on_line, unit_direction)."""
    mean = pts.mean(axis=0)
    c = pts - mean
    cov = c.T @ c
    w, v = np.linalg.eigh(cov)
    return mean, v[:, np.argmax(w)]


def extract_lines(points: np.ndarray, inlier_threshold: float = 0.04,
                  min_inliers: int = 25, max_lines: int = 200,
                  gap_threshold: float = 0.5, ransac_iters: int = 60,
                  seed: int = 0) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Extract line segments from a 2D point cloud.

    Returns [(start [2], end [2]), ...].  Deterministic for a given seed.
    """
    rng = np.random.default_rng(seed)
    pts = np.asarray(points, np.float64)
    segments: List[Tuple[np.ndarray, np.ndarray]] = []
    remaining = pts
    for _ in range(max_lines):
        if len(remaining) < min_inliers:
            break
        best_count, best_inliers = 0, None
        n = len(remaining)
        for _ in range(ransac_iters):
            i, j = rng.integers(0, n, size=2)
            if i == j:
                continue
            a, b = remaining[i], remaining[j]
            d = b - a
            norm = np.linalg.norm(d)
            if norm < 1e-9:
                continue
            d = d / norm
            normal = np.array([-d[1], d[0]])
            dist = np.abs((remaining - a) @ normal)
            inliers = dist < inlier_threshold
            count = int(inliers.sum())
            if count > best_count:
                best_count, best_inliers = count, inliers
        if best_inliers is None or best_count < min_inliers:
            break
        sel = remaining[best_inliers]
        mean, direction = _fit_line(sel)
        # Refine inliers against the TLS fit.
        normal = np.array([-direction[1], direction[0]])
        dist = np.abs((remaining - mean) @ normal)
        inliers = dist < inlier_threshold
        sel = remaining[inliers]
        if len(sel) < min_inliers:
            remaining = remaining[~best_inliers]
            continue
        # Split on gaps along the line, emit one segment per dense run.
        t = (sel - mean) @ direction
        order = np.argsort(t)
        t_sorted = t[order]
        run_start = 0
        consumed = np.zeros(len(sel), bool)
        for k in range(1, len(t_sorted) + 1):
            if k == len(t_sorted) or t_sorted[k] - t_sorted[k - 1] > gap_threshold:
                run = order[run_start:k]
                if len(run) >= min_inliers:
                    lo, hi = t[run].min(), t[run].max()
                    segments.append((mean + lo * direction,
                                     mean + hi * direction))
                    consumed[run] = True
                run_start = k
        if not consumed.any():
            remaining = remaining[~inliers]
            continue
        # Remove only consumed points; keep sparse leftovers for other lines.
        keep = np.ones(len(remaining), bool)
        idx = np.where(inliers)[0]
        keep[idx[consumed]] = False
        remaining = remaining[keep]
    return segments


def merge_colinear(segments, angle_tol: float = 0.05,
                   lateral_tol: float = 0.08, gap_tol: float = 0.5):
    """Merge near-colinear, overlapping/adjacent segments.

    Sequential RANSAC can emit several pieces of one wall (and near-duplicate
    lines from leftover points); this joins segments whose directions agree
    within angle_tol (radians), whose lateral offset is within lateral_tol,
    and whose extents overlap or come within gap_tol of each other.
    """
    segs = [(np.asarray(a, np.float64), np.asarray(b, np.float64))
            for a, b in segments]
    merged = True
    while merged:
        merged = False
        out = []
        used = [False] * len(segs)
        for i in range(len(segs)):
            if used[i]:
                continue
            a1, b1 = segs[i]
            d1 = b1 - a1
            len1 = np.linalg.norm(d1)
            if len1 < 1e-9:
                used[i] = True
                continue
            u1 = d1 / len1
            for j in range(i + 1, len(segs)):
                if used[j]:
                    continue
                a2, b2 = segs[j]
                d2 = b2 - a2
                len2 = np.linalg.norm(d2)
                if len2 < 1e-9:
                    used[j] = True
                    continue
                u2 = d2 / len2
                if abs(abs(u1 @ u2) - 1.0) > angle_tol ** 2 / 2 and \
                        np.arccos(min(abs(u1 @ u2), 1.0)) > angle_tol:
                    continue
                n1 = np.array([-u1[1], u1[0]])
                if max(abs((a2 - a1) @ n1), abs((b2 - a1) @ n1)) > lateral_tol:
                    continue
                t_vals = [0.0, len1, (a2 - a1) @ u1, (b2 - a1) @ u1]
                lo2, hi2 = sorted(t_vals[2:])
                if lo2 > len1 + gap_tol or hi2 < -gap_tol:
                    continue
                t_min, t_max = min(t_vals), max(t_vals)
                a1, b1 = a1 + t_min * u1, a1 + t_max * u1
                d1 = b1 - a1
                len1 = np.linalg.norm(d1)
                u1 = d1 / len1
                used[j] = True
                merged = True
            used[i] = True
            out.append((a1, b1))
        segs = out
    return segs


def fused_cloud(state) -> np.ndarray:
    """All clouds transformed by the current solution (solver.cc:584-589)."""
    pts = np.asarray(state.problem.points, np.float64)
    mask = np.asarray(state.problem.points_mask)
    out = []
    for i in range(state.num_nodes):
        p = pts[i][mask[i]]
        th = state.solution[i, 2]
        c, s = np.cos(th), np.sin(th)
        r = np.array([[c, -s], [s, c]])
        out.append(p @ r.T + state.solution[i, :2])
    return np.concatenate(out, axis=0)


def vectorize(state, map_output_file=None, verbose: bool = True,
              merge: bool = True, **extract_kw):
    """Full Vectorize flow (solver.cc:581-624): fuse, extract, write CSV."""
    cloud = fused_cloud(state)
    lines = extract_lines(cloud, **extract_kw)
    if merge:
        lines = merge_colinear(lines)
    if verbose:
        print(f"Created map: Pointcloud size: {len(cloud)}\t"
              f"Lines size: {len(lines)}")
    if map_output_file:
        rows = [f"{a[0]},{a[1]},{b[0]},{b[1]}" for a, b in lines]
        Path(map_output_file).write_text("\n".join(rows) + "\n")
    return lines
