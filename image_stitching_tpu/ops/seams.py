"""Seam finders: NO / VORONOI / DP_COLOR / DP_COLORGRAD / GC_COLOR / GC_COLORGRAD.

Replaces the cv::detail::SeamFinder family selected at
`/root/reference/image_stitching/image_stitching.cpp:1032-1065` (default
DpSeamFinder(COLOR), `:77`).  Given seam-scale warped images, their corners
and masks, updates the masks so overlaps are partitioned along low-cost
seams.

TPU-native formulations:
  * DP seam: for each overlapping pair, the classic seam-carving dynamic
    program — cumulative min-cost over rows as one `jax.lax.scan` — over the
    overlap bounding box, on a per-pixel cost of |I1 - I2| (COLOR) or
    |I1 - I2| + |grad1 - grad2| (COLOR_GRAD).  The seam column per row
    splits the overlap between the two images.  The scan axis is chosen
    (rows/cols) from the overlap's aspect so seams run across the thin
    dimension.
  * VORONOI: nearest-image-center partition via distance transforms
    (two-pass separable squared-EDT, vectorized in jnp).
  * GC_COLOR(+GRAD): pairwise min-cut with the same data structure as the
    DP variant but solved exactly via scipy's max-flow on the overlap grid
    (host-side; the overlap at seam scale is small).  This mirrors OpenCV's
    GraphCutSeamFinder being a CPU-only component in the reference too.

Pairs are processed in the reference's order (i < j), each pair updating
the running masks, which matches the sequential pair processing of
DpSeamFinder::process.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["find_seams"]


# ---------------------------------------------------------------- helpers --
def _overlap_box(c1, s1, c2, s2) -> Tuple[int, int, int, int]:
    """Intersection rect (x, y, w, h) of two (corner, size) rois."""
    x = max(c1[0], c2[0])
    y = max(c1[1], c2[1])
    x2 = min(c1[0] + s1[0], c2[0] + s2[0])
    y2 = min(c1[1] + s1[1], c2[1] + s2[1])
    return (x, y, max(0, x2 - x), max(0, y2 - y))


def _crop(arr: np.ndarray, corner, box):
    x, y, w, h = box
    ox, oy = x - corner[0], y - corner[1]
    return arr[oy:oy + h, ox:ox + w]


# ------------------------------------------------------------------- DP ----
@functools.partial(jax.jit, static_argnames=("grad",))
def _dp_seam_cost(img1: jnp.ndarray, img2: jnp.ndarray,
                  grad: bool = False) -> jnp.ndarray:
    d = jnp.sqrt(jnp.sum((img1 - img2) ** 2, axis=-1) + 1e-12)
    if grad:
        def g(a):
            gy = jnp.abs(jnp.diff(a, axis=0, prepend=a[:1]))
            gx = jnp.abs(jnp.diff(a, axis=1, prepend=a[:, :1]))
            return jnp.sum(gy + gx, axis=-1)
        d = d + jnp.abs(g(img1) - g(img2))
    return d


@functools.partial(jax.jit, static_argnames=("grad",))
def _dp_seam(img1: jnp.ndarray, img2: jnp.ndarray, valid: jnp.ndarray,
             prefer1_left: jnp.ndarray, grad: bool = False) -> jnp.ndarray:
    """Vertical min-cost seam through the overlap.

    img*: (H, W, C) float; valid: (H, W) overlap mask;
    prefer1_left: scalar bool — whether image 1 owns the left side.
    Returns keep1: (H, W) bool (True = pixel assigned to image 1).
    """
    big = jnp.float32(1e9)
    cost = _dp_seam_cost(img1, img2, grad=grad)
    cost = jnp.where(valid, cost, 0.0)
    h, w = cost.shape

    def step(prev, row):
        left = jnp.concatenate([jnp.full((1,), big), prev[:-1]])
        right = jnp.concatenate([prev[1:], jnp.full((1,), big)])
        best = jnp.minimum(prev, jnp.minimum(left, right))
        cur = row + best
        return cur, cur

    init = cost[0]
    _, acc = jax.lax.scan(step, init, cost[1:])
    acc = jnp.concatenate([init[None], acc], axis=0)

    # Backtrack: bottom-row argmin, then follow the minimum among the three
    # predecessors row by row (scan in reverse).
    last_col = jnp.argmin(acc[-1], axis=0)

    def back(col, prev_row):
        c0 = jnp.maximum(col - 1, 0)
        c2 = jnp.minimum(col + 1, w - 1)
        vals = jnp.stack([prev_row[c0], prev_row[col], prev_row[c2]])
        col_new = jnp.stack([c0, col, c2])[jnp.argmin(vals)]
        return col_new, col_new

    _, cols_rev = jax.lax.scan(back, last_col, acc[:-1][::-1])
    cols = jnp.concatenate([cols_rev[::-1], last_col[None]])  # (H,)

    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    keep_left = xx <= cols[:, None]
    return jnp.where(prefer1_left, keep_left, ~keep_left)


# -------------------------------------------------------------- voronoi ----
def _sq_edt_1d(f: jnp.ndarray) -> jnp.ndarray:
    """Exact 1D squared distance transform: d[i] = min_j (i-j)^2 + f[j].

    O(n^2) but fully vectorized; seam-scale overlap lines are short.  (A
    Felzenszwalb lower-envelope scan is the upgrade path if this shows up
    in profiles.)"""
    n = f.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)
    return jnp.min(f[None, :] + (idx[:, None] - idx[None, :]) ** 2, axis=1)


@jax.jit
def _distance_sq(mask: jnp.ndarray) -> jnp.ndarray:
    """Squared EDT of ~mask (distance to nearest zero/invalid pixel)."""
    big = jnp.float32(1e12)
    f = jnp.where(mask > 0, big, 0.0)
    d = jax.vmap(_sq_edt_1d, in_axes=1, out_axes=1)(f)
    d = jax.vmap(_sq_edt_1d, in_axes=0, out_axes=0)(d)
    return d


# ------------------------------------------------------------- graphcut ----
def _graph_cut_pair(cost: np.ndarray, must1: np.ndarray, must2: np.ndarray,
                    valid: np.ndarray) -> np.ndarray:
    """Exact min-cut partition of the overlap grid via scipy max-flow.

    cost: (H, W) per-pixel color cost; must1/must2: hard source/sink pixels
    (the regions of each image outside the overlap, projected to its
    border); returns keep1 (H, W) bool.
    """
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_flow

    h, w = cost.shape
    n = h * w
    src, dst = n, n + 1
    idx = np.arange(n).reshape(h, w)
    rows, cols, caps = [], [], []

    def add(u, v, c):
        rows.append(u)
        cols.append(v)
        caps.append(c)

    # Pairwise terms: edge weight = average endpoint cost (OpenCV's
    # GraphCutSeamFinder cost structure), scaled to ints for maxflow.
    scale = 255.0
    ecost = np.maximum((cost * scale).astype(np.int64), 1)
    for (du, dv) in ((0, 1), (1, 0)):
        u = idx[: h - du, : w - dv]
        v = idx[du:, dv:]
        c = ((ecost[: h - du, : w - dv] + ecost[du:, dv:]) // 2 + 1)
        ok = valid[: h - du, : w - dv] & valid[du:, dv:]
        for a, b, cc in zip(u[ok].ravel(), v[ok].ravel(), c[ok].ravel()):
            add(a, b, cc)
            add(b, a, cc)
    inf = int(1 << 40)
    for p in idx[must1 & valid].ravel():
        add(src, p, inf)
    for p in idx[must2 & valid].ravel():
        add(p, dst, inf)
    if not caps:
        return np.ones((h, w), bool)
    m = csr_matrix((caps, (rows, cols)), shape=(n + 2, n + 2))
    res = maximum_flow(m, src, dst)
    # Residual BFS from src gives the source side.
    resid = m - res.flow
    resid.data = np.maximum(resid.data, 0)
    from scipy.sparse.csgraph import breadth_first_order
    reach = breadth_first_order(resid, src, directed=True,
                                return_predecessors=False)
    keep1 = np.zeros(n + 2, bool)
    keep1[reach] = True
    return keep1[:n].reshape(h, w)


# ---------------------------------------------------------------- driver ----
def find_seams(images: Sequence[np.ndarray], corners: Sequence[Tuple[int, int]],
               masks: Sequence[np.ndarray],
               seam_type: str = "dp_color") -> List[np.ndarray]:
    """seam_finder->find(images_f, corners, masks) (`:1065`): returns the
    updated masks.  seam_type in {no, voronoi, dp_color, dp_colorgrad,
    gc_color, gc_colorgrad}; unknown types raise (parity `:1059-1063`)."""
    known = {"no", "voronoi", "dp_color", "dp_colorgrad", "gc_color",
             "gc_colorgrad"}
    if seam_type not in known:
        raise ValueError(
            f"Can't create the following seam finder '{seam_type}'")
    masks = [np.asarray(m).copy().astype(np.uint8) for m in masks]
    if seam_type == "no":
        return masks
    n = len(images)
    sizes = [(img.shape[1], img.shape[0]) for img in images]
    grad = seam_type.endswith("colorgrad")

    for i in range(n):
        for j in range(i + 1, n):
            box = _overlap_box(corners[i], sizes[i], corners[j], sizes[j])
            if box[2] <= 0 or box[3] <= 0:
                continue
            m1 = _crop(masks[i], corners[i], box) > 0
            m2 = _crop(masks[j], corners[j], box) > 0
            ov = m1 & m2
            if not ov.any():
                continue
            if seam_type == "voronoi":
                # Distance to each image's exclusive region.
                d1 = np.asarray(_distance_sq(jnp.asarray(~(m1 & ~m2))))
                d2 = np.asarray(_distance_sq(jnp.asarray(~(m2 & ~m1))))
                keep1 = d1 <= d2
            else:
                im1 = _crop(np.asarray(images[i], np.float32), corners[i],
                            box)
                im2 = _crop(np.asarray(images[j], np.float32), corners[j],
                            box)
                if seam_type.startswith("dp"):
                    # Choose scan orientation across the thin dimension and
                    # which side each image owns from the center offsets.
                    ci = corners[i][0] + sizes[i][0] * 0.5
                    cj = corners[j][0] + sizes[j][0] * 0.5
                    ri = corners[i][1] + sizes[i][1] * 0.5
                    rj = corners[j][1] + sizes[j][1] * 0.5
                    horiz_pair = abs(ci - cj) * box[3] >= abs(ri - rj) * box[2]
                    if horiz_pair:
                        keep1 = np.asarray(_dp_seam(
                            jnp.asarray(im1), jnp.asarray(im2),
                            jnp.asarray(ov), jnp.asarray(ci <= cj),
                            grad))
                    else:
                        keep1 = np.asarray(_dp_seam(
                            jnp.asarray(im1.transpose(1, 0, 2)),
                            jnp.asarray(im2.transpose(1, 0, 2)),
                            jnp.asarray(ov.T), jnp.asarray(ri <= rj),
                            grad)).T
                else:  # graph cut
                    cost = np.asarray(_dp_seam_cost(
                        jnp.asarray(im1), jnp.asarray(im2), grad=grad))
                    keep1 = _graph_cut_pair(cost, m1 & ~m2, m2 & ~m1, ov)
            # Partition the overlap.
            x, y, w, h = box
            oxi, oyi = x - corners[i][0], y - corners[i][1]
            oxj, oyj = x - corners[j][0], y - corners[j][1]
            sub_i = masks[i][oyi:oyi + h, oxi:oxi + w]
            sub_j = masks[j][oyj:oyj + h, oxj:oxj + w]
            sub_i[ov & ~keep1] = 0
            sub_j[ov & keep1] = 0
    return masks
