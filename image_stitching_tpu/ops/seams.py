"""Seam finders: NO / VORONOI / DP_COLOR / DP_COLORGRAD / GC_COLOR / GC_COLORGRAD.

Replaces the cv::detail::SeamFinder family selected at
`/root/reference/image_stitching/image_stitching.cpp:1032-1065` (default
DpSeamFinder(COLOR), `:77`).  Given seam-scale warped images, their corners
and masks, updates the masks so overlaps are partitioned along low-cost
seams.

TPU-native formulations:
  * DP seam: cv::detail::DpSeamFinder processes each CONNECTED COMPONENT
    of a pair's overlap separately (`image_stitching.cpp:1032-1065`
    behavior; non-convex / multi-blob overlaps are common where three
    rig rings cross).  Here: components are labelled on the host (tiny
    int bookkeeping), each component crop is canonicalized (transposed so
    the seam always runs down rows, ownership sides from the centroids of
    the two images' EXCLUSIVE regions around the component — the
    source/sink sides), padded into half-octave buckets, and ALL
    components across ALL pairs run as a handful of vmapped `lax.scan`
    dynamic programs (one dispatch per bucket instead of one per pair).
    The partitions are then applied sequentially in OpenCV's pair order
    against the evolving masks, which keeps triple overlaps hole-free.
    Per-pixel cost is |I1 - I2| (COLOR) or + |grad1 - grad2| (COLOR_GRAD).
  * VORONOI: nearest-image-center partition via exact squared EDTs — the
    native O(HW) Felzenszwalb transform (`native/stitch_runtime.cpp`)
    when the host runtime is loaded, a vectorized jnp O(n^2)-per-line
    fallback otherwise.
  * GC_COLOR(+GRAD): pairwise min-cut with the same data structure as the
    DP variant but solved exactly via scipy's max-flow on the overlap grid
    (host-side; the overlap at seam scale is small).  This mirrors OpenCV's
    GraphCutSeamFinder being a CPU-only component in the reference too.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["find_seams", "edt_sq", "bucket_dim", "periodic_corner"]


# ---------------------------------------------------------------- helpers --
def _overlap_box(c1, s1, c2, s2) -> Tuple[int, int, int, int]:
    """Intersection rect (x, y, w, h) of two (corner, size) rois."""
    x = max(c1[0], c2[0])
    y = max(c1[1], c2[1])
    x2 = min(c1[0] + s1[0], c2[0] + s2[0])
    y2 = min(c1[1] + s1[1], c2[1] + s2[1])
    return (x, y, max(0, x2 - x), max(0, y2 - y))


def periodic_corner(c1, s1, c2, s2, period):
    """Effective corner of roi 2 for pairing against roi 1 when the warped
    u axis is periodic (spherical/cylindrical/mercator).

    The date-line rebranch in ops/warps.py::detect_result_roi re-centers a
    view straddling azimuth +-pi on its own azimuth, so a cross-dateline
    pair's rects can sit a full u-period apart while genuinely overlapping
    on the sphere — axis-aligned rect intersection would then silently
    drop the pair from seam/exposure coupling (duplicated strip + gain
    discontinuity at the wrap).  Returns c2 shifted by the period multiple
    that maximizes overlap with rect 1; every backward map is periodic in
    u, so all downstream local-coordinate math is unchanged."""
    if not period:
        return c2

    def area(c2s):
        b = _overlap_box(c1, s1, c2s, s2)
        return b[2] * b[3]

    best, best_a = c2, area(c2)
    for sh in (-period, period):
        c2s = (c2[0] + sh, c2[1])
        a = area(c2s)
        if a > best_a:
            best, best_a = c2s, a
    return best


def _crop(arr: np.ndarray, corner, box):
    x, y, w, h = box
    ox, oy = x - corner[0], y - corner[1]
    return arr[oy:oy + h, ox:ox + w]


# ------------------------------------------------------------------- DP ----
@functools.partial(jax.jit, static_argnames=("grad",))
def _dp_seam_cost(img1: jnp.ndarray, img2: jnp.ndarray,
                  grad: bool = False) -> jnp.ndarray:
    # Upcast: crops may arrive float16 (upload-byte economy) and the
    # squared sums overflow f16 range.
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
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


def edt_sq(mask: np.ndarray) -> np.ndarray:
    """Exact squared EDT to the nearest zero pixel of `mask` (host entry).

    Uses the native O(HW) Felzenszwalb transform when the C++ runtime is
    available; falls back to the vectorized jnp transform (exact but
    O(n^2) per line) so CPU test environments need no native build."""
    from ..core import native
    if native.available():
        out = native.edt_sq(np.asarray(mask))
        if out is not None:
            return out
    return np.asarray(_distance_sq(jnp.asarray(
        (np.asarray(mask) > 0).astype(np.float32))))


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

    # Pairwise terms: edge weight = average endpoint cost (OpenCV's
    # GraphCutSeamFinder cost structure), scaled to ints for maxflow.
    # COO triplets assembled with whole-array slicing — no per-edge
    # Python loop (seam-scale overlaps carry 10^5-10^6 edges).
    scale = 255.0
    ecost = np.maximum((cost * scale).astype(np.int64), 1)
    rows, cols, caps = [], [], []
    for (du, dv) in ((0, 1), (1, 0)):
        u = idx[: h - du, : w - dv]
        v = idx[du:, dv:]
        c = ((ecost[: h - du, : w - dv] + ecost[du:, dv:]) // 2 + 1)
        ok = valid[: h - du, : w - dv] & valid[du:, dv:]
        uu, vv, cc = u[ok], v[ok], c[ok]
        rows.append(np.concatenate([uu, vv]))
        cols.append(np.concatenate([vv, uu]))
        caps.append(np.concatenate([cc, cc]))
    # Terminal capacity must stay uncuttable yet fit int32: scipy's
    # maximum_flow casts capacities to int32 internally, so 1<<40 silently
    # wrapped to 0 (zero flow, degenerate all-ones partitions).  2^30 is
    # far above any achievable pixel-edge cut (< 2^27 at seam scales).
    inf = int(1 << 30)
    p1 = idx[must1 & valid]
    p2 = idx[must2 & valid]
    rows.append(np.full(len(p1), src, np.int64))
    cols.append(p1.astype(np.int64))
    caps.append(np.full(len(p1), inf, np.int64))
    rows.append(p2.astype(np.int64))
    cols.append(np.full(len(p2), dst, np.int64))
    caps.append(np.full(len(p2), inf, np.int64))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    caps = np.concatenate(caps)
    if len(caps) == 0:
        return np.ones((h, w), bool)
    m = csr_matrix((caps, (rows, cols)), shape=(n + 2, n + 2))
    res = maximum_flow(m, src, dst)
    # Residual BFS from src gives the source side.  Saturated edges end up
    # as EXPLICIT zeros in the residual CSR, and scipy's csgraph treats
    # explicit zeros as real (zero-weight) edges — drop them, or the BFS
    # walks straight across the cut.
    resid = m - res.flow
    resid.data = np.maximum(resid.data, 0)
    resid.eliminate_zeros()
    from scipy.sparse.csgraph import breadth_first_order
    reach = breadth_first_order(resid, src, directed=True,
                                return_predecessors=False)
    keep1 = np.zeros(n + 2, bool)
    keep1[reach] = True
    return keep1[:n].reshape(h, w)


# -------------------------------------------------- per-component DP ----
def _dp_seam_batch_core(i1, i2, valid, prefer1, hw, grad: bool):
    """Vmapped `_dp_seam` over a bucket of canonicalized component crops.

    i1, i2: (T, H, W, 3) f32; valid: (T, H, W); prefer1: (T,); hw: (T, 2)
    the REAL (h, w) of each crop inside the padded bucket.  Padded columns
    in real rows get a high wall cost so the seam cannot escape the crop
    into the zero-cost padding; fully-padded rows stay free (they add the
    same constant to every column).  Returns (T, H, W) keep1."""
    t, bh, bw = valid.shape

    def one(a, b, v, p, real_hw):
        rows = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        real_row = rows < real_hw[0]
        real_col = cols < real_hw[1]
        wall = real_row & ~real_col
        # Encode the wall by making padded columns maximally different:
        # _dp_seam builds its cost from |a - b| under the valid mask, so
        # bake the wall into a dedicated cost via image contrast.
        pad_a = jnp.where(wall[..., None], 1e4, a)
        pad_b = jnp.where(wall[..., None], -1e4, b)
        return _dp_seam(pad_a, pad_b, v | wall, p, grad)

    return jax.vmap(one)(i1, i2, valid, prefer1, hw)


@functools.partial(jax.jit, static_argnames=("grad",))
def _dp_seam_batch(i1, i2, valid, prefer1, hw, grad: bool = False):
    """Host-upload bucket entry: crops arrive float16 when that is exact
    for the content (integer-valued pixels; half the tunnel upload bytes)
    and float32 otherwise — cost math always runs in f32."""
    return _dp_seam_batch_core(i1.astype(jnp.float32),
                               i2.astype(jnp.float32), valid, prefer1, hw,
                               grad)


@functools.partial(jax.jit, static_argnames=("grad", "transpose"))
def _dp_seam_batch_dev(stack, idx_i, idx_j, off_i, off_j, valid, prefer1,
                       hw, grad: bool = False, transpose: bool = False):
    """Device-sourced bucket entry: crop content gathers from the
    device-resident padded warped stack (origin-anchored per-image rects,
    as produced by the pipeline's vmapped seam warp) instead of being
    re-uploaded from the host — only the tiny component masks travel up.

    stack: (N, Hp, Wp, 3); idx_*: (T,) image indices; off_*: (T, 2)
    (row, col) crop offsets in UNtransposed image coords; transpose: the
    bucket holds vertical-seam tasks (crops canonicalized by transposing,
    so the gather rect is (bw, bh))."""
    t, bh, bw = valid.shape
    gh, gw = (bw, bh) if transpose else (bh, bw)
    hp, wp = stack.shape[1], stack.shape[2]

    def gather_one(img_idx, off):
        # Clip-gather keeps alignment at image edges (the overread is
        # masked by the wall/valid logic downstream).
        rows = jnp.clip(off[0] + jnp.arange(gh), 0, hp - 1)
        cols = jnp.clip(off[1] + jnp.arange(gw), 0, wp - 1)
        sub = stack[img_idx][rows[:, None], cols[None, :], :]
        sub = sub.astype(jnp.float32)
        return jnp.swapaxes(sub, 0, 1) if transpose else sub

    i1 = jax.vmap(gather_one)(idx_i, off_i)
    i2 = jax.vmap(gather_one)(idx_j, off_j)
    return _dp_seam_batch_core(i1, i2, valid, prefer1, hw, grad)


def _f16_exact(a: np.ndarray) -> bool:
    """True iff every value is an integer representable exactly in f16."""
    return (float(np.abs(a).max(initial=0.0)) <= 2048.0
            and not np.any(np.mod(a, 1.0)))


def bucket_dim(x: int, lo: int = 16) -> int:
    """Next bucket size >= x from the half-octave series {2^k, 1.5*2^k}.

    Pure powers of two padded seam-scale overlaps by up to 2x in each
    dim (306 -> 512); the extra 1.5x step keeps the jit cache bounded
    (two shapes per octave) while cutting the padding waste (306 -> 384)."""
    b = lo
    while b < x:
        if b + (b >> 1) >= x:
            return b + (b >> 1)
        b <<= 1
    return b


_bucket_dim = bucket_dim  # internal alias


def _run_dp_tasks(tasks, grad: bool, images_dev=None):
    """Execute all component-seam DPs in a handful of device dispatches.

    Tasks are padded into half-octave (H, W, T) buckets (`_bucket_dim`)
    so the jit cache stays bounded; each bucket is ONE vmapped program
    (at 37 rig images the old per-pair path was 666 sequential
    dispatch+sync round trips).
    Tunnel discipline: queue every bucket's uploads first, then dispatch
    every program, then fetch ALL outputs in one packed download — the
    per-bucket np.asarray sync paid ~25-30 ms of tunnel latency per
    bucket (CLAUDE.md), and bench scenes carry several buckets.

    With `images_dev` (the device-resident padded warped stack) the crop
    CONTENT never travels: each bucket program gathers its rects on
    device and only the component masks upload."""
    from ..core.transfer import fetch_tree

    out = [None] * len(tasks)
    groups = {}
    for idx, t in enumerate(tasks):
        h, w = t["vc"].shape
        key = (_bucket_dim(h), _bucket_dim(w))
        if images_dev is not None:
            key = key + (not t["horiz"],)
        groups.setdefault(key, []).append(idx)
    uploaded = []
    for key, idxs in groups.items():
        bh, bw = key[0], key[1]
        t_pad = 1
        while t_pad < len(idxs):
            t_pad <<= 1
        vv = np.zeros((t_pad, bh, bw), bool)
        pl = np.zeros((t_pad,), bool)
        hw = np.ones((t_pad, 2), np.int32)
        if images_dev is None:
            i1 = np.zeros((t_pad, bh, bw, 3), np.float32)
            i2 = np.zeros_like(i1)
        else:
            ix_i = np.zeros((t_pad,), np.int32)
            ix_j = np.zeros((t_pad,), np.int32)
            of_i = np.zeros((t_pad, 2), np.int32)
            of_j = np.zeros((t_pad, 2), np.int32)
        for slot, idx in enumerate(idxs):
            t = tasks[idx]
            h, w = t["vc"].shape
            vv[slot, :h, :w] = t["vc"]
            pl[slot] = t["prefer1"]
            hw[slot] = (h, w)
            if images_dev is None:
                i1[slot, :h, :w] = t["c1"]
                i2[slot, :h, :w] = t["c2"]
            else:
                ix_i[slot] = t["i"]
                ix_j[slot] = t["j"]
                of_i[slot] = t["off_i"]
                of_j[slot] = t["off_j"]
        if images_dev is None:
            # f16 upload only when EXACT (integer-valued pixels within
            # f16's exact-integer range — the pipeline's u8-derived
            # crops); fractional floats (e.g. external callers, the
            # non-uniform path's resized images) keep full f32 so seam
            # placement is unchanged vs the reference comparison.
            if _f16_exact(i1) and _f16_exact(i2):
                i1 = i1.astype(np.float16)
                i2 = i2.astype(np.float16)
            uploaded.append((key, idxs, tuple(
                jnp.asarray(a) for a in (i1, i2, vv, pl, hw))))
        else:
            uploaded.append((key, idxs, tuple(
                jnp.asarray(a) for a in (ix_i, ix_j, of_i, of_j, vv, pl,
                                         hw))))
    if images_dev is None:
        pending = [(idxs, _dp_seam_batch(*bufs, grad))
                   for _, idxs, bufs in uploaded]
    else:
        pending = [(idxs, _dp_seam_batch_dev(images_dev, *bufs, grad=grad,
                                             transpose=key[2]))
                   for key, idxs, bufs in uploaded]
    fetched = fetch_tree([k for _, k in pending])
    for (idxs, _), keep in zip(pending, fetched):
        for slot, idx in enumerate(idxs):
            h, w = tasks[idx]["vc"].shape
            out[idx] = keep[slot, :h, :w]
    return out


def _dp_pair_tasks(i, j, images, corners, masks_src, sizes, images_dev,
                   period):
    """Component-DP tasks for one pair against `masks_src` (the initial
    masks in the batched path, the EVOLVED masks in strict mode)."""
    import scipy.ndimage as ndi

    cj = periodic_corner(corners[i], sizes[i], corners[j],
                         sizes[j], period)
    box = _overlap_box(corners[i], sizes[i], cj, sizes[j])
    if box[2] <= 0 or box[3] <= 0:
        return []
    m1 = _crop(masks_src[i], corners[i], box) > 0
    m2 = _crop(masks_src[j], cj, box) > 0
    ov = m1 & m2
    if not ov.any():
        return []
    if images_dev is None:
        im1 = _crop(np.asarray(images[i], np.float32), corners[i],
                    box)
        im2 = _crop(np.asarray(images[j], np.float32), cj,
                    box)
    excl1 = m1 & ~m2
    excl2 = m2 & ~m1
    lab, n_comp = ndi.label(ov)
    tasks = []
    for c, sl in enumerate(ndi.find_objects(lab, n_comp), start=1):
        if sl is None:
            continue
        comp = lab[sl] == c
        y0, y1 = sl[0].start, sl[0].stop
        x0, x1 = sl[1].start, sl[1].stop
        bh, bw = y1 - y0, x1 - x0
        # Source/sink sides: centroids of each image's exclusive
        # region in a window around the component; fall back to
        # the warped-ROI centers when an exclusive side is empty.
        wy0 = max(0, y0 - max(8, bh // 2))
        wy1 = min(box[3], y1 + max(8, bh // 2))
        wx0 = max(0, x0 - max(8, bw // 2))
        wx1 = min(box[2], x1 + max(8, bw // 2))

        def _centroid(excl, fallback):
            e = excl[wy0:wy1, wx0:wx1]
            if e.any():
                ys, xs = np.nonzero(e)
                return float(xs.mean() + wx0), float(ys.mean() + wy0)
            return fallback
        fb1 = (corners[i][0] + sizes[i][0] * 0.5 - box[0],
               corners[i][1] + sizes[i][1] * 0.5 - box[1])
        fb2 = (cj[0] + sizes[j][0] * 0.5 - box[0],
               cj[1] + sizes[j][1] * 0.5 - box[1])
        cx1, cy1 = _centroid(excl1, fb1)
        cx2, cy2 = _centroid(excl2, fb2)
        horiz = abs(cx1 - cx2) * bh >= abs(cy1 - cy2) * bw
        vc = comp
        if images_dev is None:
            c1, c2 = im1[sl], im2[sl]
        else:
            c1 = c2 = None
        if horiz:
            prefer1 = cx1 <= cx2
        else:
            if c1 is not None:
                c1 = c1.transpose(1, 0, 2)
                c2 = c2.transpose(1, 0, 2)
            vc = comp.T
            prefer1 = cy1 <= cy2
        # Crop offsets in each image's local (roi-anchored) coords
        # — the device-sourced bucket gathers rects by these.
        off_i = (box[1] - corners[i][1] + y0,
                 box[0] - corners[i][0] + x0)
        off_j = (box[1] - cj[1] + y0,
                 box[0] - cj[0] + x0)
        tasks.append(dict(i=i, j=j, box=box, sl=sl, comp=comp,
                          horiz=horiz, prefer1=prefer1,
                          c1=c1, c2=c2, vc=vc, cj=cj,
                          off_i=off_i, off_j=off_j))
    return tasks


def _apply_dp_partitions(tasks, keep1_all, masks, corners):
    """Apply component partitions in pair order against the EVOLVING
    masks: a pixel already surrendered to an earlier pair is out of play,
    so triple overlaps stay hole-free like OpenCV's sequential
    process()."""
    for t, keep1 in zip(tasks, keep1_all):
        if not t["horiz"]:
            keep1 = keep1.T
        i, j, (x, y, w, h), sl, comp = t["i"], t["j"], t["box"], t["sl"], \
            t["comp"]
        oyi = y - corners[i][1] + sl[0].start
        oxi = x - corners[i][0] + sl[1].start
        oyj = y - t["cj"][1] + sl[0].start
        oxj = x - t["cj"][0] + sl[1].start
        ch, cw = comp.shape
        sub_i = masks[i][oyi:oyi + ch, oxi:oxi + cw]
        sub_j = masks[j][oyj:oyj + ch, oxj:oxj + cw]
        ov_now = (sub_i > 0) & (sub_j > 0) & comp
        sub_i[ov_now & ~keep1] = 0
        sub_j[ov_now & keep1] = 0


def _find_seams_dp(images, corners, masks, sizes, grad: bool,
                   images_dev=None, period=None, strict: bool = False):
    """DpSeamFinder parity core: label each pair-overlap's connected
    components, seam every component separately with source/sink sides
    from the exclusive-region centroids, apply partitions sequentially
    in pair order (`image_stitching.cpp:1032-1065` machinery).

    strict=False (default): component/cost/side tables are computed ONCE
    from the initial masks and ALL DPs batch into a few bucketed device
    dispatches; only the partition APPLICATION is sequential.
    strict=True: full OpenCV order — each pair's components are relabeled
    from the masks EVOLVED by earlier pairs and its DPs dispatch before
    the next pair is examined (one dispatch group per pair: a parity
    quantification mode, not a fast path — see tools/seam_delta.py)."""
    n = len(masks)
    if strict:
        for i in range(n):
            for j in range(i + 1, n):
                tasks = _dp_pair_tasks(i, j, images, corners, masks,
                                       sizes, images_dev, period)
                if not tasks:
                    continue
                keep1_all = _run_dp_tasks(tasks, grad, images_dev)
                _apply_dp_partitions(tasks, keep1_all, masks, corners)
        return masks

    masks0 = [m.copy() for m in masks]
    tasks = []
    for i in range(n):
        for j in range(i + 1, n):
            tasks.extend(_dp_pair_tasks(i, j, images, corners, masks0,
                                        sizes, images_dev, period))
    keep1_all = _run_dp_tasks(tasks, grad, images_dev)
    _apply_dp_partitions(tasks, keep1_all, masks, corners)
    return masks


# ---------------------------------------------------------------- driver ----
def find_seams(images: Sequence[np.ndarray], corners: Sequence[Tuple[int, int]],
               masks: Sequence[np.ndarray],
               seam_type: str = "dp_color",
               images_dev=None, period=None,
               strict: bool = False) -> List[np.ndarray]:
    """seam_finder->find(images_f, corners, masks) (`:1065`): returns the
    updated masks.  seam_type in {no, voronoi, dp_color, dp_colorgrad,
    gc_color, gc_colorgrad}; unknown types raise (parity `:1059-1063`).

    images_dev: optional device-resident padded warped stack (N, Hp, Wp,
    3), each image's rect anchored at the origin and content identical to
    `images` — lets the DP bucket programs gather crop content on device
    instead of re-uploading it through the tunnel.

    period: the warped u-axis period in pixels (2*pi*scale) for periodic
    projections, enabling cross-dateline pair coupling (periodic_corner).

    strict (DP finders only): replicate OpenCV's strict sequential order —
    per-pair components relabeled from the evolving masks, one dispatch
    group per pair.  A parity-quantification mode (tools/seam_delta.py);
    the batched default is the production path."""
    known = {"no", "voronoi", "dp_color", "dp_colorgrad", "gc_color",
             "gc_colorgrad"}
    if seam_type not in known:
        raise ValueError(
            f"Can't create the following seam finder '{seam_type}'")
    masks = [np.asarray(m).copy().astype(np.uint8) for m in masks]
    if seam_type == "no":
        return masks
    n = len(masks)
    # Sizes from the masks: `images` may be None when images_dev carries
    # the content (the pipeline's default DP path never downloads the
    # warped images).
    sizes = [(m.shape[1], m.shape[0]) for m in masks]
    if images is None and (seam_type.startswith("gc")
                           or (seam_type.startswith("dp")
                               and images_dev is None)):
        raise ValueError(
            f"seam finder '{seam_type}' needs host images when no "
            "images_dev stack is provided")
    grad = seam_type.endswith("colorgrad")

    if seam_type.startswith("dp"):
        return _find_seams_dp(images, corners, masks, sizes, grad,
                              images_dev=images_dev, period=period,
                              strict=strict)

    # Graph cut: the per-pair color cost depends only on the IMAGES (not
    # the evolving masks), so prefetch every overlapping pair's cost in
    # one packed download before the sequential mask loop — the per-pair
    # np.asarray sync paid ~25-30 ms of tunnel latency each (CLAUDE.md).
    gc_costs = {}
    if seam_type.startswith("gc"):
        from ..core.transfer import fetch_tree
        pend = []
        for i in range(n):
            for j in range(i + 1, n):
                cj = periodic_corner(corners[i], sizes[i], corners[j],
                                     sizes[j], period)
                box = _overlap_box(corners[i], sizes[i], cj, sizes[j])
                if box[2] <= 0 or box[3] <= 0:
                    continue
                # Masks only ever shrink in the sequential loop below, so
                # a no-overlap check on the INITIAL masks is sound — and
                # skips the upload/compile for rect-intersecting pairs
                # whose warped masks never meet.
                m1 = _crop(masks[i], corners[i], box) > 0
                m2 = _crop(masks[j], cj, box) > 0
                if not (m1 & m2).any():
                    continue
                im1 = _crop(np.asarray(images[i], np.float32), corners[i],
                            box)
                im2 = _crop(np.asarray(images[j], np.float32), cj,
                            box)
                if _f16_exact(im1) and _f16_exact(im2):
                    im1 = im1.astype(np.float16)
                    im2 = im2.astype(np.float16)
                pend.append(((i, j), _dp_seam_cost(
                    jnp.asarray(im1), jnp.asarray(im2), grad=grad)))
        fetched = fetch_tree([c for _, c in pend])
        gc_costs = {key: cost for (key, _), cost in zip(pend, fetched)}

    for i in range(n):
        for j in range(i + 1, n):
            cj = periodic_corner(corners[i], sizes[i], corners[j],
                                 sizes[j], period)
            box = _overlap_box(corners[i], sizes[i], cj, sizes[j])
            if box[2] <= 0 or box[3] <= 0:
                continue
            m1 = _crop(masks[i], corners[i], box) > 0
            m2 = _crop(masks[j], cj, box) > 0
            ov = m1 & m2
            if not ov.any():
                continue
            if seam_type == "voronoi":
                # Distance to each image's exclusive region (native O(HW)
                # EDT when available).
                d1 = edt_sq(~(m1 & ~m2))
                d2 = edt_sq(~(m2 & ~m1))
                keep1 = d1 <= d2
            else:  # graph cut
                keep1 = _graph_cut_pair(gc_costs[(i, j)], m1 & ~m2,
                                        m2 & ~m1, ov)
            # Partition the overlap.
            x, y, w, h = box
            oxi, oyi = x - corners[i][0], y - corners[i][1]
            oxj, oyj = x - cj[0], y - cj[1]
            sub_i = masks[i][oyi:oyi + h, oxi:oxi + w]
            sub_j = masks[j][oyj:oyj + h, oxj:oxj + w]
            sub_i[ov & ~keep1] = 0
            sub_j[ov & keep1] = 0
    return masks
