"""Bundle adjustment: Levenberg-Marquardt over camera parameters.

Replaces cv::detail::BundleAdjuster{Reproj,Ray} and NoBundleAdjuster as
configured at `/root/reference/image_stitching/image_stitching.cpp:680-713`:

  * parameterization: 7 values per camera — focal, ppx, ppy, aspect and a
    Rodrigues rotation (rotations are ALWAYS refined; the intrinsics are
    gated by the 5-char refine mask exactly as built at `:695-706`:
    mask[0]->focal (0,0), mask[2]->ppx (0,2), mask[3]->aspect (1,1),
    mask[4]->ppy (1,2); mask[1] is the K skew slot, unused by these BAs).
    The reference default ``"_____"`` therefore refines *rotations only*,
    seeded from the EXIF sensor priors.
  * residuals: 'reproj' — pixel transfer error through
    H_ij = K_j R_j^T R_i K_i^-1 over RANSAC-inlier correspondences of every
    pair with confidence > conf_thresh; 'ray' — angular distance between
    the back-projected unit rays scaled by sqrt(f_i f_j).
  * TPU-first solve: correspondences are packed host-side once into static
    arrays; every LM iteration is ONE jitted computation — per-
    correspondence (2 x 14) Jacobians via jacfwd under vmap, scatter-added
    into the (7N, 7N) normal equations, Jacobi-preconditioned damped solve.

The failure mode parity: if the solve produces non-finite parameters we
raise, mirroring "Camera parameters adjusting failed." (`:709-713`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Cameras, make_k
from ..geometry.rotation import matrix_to_rodrigues, rodrigues_to_matrix

__all__ = ["bundle_adjust", "pack_correspondences", "BAProblem"]


@dataclasses.dataclass
class BAProblem:
    """Packed static-shape correspondence table."""
    cam_i: np.ndarray   # (Q,) int32
    cam_j: np.ndarray   # (Q,) int32
    p_i: np.ndarray     # (Q, 2) float32
    p_j: np.ndarray     # (Q, 2) float32
    w: np.ndarray       # (Q,) float32 weights (0 = padding)


def pack_correspondences(feats, pair_matches, conf_thresh: float,
                         max_per_edge: int = 256,
                         seed: int = 0) -> Optional[BAProblem]:
    """Host-side: gather inlier correspondences of confident pairs into a
    fixed-size table (the BA edge set, cf. BundleAdjusterBase::estimate's
    edges from conf > conf_thresh)."""
    conf = np.asarray(pair_matches.confidence)
    a_idx = np.asarray(pair_matches.a_idx)
    b_idx = np.asarray(pair_matches.b_idx)
    inlier = np.asarray(pair_matches.inlier)
    xy = np.asarray(feats.xy)
    rng = np.random.default_rng(seed)

    if hasattr(pair_matches, "ii"):
        # MatchGraph pair-list: correspondence tables exist only for the
        # computed upper-triangle pairs — exactly the i < j set the dense
        # walk visited.
        edges = [(int(i), int(j), p)
                 for p, (i, j) in enumerate(zip(
                     np.asarray(pair_matches.ii),
                     np.asarray(pair_matches.jj)))]
    else:  # dense (N, N, 2K) PairMatches-style tables
        n = conf.shape[0]
        edges = [(i, j, (i, j)) for i in range(n) for j in range(i + 1, n)]

    cam_i, cam_j, p_i, p_j = [], [], [], []
    for i, j, row_key in edges:
        if conf[i, j] <= conf_thresh:
            continue
        rows = np.nonzero(inlier[row_key])[0]
        if len(rows) == 0:
            continue
        if len(rows) > max_per_edge:
            rows = rng.choice(rows, max_per_edge, replace=False)
        cam_i.append(np.full(len(rows), i, np.int32))
        cam_j.append(np.full(len(rows), j, np.int32))
        p_i.append(xy[i][a_idx[row_key][rows]])
        p_j.append(xy[j][b_idx[row_key][rows]])
    if not cam_i:
        return None
    q = sum(len(c) for c in cam_i)
    # Bucket the table size (next power of two, min 256): Q varies with
    # the data, and every distinct Q would recompile the ~40s LM program.
    bucket = 256
    while bucket < q:
        bucket *= 2
    pad = bucket - q
    return BAProblem(
        cam_i=np.pad(np.concatenate(cam_i), (0, pad)),
        cam_j=np.pad(np.concatenate(cam_j), (0, pad), constant_values=1),
        p_i=np.pad(np.concatenate(p_i).astype(np.float32),
                   ((0, pad), (0, 0))),
        p_j=np.pad(np.concatenate(p_j).astype(np.float32),
                   ((0, pad), (0, 0))),
        w=np.pad(np.ones(q, np.float32), (0, pad)),  # zero-weight padding
    )


@jax.jit
def _params_from_arrays(r, focal, ppx, ppy, aspect) -> jnp.ndarray:
    # ONE jitted program: eager op-by-op execution of the ~40 tiny jnp
    # ops in matrix_to_rodrigues costs ~170 ms of per-dispatch tunnel
    # latency on axon (measured, tools/vga_census.py r05) vs ~0 jitted.
    rvec = matrix_to_rodrigues(r.astype(jnp.float32))
    return jnp.concatenate([
        focal.astype(jnp.float32)[:, None],
        ppx.astype(jnp.float32)[:, None],
        ppy.astype(jnp.float32)[:, None],
        aspect.astype(jnp.float32)[:, None],
        rvec,
    ], axis=1)  # (N, 7)


def _params_from_cameras(cams: Cameras) -> jnp.ndarray:
    return _params_from_arrays(
        jnp.asarray(cams.R), jnp.asarray(cams.focal),
        jnp.asarray(cams.ppx), jnp.asarray(cams.ppy),
        jnp.asarray(cams.aspect))


_rodrigues_to_matrix_jit = jax.jit(rodrigues_to_matrix)


def _cameras_from_params(params: jnp.ndarray, template: Cameras) -> Cameras:
    return Cameras(
        focal=params[:, 0], ppx=params[:, 1], ppy=params[:, 2],
        aspect=params[:, 3], R=rodrigues_to_matrix(params[:, 4:7]),
        t=jnp.asarray(template.t))


def _residual_one(pi, pj, cam_a, cam_b, cost: str):
    """Residual for one correspondence given the two cameras' 7-params."""
    fa, pxa, pya, aa = cam_a[0], cam_a[1], cam_a[2], cam_a[3]
    fb, pxb, pyb, ab = cam_b[0], cam_b[1], cam_b[2], cam_b[3]
    ra = rodrigues_to_matrix(cam_a[4:7])
    rb = rodrigues_to_matrix(cam_b[4:7])
    # Unit ray of p_i in the panorama frame: R_a K_a^-1 p, with the
    # analytic K^-1 (a per-correspondence jnp.linalg.solve lowers to a
    # batched tiny LU — the dominant cost of the whole BA on TPU).
    pa = jnp.array([(pi[0] - pxa) / fa, (pi[1] - pya) / (fa * aa), 1.0])
    ray = ra @ pa
    if cost == "ray":
        pb = jnp.array([(pj[0] - pxb) / fb, (pj[1] - pyb) / (fb * ab), 1.0])
        ray2 = rb @ pb
        d1 = ray / jnp.maximum(jnp.linalg.norm(ray), 1e-12)
        d2 = ray2 / jnp.maximum(jnp.linalg.norm(ray2), 1e-12)
        mult = jnp.sqrt(jnp.abs(fa * fb))
        return mult * (d1 - d2)
    # reproj: project into camera b.
    kb = make_k(fb, ab, pxb, pyb)
    q = kb @ (rb.T @ ray)
    qz = jnp.where(jnp.abs(q[2]) < 1e-12, 1e-12, q[2])
    r = jnp.array([pj[0] - q[0] / qz, pj[1] - q[1] / qz])
    # Redescending (Tukey-style) robust weight, c = 48 px: correspondences
    # from spurious-but-confident pairs (repetitive texture) start hundreds
    # of px off when seeded from priors and would otherwise drag every
    # rotation; beyond c they exert zero force.  RANSAC inliers sit at
    # <= 3 px where the weight is within 0.5% of 1, so clean problems are
    # numerically unchanged vs OpenCV's plain LM.
    c = 48.0
    nrm2 = jnp.sum(r * r)
    # IRLS: the weight is a constant at each linearization point
    # (stop_gradient), otherwise the redescending w'(r) term flips descent
    # directions and LM stalls.
    w_rob = jax.lax.stop_gradient(jnp.maximum(0.0, 1.0 - nrm2 / (c * c)))
    return r * w_rob


@functools.partial(jax.jit, static_argnames=("cost", "n_cams"))
def _lm_normal_eqs(params, cam_i, cam_j, p_i, p_j, w, free_mask, *,
                   cost: str, n_cams: int):
    """One pass: residuals + scatter-accumulated J^T J and J^T r."""
    def corr_fn(pvec14, pi, pj):
        return _residual_one(pi, pj, pvec14[:7], pvec14[7:], cost)

    def per_corr(ci, cj, pi, pj, wi):
        pvec = jnp.concatenate([params[ci], params[cj]])
        r = corr_fn(pvec, pi, pj)
        jac = jax.jacfwd(corr_fn)(pvec, pi, pj)   # (rdim, 14)
        return r * wi, jac * wi

    res, jacs = jax.vmap(per_corr)(cam_i, cam_j, p_i, p_j, w)
    # Assemble the (7N, 7N) normal equations densely via one-hot einsums:
    # XLA scatter-add of (Q, 14, 14) blocks costs ~84ms/iteration on TPU,
    # the dense contraction is microseconds at these sizes.
    p_total = n_cams * 7
    oh_i = jax.nn.one_hot(cam_i, n_cams, dtype=jnp.float32)   # (Q, N)
    oh_j = jax.nn.one_hot(cam_j, n_cams, dtype=jnp.float32)
    jtj_blocks = jnp.einsum("qri,qrj->qij", jacs, jacs)       # (Q, 14, 14)
    jtr_blocks = jnp.einsum("qri,qr->qi", jacs, res)          # (Q, 14)

    def blocks(sel_a, sel_b, sl_a, sl_b):
        # (N, N, 7, 7) accumulation of the chosen 7x7 quadrant.
        return jnp.einsum("qa,qb,qij->abij", sel_a, sel_b,
                          jtj_blocks[:, sl_a, sl_b])

    s_i, s_j = slice(0, 7), slice(7, 14)
    big = (blocks(oh_i, oh_i, s_i, s_i) + blocks(oh_j, oh_j, s_j, s_j) +
           blocks(oh_i, oh_j, s_i, s_j) + blocks(oh_j, oh_i, s_j, s_i))
    jtj = big.transpose(0, 2, 1, 3).reshape(p_total, p_total)
    jtr = (jnp.einsum("qa,qi->ai", oh_i, jtr_blocks[:, :7]) +
           jnp.einsum("qa,qi->ai", oh_j, jtr_blocks[:, 7:])).reshape(-1)
    # Freeze masked params.
    jtj = jnp.where(free_mask[:, None] & free_mask[None, :], jtj, 0.0)
    jtj = jtj + jnp.diag(jnp.where(free_mask, 0.0, 1.0))
    jtr = jnp.where(free_mask, jtr, 0.0)
    cost_val = jnp.sum(res * res)
    return cost_val, jtj, jtr


def _cg_solve(a: jnp.ndarray, b: jnp.ndarray, iters: int = 64) -> jnp.ndarray:
    """Jacobi-preconditioned conjugate gradients for small SPD systems."""
    dinv = 1.0 / jnp.maximum(jnp.diag(a), 1e-8)
    x = jnp.zeros_like(b)
    r = b
    z = dinv * r
    p = z
    rz = jnp.dot(r, z)

    def step(_, carry):
        x, r, p, rz = carry
        ap = a @ p
        denom = jnp.maximum(jnp.dot(p, ap), 1e-20)
        alpha = rz / denom
        x = x + alpha * p
        r = r - alpha * ap
        z = dinv * r
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        return x, r, z + beta * p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, step, (x, r, p, rz))
    return x


def _inner_solve(a: jnp.ndarray, b: jnp.ndarray, solver: str) -> jnp.ndarray:
    """Damped-normal-equation solve, selectable (tools/exp_ba_solver.py).

    'chol' is the default for the rigs this framework targets (7N <= 448
    unknowns): inside the fused LM while_loop a dense Cholesky of the
    already-Jacobi-scaled SPD system has no dispatch overhead and no
    64-deep sequential matvec chain (the prior CG-64).  An earlier ~82ms
    reading for a dense solve was a standalone dispatch through the axon
    tunnel (sync-latency, not compute).  'cg64'/'cg16' retained for
    larger rigs and A/B runs."""
    if solver == "chol":
        # The gauge null space (global rotation) makes JTJ singular; CG
        # never leaves the range space (b = J^T r is orthogonal to the
        # null space) but a float32 Cholesky at lam ~ 1e-7 would amplify
        # null-space noise by 1/lam.  The system is Jacobi-scaled to unit
        # diagonal, so a 1e-5 jitter floor bounds the condition number at
        # ~1e5 while perturbing genuine steps negligibly.
        a = a + 1e-5 * jnp.eye(a.shape[0], dtype=a.dtype)
        cf = jax.scipy.linalg.cho_factor(a)
        return jax.scipy.linalg.cho_solve(cf, b)
    if solver == "lu":
        return jnp.linalg.solve(a, b)
    if solver == "cg16":
        return _cg_solve(a, b, iters=16)
    return _cg_solve(a, b, iters=64)


@functools.partial(jax.jit, static_argnames=("cost",))
def _eval_cost(params, cam_i, cam_j, p_i, p_j, w, *, cost: str):
    def per_corr(ci, cj, pi, pj, wi):
        pvec = jnp.concatenate([params[ci], params[cj]])
        return _residual_one(pi, pj, pvec[:7], pvec[7:], cost) * wi
    res = jax.vmap(per_corr)(cam_i, cam_j, p_i, p_j, w)
    return jnp.sum(res * res)


@functools.partial(jax.jit, static_argnames=("cost", "n_cams", "max_iters",
                                             "solver"))
def _lm_solve_device(params, cam_i, cam_j, p_i, p_j, w, free_mask, *,
                     cost: str, n_cams: int, max_iters: int,
                     solver: str = "chol"):
    """The whole LM loop as one device program (lax.while_loop).

    On axon every host sync costs ~25ms; the host-driven loop paid 2+
    syncs per iteration.  Carry: (params, lam, cost, iters, done)."""
    def normal_eqs(p):
        return _lm_normal_eqs(p, cam_i, cam_j, p_i, p_j, w, free_mask,
                              cost=cost, n_cams=n_cams)

    cost0, jtj0, jtr0 = normal_eqs(params)
    state = (params, jnp.float32(1e-3), cost0, jtj0, jtr0, jnp.int32(0),
             jnp.bool_(False))

    def cond(s):
        _, lam, _, _, _, it, done = s
        return (~done) & (it < max_iters) & (lam < 1e6)

    def step(s):
        p, lam, c, jtj, jtr, it, done = s
        diag = jnp.diag(jtj)
        precond = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-8))
        a = jtj * precond[:, None] * precond[None, :]
        a = a + lam * jnp.eye(a.shape[0])
        stp = precond * _inner_solve(a, precond * jtr, solver)
        new_p = p - stp.reshape(p.shape)
        new_c = _eval_cost(new_p, cam_i, cam_j, p_i, p_j, w, cost=cost)
        accept = jnp.isfinite(new_c) & (new_c < c)
        p2 = jnp.where(accept, new_p, p)
        lam2 = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-7), lam * 10.0)
        converged = accept & ((c - new_c) < 1e-9 * (1.0 + new_c))
        c2, jtj2, jtr2 = jax.lax.cond(
            accept, lambda q: normal_eqs(q),
            lambda q: (c, jtj, jtr), p2)
        return (p2, lam2, c2, jtj2, jtr2, it + 1, converged)

    params, _, _, _, _, _, _ = jax.lax.while_loop(cond, step, state)
    return params


def _free_mask(n_cams: int, refine_mask: str) -> np.ndarray:
    per_cam = np.zeros(7, bool)
    m = (refine_mask + "_____")[:5]
    per_cam[0] = m[0] == "x"   # focal    (0,0)
    per_cam[1] = m[2] == "x"   # ppx      (0,2)
    per_cam[2] = m[4] == "x"   # ppy      (1,2)
    per_cam[3] = m[3] == "x"   # aspect   (1,1)
    per_cam[4:7] = True        # rotation always refined
    return np.tile(per_cam, n_cams)


@functools.partial(jax.jit, static_argnames=("n_cams", "max_iters"))
def _affine_lm_solve(params, cam_i, cam_j, p_i, p_j, w, *, n_cams: int,
                     max_iters: int):
    """LM over per-camera similarities (BundleAdjusterAffinePartial).

    params: (N, 4) = (a, b, tx, ty) with A = [[a,-b,tx],[b,a,ty],[0,0,1]]
    mapping image coords into the common frame; residual = transfer error
    of each correspondence through A_j^-1 A_i, evaluated in image j.
    """
    def apply_a(p4, xy):
        a, b, tx, ty = p4[0], p4[1], p4[2], p4[3]
        return jnp.array([a * xy[0] - b * xy[1] + tx,
                          b * xy[0] + a * xy[1] + ty])

    def apply_a_inv(p4, xy):
        a, b, tx, ty = p4[0], p4[1], p4[2], p4[3]
        det = jnp.maximum(a * a + b * b, 1e-12)
        dx, dy = xy[0] - tx, xy[1] - ty
        return jnp.array([(a * dx + b * dy) / det,
                          (-b * dx + a * dy) / det])

    def residual(pvec8, pi, pj):
        q = apply_a_inv(pvec8[4:], apply_a(pvec8[:4], pi))
        return pj - q

    def normal_eqs(params):
        def per_corr(ci, cj, pi, pj, wi):
            pvec = jnp.concatenate([params[ci], params[cj]])
            r = residual(pvec, pi, pj) * wi
            jac = jax.jacfwd(residual)(pvec, pi, pj) * wi
            return r, jac
        res, jacs = jax.vmap(per_corr)(cam_i, cam_j, p_i, p_j, w)
        four = jnp.arange(4, dtype=jnp.int32)
        idx = jnp.concatenate([cam_i[:, None] * 4 + four[None],
                               cam_j[:, None] * 4 + four[None]], axis=1)
        p_total = n_cams * 4
        jtj = jnp.zeros((p_total, p_total), jnp.float32)
        jtj = jtj.at[idx[:, :, None], idx[:, None, :]].add(
            jnp.einsum("qri,qrj->qij", jacs, jacs))
        jtr = jnp.zeros((p_total,), jnp.float32)
        jtr = jtr.at[idx].add(jnp.einsum("qri,qr->qi", jacs, res))
        # Gauge fix: freeze camera 0 (the global similarity is free).
        freeze = jnp.arange(p_total) < 4
        jtj = jnp.where(freeze[:, None] | freeze[None, :], 0.0, jtj)
        jtj = jtj + jnp.diag(jnp.where(freeze, 1.0, 0.0))
        jtr = jnp.where(freeze, 0.0, jtr)
        return jnp.sum(res * res), jtj, jtr

    def eval_cost(params):
        def per_corr(ci, cj, pi, pj, wi):
            pvec = jnp.concatenate([params[ci], params[cj]])
            return residual(pvec, pi, pj) * wi
        r = jax.vmap(per_corr)(cam_i, cam_j, p_i, p_j, w)
        return jnp.sum(r * r)

    c0, jtj, jtr = normal_eqs(params)
    state = (params, jnp.float32(1e-3), c0, jtj, jtr, jnp.int32(0),
             jnp.bool_(False))

    def cond(s):
        _, lam, _, _, _, it, done = s
        return (~done) & (it < max_iters) & (lam < 1e6)

    def step(s):
        p, lam, c, jtj, jtr, it, done = s
        diag = jnp.diag(jtj)
        precond = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-8))
        a = jtj * precond[:, None] * precond[None, :] + \
            lam * jnp.eye(jtj.shape[0])
        stp = precond * _cg_solve(a, precond * jtr)
        new_p = p - stp.reshape(p.shape)
        new_c = eval_cost(new_p)
        accept = jnp.isfinite(new_c) & (new_c < c)
        p2 = jnp.where(accept, new_p, p)
        lam2 = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-7), lam * 10.0)
        converged = accept & ((c - new_c) < 1e-9 * (1.0 + new_c))
        c2, jtj2, jtr2 = jax.lax.cond(accept, normal_eqs,
                                      lambda q: (c, jtj, jtr), p2)
        return (p2, lam2, c2, jtj2, jtr2, it + 1, converged)

    params, _, _, _, _, _, _ = jax.lax.while_loop(cond, step, state)
    return params


def _affine_bundle_adjust(cams: Cameras, problem: BAProblem,
                          max_iters: int) -> Cameras:
    """cams.R holds per-camera 3x3 affine transforms (affine pipeline)."""
    r = np.asarray(cams.R, np.float32)
    params = np.stack([r[:, 0, 0], r[:, 1, 0], r[:, 0, 2], r[:, 1, 2]],
                      axis=1)
    out = np.asarray(_affine_lm_solve(
        jnp.asarray(params), jnp.asarray(problem.cam_i),
        jnp.asarray(problem.cam_j), jnp.asarray(problem.p_i),
        jnp.asarray(problem.p_j), jnp.asarray(problem.w),
        n_cams=len(cams), max_iters=max_iters))
    if not np.all(np.isfinite(out)):
        raise RuntimeError("Camera parameters adjusting failed.")
    a, b, tx, ty = out[:, 0], out[:, 1], out[:, 2], out[:, 3]
    n = len(cams)
    rs = np.zeros((n, 3, 3), np.float32)
    rs[:, 0, 0] = a
    rs[:, 0, 1] = -b
    rs[:, 0, 2] = tx
    rs[:, 1, 0] = b
    rs[:, 1, 1] = a
    rs[:, 1, 2] = ty
    rs[:, 2, 2] = 1.0
    return Cameras(focal=cams.focal, aspect=cams.aspect, ppx=cams.ppx,
                   ppy=cams.ppy, R=rs, t=cams.t)


def bundle_adjust(cams: Cameras, problem: Optional[BAProblem],
                  cost_func: str = "reproj", refine_mask: str = "_____",
                  max_iters: int = 25) -> Cameras:
    """LM-refine cameras.  cost_func in {'reproj', 'ray', 'affine', 'no'}.

    Unknown cost funcs raise (parity with `:689-693`); 'no' or an empty
    problem returns the seed cameras unchanged (NoBundleAdjuster);
    'affine' runs BundleAdjusterAffinePartial semantics over per-camera
    similarities stored in R."""
    if cost_func == "no" or problem is None:
        return cams
    if cost_func == "affine":
        return _affine_bundle_adjust(cams, problem, max_iters)
    if cost_func not in ("reproj", "ray"):
        raise ValueError(
            f"Unknown bundle adjustment cost function: '{cost_func}'")

    n = len(cams)
    params = _params_from_cameras(cams)
    free = jnp.asarray(_free_mask(n, refine_mask))
    # Dense Cholesky for the rigs this targets (<= 64 cams, 7N <= 448
    # unknowns); CG for anything larger where a dense factor would not
    # fit the depth budget.  STITCH_BA_SOLVER overrides for A/B runs.
    import os as _os
    solver = _os.environ.get("STITCH_BA_SOLVER",
                             "chol" if n <= 64 else "cg64")
    params = _lm_solve_device(
        params, jnp.asarray(problem.cam_i), jnp.asarray(problem.cam_j),
        jnp.asarray(problem.p_i), jnp.asarray(problem.p_j),
        jnp.asarray(problem.w), free, cost=cost_func, n_cams=n,
        max_iters=max_iters, solver=solver)

    # Return HOST-numpy cameras via ONE packed download: every later
    # consumer (serializer, wave_correct, median focal, K() in the warp
    # and compose stages) calls np.asarray on the fields, and with
    # device-array fields each of those was a separate ~27 ms tunnel
    # sync (~0.16 s of unattributed wall per stitch at VGA scale).
    from ..core.transfer import fetch_tree
    p_host, r_host = fetch_tree(
        (params, _rodrigues_to_matrix_jit(params[:, 4:7])))
    if not np.all(np.isfinite(p_host)):
        raise RuntimeError("Camera parameters adjusting failed.")
    return Cameras(
        focal=p_host[:, 0].copy(), ppx=p_host[:, 1].copy(),
        ppy=p_host[:, 2].copy(), aspect=p_host[:, 3].copy(),
        R=r_host, t=np.asarray(cams.t))
