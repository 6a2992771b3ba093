"""A/B the BA inner solver on the real chip (VERDICT r02 item 5).

The LM while_loop's inner damped-normal-equation solve was CG-64 (64
sequential matvecs of a 56x56 system per LM step — pure sequential
depth).  Candidates: dense Cholesky ('chol'), dense LU ('lu'), CG-16.
An earlier "dense LU costs ~82ms" reading was a standalone dispatch
through the axon tunnel (sync latency, not compute); inside the fused
loop the picture may invert — this experiment settles it.

Times the FULL _lm_solve_device program (N=8 ring, Q=4096 bucket, the
e2e bench shape; and N=37 / Q=8192, the rig37 shape) per solver,
download-honest (fresh seed params per rep; sync by downloading the
result).  Also prints each solver's final cost so convergence parity is
checked, not assumed.

Usage: python tools/exp_ba_solver.py            # real TPU
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401,E402
from image_stitching_tpu.estimation.bundle_adjust import (  # noqa: E402
    BAProblem, _eval_cost, _free_mask, _lm_solve_device)
from image_stitching_tpu.geometry.rotation import (  # noqa: E402
    rodrigues_to_matrix)


def make_problem(n_cams, q_bucket, seed=0, noise_px=1.0):
    """Ring of n_cams cameras; correspondences = gt transfers + noise."""
    rng = np.random.default_rng(seed)
    h, w = 1632, 2176          # bench work-scale-ish image size
    focal = (w / 2) / np.tan(np.radians(55) / 2)
    k = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])
    step = np.radians(55) * 0.5
    rs = []
    for i in range(n_cams):
        y = i * step
        rs.append(np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0],
                            [-np.sin(y), 0, np.cos(y)]]))
    rs = np.stack(rs)
    cam_i, cam_j, p_i, p_j = [], [], [], []
    for i in range(n_cams):
        for j in (i + 1, i + 2):
            if j >= n_cams:
                continue
            hij = k @ rs[j].T @ rs[i] @ np.linalg.inv(k)
            pts = rng.uniform([0, 0], [w - 1, h - 1], (600, 2))
            q = (hij @ np.c_[pts, np.ones(len(pts))].T)
            q = (q[:2] / q[2]).T
            ok = (q[:, 0] >= 0) & (q[:, 0] < w) & (q[:, 1] >= 0) & \
                 (q[:, 1] < h)
            pts, q = pts[ok][:256], q[ok][:256]
            if len(pts) < 8:
                continue
            cam_i.append(np.full(len(pts), i, np.int32))
            cam_j.append(np.full(len(pts), j, np.int32))
            p_i.append(pts)
            p_j.append(q + rng.normal(0, noise_px, q.shape))
    qn = sum(map(len, cam_i))
    pad = q_bucket - qn
    assert pad >= 0, (qn, q_bucket)
    prob = BAProblem(
        cam_i=np.pad(np.concatenate(cam_i), (0, pad)),
        cam_j=np.pad(np.concatenate(cam_j), (0, pad), constant_values=1),
        p_i=np.pad(np.concatenate(p_i).astype(np.float32), ((0, pad), (0, 0))),
        p_j=np.pad(np.concatenate(p_j).astype(np.float32), ((0, pad), (0, 0))),
        w=np.pad(np.ones(qn, np.float32), (0, pad)))
    return prob, k, rs, focal


def seed_params(n_cams, k, rs, focal, pert_seed):
    """gt params + ~1 deg rotation perturbation (the EXIF-prior regime)."""
    rng = np.random.default_rng(1000 + pert_seed)
    rvecs = []
    for r in rs:
        # rodrigues of r via scipy-free route: perturb then convert back
        rvecs.append(_mat_to_rvec(r) + rng.normal(0, 0.017, 3))
    p = np.zeros((n_cams, 7), np.float32)
    p[:, 0] = focal
    p[:, 1] = k[0, 2]
    p[:, 2] = k[1, 2]
    p[:, 3] = 1.0
    p[:, 4:] = np.stack(rvecs)
    return jnp.asarray(p)


def _mat_to_rvec(r):
    tr = np.clip((np.trace(r) - 1) / 2, -1, 1)
    th = np.arccos(tr)
    if th < 1e-8:
        return np.zeros(3)
    ax = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0],
                   r[1, 0] - r[0, 1]]) / (2 * np.sin(th))
    return ax * th


def run(n_cams, q_bucket, label):
    prob, k, rs, focal = make_problem(n_cams, q_bucket)
    dev = {f: jnp.asarray(getattr(prob, f))
           for f in ("cam_i", "cam_j", "p_i", "p_j", "w")}
    free = jnp.asarray(_free_mask(n_cams, "_____"))
    print(f"== {label}: N={n_cams}, Q={q_bucket}, "
          f"valid={int(prob.w.sum())} ==", flush=True)
    for solver in ("cg64", "cg16", "chol", "lu"):
        def solve(params):
            return _lm_solve_device(
                params, dev["cam_i"], dev["cam_j"], dev["p_i"],
                dev["p_j"], dev["w"], free, cost="reproj",
                n_cams=n_cams, max_iters=25, solver=solver)
        out = solve(seed_params(n_cams, k, rs, focal, 0))
        float(jnp.ravel(out)[0])            # compile + warm
        reps = 5
        seeds = [seed_params(n_cams, k, rs, focal, 1 + i)
                 for i in range(reps)]
        for s in seeds:
            float(jnp.ravel(s)[0])          # pre-upload
        t0 = time.perf_counter()
        outs = [solve(s) for s in seeds]
        float(jnp.ravel(outs[-1])[0])
        dt = (time.perf_counter() - t0 - 0.03) / reps
        fc = float(_eval_cost(outs[-1], dev["cam_i"], dev["cam_j"],
                              dev["p_i"], dev["p_j"], dev["w"],
                              cost="reproj"))
        print(f"  {solver:5s}: {dt*1e3:8.2f} ms/solve   "
              f"final cost {fc:.4f}", flush=True)


def main():
    run(8, 4096, "e2e-bench shape")
    run(37, 8192, "rig37 shape")


if __name__ == "__main__":
    main()
