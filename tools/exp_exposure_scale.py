"""Geometry-only analysis of the rig37 GAIN_BLOCKS exposure table scale.

Reproduces the seam-scale warp ROIs of the flagship 37-image rig
(`/root/reference/image_stitching/image_stitching.cpp:87-102`) without
rendering or running devices, then reports:
  * b_tot / b_cap for the current global-block-indexed pair tables, and
  * per-pair overlap-rect-LOCAL block counts for the redesigned tables,
so the table/download shrink of backlog #1 can be sized before building it.
"""
import math
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_stitching_tpu.data.synth import DEFAULT_RIG
from image_stitching_tpu.geometry.euler import euler_to_rotation_matrix
from image_stitching_tpu.geometry.euler_order import EulerOrder
from image_stitching_tpu.ops.warps import make_warper
from image_stitching_tpu.ops.exposure import _block_grid, _overlap_rect

H, W = int(os.environ.get("RIG_H", "960")), int(os.environ.get("RIG_W", "1280"))
FOV = 68.0
BLOCK = 64

focal = (W / 2.0) / math.tan(math.radians(FOV) / 2.0)
k = np.array([[focal, 0, W / 2.0], [0, focal, H / 2.0], [0, 0, 1]], np.float64)
rig = DEFAULT_RIG
n = rig.total_images
rs = []
for i in range(n):
    pitch, yaw, roll = rig.rotation_prior(i)
    eul = np.array([pitch, yaw, roll], np.float32)
    rs.append(np.asarray(euler_to_rotation_matrix(eul, EulerOrder.YXZ), np.float64))

# pipeline scales (stitcher.py): work = min(1, sqrt(work_mp*1e6/(W*H)));
# default bench rig37 uses work_megapix=-1? cfg default work_megapix=-1 -> full res?
# Reference default: work=-1 (full), seam_megapix=0.1, compose 0.4.
work_scale = 1.0
seam_scale = min(1.0, math.sqrt(0.1e6 / (W * H)))
swa = seam_scale / work_scale
warped_image_scale = focal  # median focal at work scale
warper = make_warper("spherical", warped_image_scale * swa)

k_seam = k.copy()
k_seam[0, :] *= seam_scale
k_seam[1, :] *= seam_scale
seam_hw = (int(round(H * seam_scale)), int(round(W * seam_scale)))

rois = []
for i in range(n):
    rois.append(warper.warp_roi(seam_hw, k_seam.astype(np.float32),
                                rs[i].astype(np.float32)))
corners = [(r[0], r[1]) for r in rois]
sizes = [(r[2], r[3]) for r in rois]
print("seam_hw", seam_hw, "scale", warper.scale)
ws = [s[0] for s in sizes]; hs = [s[1] for s in sizes]
print("warped sizes: w min/med/max", min(ws), int(np.median(ws)), max(ws),
      " h min/med/max", min(hs), int(np.median(hs)), max(hs))

grids = [_block_grid(w, h, BLOCK) for (w, h) in sizes]
bcounts = [g[0] * g[1] for g in grids]
b_tot = sum(bcounts)
b_cap_raw = max(bcounts)
b_cap = -(-b_cap_raw // 32) * 32
print(f"b_tot={b_tot} b_cap_raw={b_cap_raw} b_cap(snap32)={b_cap}")
print("per-image blocks: min/med/max", min(bcounts), int(np.median(bcounts)), max(bcounts))

# pair overlap stats
n_pairs = 0
old_bytes = 0
new_entries = []
areas = []
for i in range(n):
    for j in range(i + 1, n):
        x, y, w, h = _overlap_rect(corners[i], sizes[i], corners[j], sizes[j])
        if w <= 0 or h <= 0:
            continue
        n_pairs += 1
        areas.append(w * h)
        gwi, ghi, bwi, bhi = grids[i]
        gwj, ghj, bwj, bhj = grids[j]
        oxi, oyi = x - corners[i][0], y - corners[i][1]
        oxj, oyj = x - corners[j][0], y - corners[j][1]
        li = ((oxi + w - 1) // bwi - oxi // bwi + 1) * ((oyi + h - 1) // bhi - oyi // bhi + 1)
        lj = ((oxj + w - 1) // bwj - oxj // bwj + 1) * ((oyj + h - 1) // bhj - oyj // bhj + 1)
        new_entries.append((li, lj, w, h))
# old table: per pair b_cap^2 x (1 cnt + 2 sums) f32
old_per_pair = b_cap * b_cap * 3 * 4
lis = np.array([e[0] for e in new_entries]); ljs = np.array([e[1] for e in new_entries])
l_cap = max(lis.max(), ljs.max())
print(f"pairs with rect overlap: {n_pairs}/666")
print(f"overlap areas px: min/med/max {min(areas)} {int(np.median(areas))} {max(areas)}")
print(f"local blocks per side: li med/max {int(np.median(lis))}/{lis.max()}  lj med/max {int(np.median(ljs))}/{ljs.max()}")
print(f"OLD: per-pair table {old_per_pair/1e6:.2f} MB -> total {n_pairs*old_per_pair/1e9:.2f} GB download")
# new: bucketed l_cap per bucket; upper bound with global l_cap
new_per_pair = int(l_cap) * int(l_cap) * 3 * 4
print(f"NEW (global l_cap={l_cap}): per-pair {new_per_pair/1e3:.1f} KB -> total {n_pairs*new_per_pair/1e6:.1f} MB")
# what if capped per-bucket: show distribution of li*lj
prod = lis * ljs
print("li*lj percentile 50/90/99/max:", np.percentile(prod, [50,90,99]).astype(int), prod.max())
