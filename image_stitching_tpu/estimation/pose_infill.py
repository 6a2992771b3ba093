"""Nearest-neighbor pose infill for dropped cameras.

Re-implements the reference's disabled elastic-recovery experiment
(`/root/reference/image_stitching/image_stitching.cpp:754-866`, behind
``if (0)``): images removed by the component filter get a refined pose
synthesized from the nearest kept neighbor *within their rig ring* —
the neighbor's refined rotation composed with the sensor-prior delta
between the two cameras (YXZ euler deltas in yaw/pitch, roll zeroed,
exactly the dead variant's recipe at `:834-843`).

This turns 'drop, don't die' (SURVEY.md section 5 failure detection) into
full recovery when sensor priors exist for every frame.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..core.rig import CaptureRig, DEFAULT_RIG
from ..geometry.camera import Cameras
from ..geometry.euler import (euler_to_rotation_matrix,
                              rotation_matrix_to_euler)
from ..geometry.euler_order import EulerOrder

__all__ = ["infill_dropped_cameras"]


def _find_nearest_kept(kept: set, idx: int, n: int,
                       rig: Optional[CaptureRig]) -> Optional[int]:
    """`find_nearest_index` (image_stitchin3g-era logic at :764-820):
    search outward within the ring first, then globally."""
    if rig is not None and idx < rig.total_images:
        group = rig.group_of(idx)
        lo, hi = rig.group_start_end(group)
        i = j = idx
        while True:
            if i < hi:
                i += 1
            if j > lo:
                j -= 1
            if i in kept:
                return i
            if j in kept:
                return j
            if i == hi and j == lo:
                break
    i = j = idx
    while True:
        if i < n - 1:
            i += 1
        if j > 0:
            j -= 1
        if i in kept:
            return i
        if j in kept:
            return j
        if i == n - 1 and j == 0:
            return None


def infill_dropped_cameras(priors: Cameras, refined: Cameras,
                           kept_indices: Sequence[int],
                           rig: Optional[CaptureRig] = DEFAULT_RIG
                           ) -> Cameras:
    """Build a full N-camera set: refined poses where kept, synthesized
    elsewhere.

    priors: all-N sensor-prior cameras (work scale); refined: len(kept)
    bundle-adjusted cameras; returns N cameras.
    """
    n = len(priors)
    kept = set(int(i) for i in kept_indices)
    kept_list = list(kept_indices)
    pos_of = {int(k): a for a, k in enumerate(kept_list)}

    focal = np.asarray(priors.focal).copy()
    aspect = np.asarray(priors.aspect).copy()
    ppx = np.asarray(priors.ppx).copy()
    ppy = np.asarray(priors.ppy).copy()
    rs = np.asarray(priors.R).copy()
    ts = np.asarray(priors.t).copy()
    r_ref = np.asarray(refined.R)
    f_ref = np.asarray(refined.focal)
    px_ref = np.asarray(refined.ppx)
    py_ref = np.asarray(refined.ppy)

    for i in range(n):
        if i in kept:
            a = pos_of[i]
            rs[i] = r_ref[a]
            focal[i] = f_ref[a]
            ppx[i] = px_ref[a]
            ppy[i] = py_ref[a]
            continue
        nb = _find_nearest_kept(kept, i, n, rig)
        if nb is None:
            continue  # keep the raw prior
        a = pos_of[nb]
        # YXZ euler deltas between MY prior and the neighbor's prior,
        # applied on top of the neighbor's refined pose (:834-842):
        # base_E[yaw] += dYaw; base_E[pitch] += dPitch; roll = 0.
        cur_e = np.asarray(rotation_matrix_to_euler(rs[i], EulerOrder.YXZ))
        ref_e = np.asarray(rotation_matrix_to_euler(
            np.asarray(priors.R)[nb], EulerOrder.YXZ))
        base_e = np.asarray(rotation_matrix_to_euler(r_ref[a],
                                                     EulerOrder.YXZ))
        base_e = base_e.copy()
        base_e[1] += cur_e[1] - ref_e[1]
        base_e[0] += cur_e[0] - ref_e[0]
        base_e[2] = 0.0
        rs[i] = np.asarray(euler_to_rotation_matrix(
            base_e.astype(np.float32), EulerOrder.YXZ))
        focal[i] = f_ref[a]
        ppx[i] = px_ref[a]
        ppy[i] = py_ref[a]

    return Cameras(focal=focal, aspect=aspect, ppx=ppx, ppy=ppy,
                   R=rs.astype(np.float32), t=ts)
