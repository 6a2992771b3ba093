"""Euler rotation-order enum.

Mirrors the capability of `/root/reference/image_stitching/euler_order.h:3-11`
(enum XYZ/XZY/YXZ/YZX/ZXY/ZYX).  Orders name intrinsic axis-rotation
sequences composed left-to-right: ``XYZ`` => ``R = Rx @ Ry @ Rz``.
"""

from __future__ import annotations

import enum


class EulerOrder(enum.Enum):
    XYZ = "XYZ"
    XZY = "XZY"
    YXZ = "YXZ"
    YZX = "YZX"
    ZXY = "ZXY"
    ZYX = "ZYX"

    @classmethod
    def _missing_(cls, value):
        if isinstance(value, str):
            return cls[value.upper()]
        return None


ALL_ORDERS = tuple(EulerOrder)
