"""Match-graph pruning: keep the biggest connected component.

Re-implements `myLeaveBiggestComponent`
(`/root/reference/image_stitching/image_stitching.cpp:215-278`): union-find
over image pairs whose match confidence >= conf_thresh, pick the largest
component, report kept + removed indices.  Host-side (N <= hundreds, the
graph is tiny); the caller subsets device arrays with the kept indices,
which replaces the reference's feature/match re-indexing (`:251-262`).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

__all__ = ["biggest_component", "DisjointSets"]


class DisjointSets:
    """cv::detail::DisjointSets semantics (path compression + size union)."""

    def __init__(self, n: int):
        self.parent = list(range(n))
        self.size = [1] * n

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def merge(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]


def biggest_component(confidence: np.ndarray,
                      conf_thresh: float) -> Tuple[List[int], List[int]]:
    """confidence: (N, N) pairwise match confidence.

    Returns (kept_indices, removed_indices), kept sorted ascending — the
    same subset `myLeaveBiggestComponent` computes (`:224-249`).
    """
    confidence = np.asarray(confidence)
    n = confidence.shape[0]
    from ..core import native
    if native.available():
        kept = native.biggest_component(confidence, conf_thresh)
        if kept is not None:
            removed = [i for i in range(n) if i not in set(kept)]
            return kept, removed
    ds = DisjointSets(n)
    for i in range(n):
        for j in range(n):
            if i != j and confidence[i, j] >= conf_thresh:
                ds.merge(i, j)
    roots = [ds.find(i) for i in range(n)]
    sizes = {}
    for r in roots:
        sizes[r] = sizes.get(r, 0) + 1
    max_root = max(sizes, key=lambda r: (sizes[r], -r))
    kept = [i for i in range(n) if roots[i] == max_root]
    removed = [i for i in range(n) if roots[i] != max_root]
    return kept, removed
