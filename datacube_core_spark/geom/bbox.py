"""Bounding box in cartesian coordinates.

Semantics match the reference engine's BoundingBox
(``datacube/utils/geometry/_base.py:39-116``): a ``(left, bottom, right,
top)`` namedtuple with buffer/transform/union/intersection helpers.
Re-implemented from the documented behavior — no code copied.
"""

from __future__ import annotations

import itertools
from typing import Iterable, NamedTuple, Tuple


class BoundingBox(NamedTuple):
    left: float
    bottom: float
    right: float
    top: float

    def buffered(self, ybuff: float, xbuff: float) -> "BoundingBox":
        """Pad the box by ``ybuff`` vertically and ``xbuff`` horizontally."""
        return BoundingBox(
            left=self.left - xbuff,
            bottom=self.bottom - ybuff,
            right=self.right + xbuff,
            top=self.top + ybuff,
        )

    @property
    def span_x(self) -> float:
        return self.right - self.left

    @property
    def span_y(self) -> float:
        return self.top - self.bottom

    @property
    def range_x(self) -> Tuple[float, float]:
        return (self.left, self.right)

    @property
    def range_y(self) -> Tuple[float, float]:
        return (self.bottom, self.top)

    @property
    def points(self):
        x0, y0, x1, y1 = self.left, self.bottom, self.right, self.top
        return list(itertools.product((x0, x1), (y0, y1)))

    def transform(self, affine) -> "BoundingBox":
        """Bounding box of the 4 corners pushed through a linear transform."""
        pts = [affine * pt for pt in self.points]
        xx = [x for x, _ in pts]
        yy = [y for _, y in pts]
        return BoundingBox(min(xx), min(yy), max(xx), max(yy))

    def overlaps(self, other: "BoundingBox") -> bool:
        """Closed-interval overlap (shared edges count as overlapping)."""
        return (
            self.left <= other.right
            and other.left <= self.right
            and self.bottom <= other.top
            and other.bottom <= self.top
        )

    def intersects_interior(self, other: "BoundingBox") -> bool:
        """Open-interval overlap: interiors intersect (shared edges do NOT
        count).  This is the rectangle special case of the reference's
        ``intersects(a, b) = a.intersects(b) and not a.touches(b)``
        (``datacube/utils/geometry/_base.py:1302-1305``)."""
        return (
            self.left < other.right
            and other.left < self.right
            and self.bottom < other.top
            and other.bottom < self.top
        )

    @staticmethod
    def from_xy(x: Tuple[float, float], y: Tuple[float, float]) -> "BoundingBox":
        x1, x2 = sorted(x)
        y1, y2 = sorted(y)
        return BoundingBox(x1, y1, x2, y2)

    @staticmethod
    def from_points(p1: Tuple[float, float], p2: Tuple[float, float]) -> "BoundingBox":
        return BoundingBox.from_xy((p1[0], p2[0]), (p1[1], p2[1]))


def bbox_union(bbs: Iterable[BoundingBox]) -> BoundingBox:
    """Enclosing bbox of a stream of bboxes (streaming min/max fold)."""
    left = bottom = float("+inf")
    right = top = float("-inf")
    for bb in bbs:
        l, b, r, t = bb
        left = min(l, left)
        bottom = min(b, bottom)
        right = max(r, right)
        top = max(t, top)
    return BoundingBox(left, bottom, right, top)


def bbox_intersection(bbs: Iterable[BoundingBox]) -> BoundingBox:
    """Overlap bbox of a stream of bboxes."""
    left = bottom = float("-inf")
    right = top = float("+inf")
    for bb in bbs:
        l, b, r, t = bb
        left = max(l, left)
        bottom = max(b, bottom)
        right = min(r, right)
        top = min(t, top)
    return BoundingBox(left, bottom, right, top)
