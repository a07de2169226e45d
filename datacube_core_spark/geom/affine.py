"""Minimal affine transform for grid math.

Implements the subset of the ``affine.Affine`` API that the reference
engine's grid code relies on (see reference ``datacube/model/__init__.py``
and ``datacube/utils/geometry/_base.py`` — the reference depends on the
third-party ``affine`` package; we need only 2D affine composition,
translation/scale constructors, inversion, and point application).

Row-major 2x3 matrix::

    | a  b  c |   | x |
    | d  e  f | * | y |
    | 0  0  1 |   | 1 |
"""

from __future__ import annotations

from typing import Iterator, Tuple


class Affine:
    __slots__ = ("a", "b", "c", "d", "e", "f")

    def __init__(self, a: float, b: float, c: float, d: float, e: float, f: float):
        self.a = float(a)
        self.b = float(b)
        self.c = float(c)
        self.d = float(d)
        self.e = float(e)
        self.f = float(f)

    @classmethod
    def identity(cls) -> "Affine":
        return cls(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)

    @classmethod
    def translation(cls, tx: float, ty: float) -> "Affine":
        return cls(1.0, 0.0, tx, 0.0, 1.0, ty)

    @classmethod
    def scale(cls, sx: float, sy: float = None) -> "Affine":
        if sy is None:
            sy = sx
        return cls(sx, 0.0, 0.0, 0.0, sy, 0.0)

    def __mul__(self, other):
        if isinstance(other, Affine):
            return Affine(
                self.a * other.a + self.b * other.d,
                self.a * other.b + self.b * other.e,
                self.a * other.c + self.b * other.f + self.c,
                self.d * other.a + self.e * other.d,
                self.d * other.b + self.e * other.e,
                self.d * other.c + self.e * other.f + self.f,
            )
        # point application: Affine * (x, y) -> (x', y')
        x, y = other
        return (self.a * x + self.b * y + self.c, self.d * x + self.e * y + self.f)

    def __invert__(self) -> "Affine":
        det = self.a * self.e - self.b * self.d
        if det == 0.0:
            raise ValueError("Cannot invert degenerate affine transform")
        ra, rb, rd, re = self.e / det, -self.b / det, -self.d / det, self.a / det
        return Affine(ra, rb, -(ra * self.c + rb * self.f), rd, re, -(rd * self.c + re * self.f))

    def __iter__(self) -> Iterator[float]:
        return iter((self.a, self.b, self.c, self.d, self.e, self.f))

    def __eq__(self, other) -> bool:
        return isinstance(other, Affine) and tuple(self) == tuple(other)

    def __hash__(self) -> int:
        return hash(tuple(self))

    def almost_equals(self, other: "Affine", tol: float = 1e-9) -> bool:
        return all(abs(u - v) <= tol for u, v in zip(self, other))

    def to_tuple(self) -> Tuple[float, float, float, float, float, float]:
        return (self.a, self.b, self.c, self.d, self.e, self.f)

    def __repr__(self) -> str:
        return f"Affine({self.a}, {self.b}, {self.c},\n       {self.d}, {self.e}, {self.f})"
