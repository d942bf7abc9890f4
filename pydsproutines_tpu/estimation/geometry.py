"""Geometric surfaces: ellipsoids, spheroids, spheres, and TDOA hyperboloids.

Reference semantics: /root/reference/sphereRoutines.py (Ellipsoid :16,
intersectRay :107, normalAtPoint :158, north_and_east_vectors :193,
OblateSpheroid :229, WGS84Spheroid :245, Sphere :261 with
intersectOblateSpheroid) and /root/reference/hyperboloidRoutines.py
(Hyperboloid :17 — parametrization, transform :87, intersectXY :210,
fromFoci :417).

Host numpy: these are small-geometry helpers feeding plotting/localization.
"""

from __future__ import annotations

import numpy as np


class Ellipsoid:
    """x^2/a^2 + y^2/b^2 + z^2/c^2 = 1, optionally rotated (Rz@Rx) and
    translated by mu."""

    def __init__(self, a: float, b: float, c: float, mu=np.zeros(3),
                 rx=np.eye(3), rz=np.eye(3)):
        self.a, self.b, self.c = float(a), float(b), float(c)
        self.mu = np.asarray(mu, dtype=np.float64)
        self.Rx = np.asarray(rx, dtype=np.float64)
        self.Rz = np.asarray(rz, dtype=np.float64)

    def points_from_angles(self, theta, phi):
        return np.array([
            self.a * np.sin(theta) * np.cos(phi),
            self.b * np.sin(theta) * np.sin(phi),
            self.c * np.cos(theta),
        ])

    def transform(self, points):
        if points.ndim == 3:
            return points + self.mu.reshape(-1, 1, 1)
        return points + self.mu.reshape(-1, 1)

    def intersect_ray(self, s: np.ndarray, direction: np.ndarray):
        """Nearest non-negative ray intersection, or None (reference
        intersectRay, sphereRoutines.py:107)."""
        s = np.asarray(s, dtype=np.float64)
        direction = np.asarray(direction, dtype=np.float64)
        if s.ndim != 1 or direction.ndim != 1:
            raise ValueError("s and direction must be 1-D arrays")
        denomsq = np.array([self.a ** 2, self.b ** 2, self.c ** 2])
        sp = s - self.mu
        coeffs = np.array([
            np.sum(sp ** 2 / denomsq) - 1.0,
            np.sum(2 * sp * direction / denomsq),
            np.sum(direction ** 2 / denomsq),
        ])
        roots = np.polynomial.Polynomial(coeffs).roots()
        roots = roots[np.isreal(roots)].real
        roots = roots[roots >= 0]
        if roots.size == 0:
            return None
        return s + direction * np.min(roots)

    def normal_at_point(self, x: np.ndarray, normalised: bool = False):
        normal = np.array([2 / self.a ** 2, 2 / self.b ** 2,
                           2 / self.c ** 2]) * np.asarray(x)
        if normalised:
            normal = normal / np.linalg.norm(normal)
        return normal

    @staticmethod
    def north_and_east_vectors(normal: np.ndarray, normalised: bool = False):
        east = np.cross(np.array([0.0, 0.0, 1.0]), normal)
        east = east / np.linalg.norm(east)
        north = np.cross(normal, east)
        north = north / np.linalg.norm(north)
        return north, east


class OblateSpheroid(Ellipsoid):
    def __init__(self, omega: float, lmbda: float, mu=np.zeros(3),
                 rx=np.eye(3), rz=np.eye(3)):
        assert lmbda < omega
        self.omega, self.lmbda = float(omega), float(lmbda)
        super().__init__(omega, omega, lmbda, mu, rx, rz)


class WGS84Spheroid(OblateSpheroid):
    def __init__(self, mu=np.zeros(3), rx=np.eye(3), rz=np.eye(3)):
        super().__init__(6378137.0, 6356752.314245, mu, rx, rz)


class Sphere(Ellipsoid):
    def __init__(self, r: float, mu=np.zeros(3)):
        self.r = float(r)
        super().__init__(r, r, r, mu)

    def intersect_oblate_spheroid(self, theta, omega, lmbda):
        """Intersection curve of this (translated) sphere with a
        centre-origin oblate spheroid (reference Sphere.intersectOblateSpheroid,
        sphereRoutines.py:267)."""
        theta = np.asarray(theta, dtype=np.float64)
        rs = self.r * np.sin(theta)
        rc = self.r * np.cos(theta)
        gamma = lmbda ** 2 * (rs ** 2 + self.mu[0] ** 2 + self.mu[1] ** 2)
        beta = omega ** 2 * (rc ** 2 + 2 * rc * self.mu[2] + self.mu[2] ** 2)
        a = lmbda ** 2 * 2 * rs * self.mu[0]
        b = lmbda ** 2 * 2 * rs * self.mu[1]
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha = np.arctan2(b, a)
            t = (lmbda ** 2 * omega ** 2 - beta - gamma) / np.sqrt(a ** 2 + b ** 2)
            basic = np.arccos(t)
        idx = ~np.isnan(basic)
        basic, alpha, theta = basic[idx], alpha[idx], theta[idx]
        phi = np.hstack((basic[::-1] + alpha[::-1], -basic + alpha))
        thetae = np.hstack((theta[::-1], theta))
        points = self.points_from_angles(thetae, phi)
        return self.transform(points)


class Hyperboloid:
    """Two-sheet z-axis hyperboloid of revolution
    x^2/a^2 + y^2/a^2 - z^2/c^2 = -1 (reference Hyperboloid,
    hyperboloidRoutines.py:17). Convention: c has the sign of the range
    difference; foci at +/- sqrt(a^2+c^2) along the (rotated) z-axis."""

    def __init__(self, a: float, c: float, mu=np.zeros(3), rx=np.eye(3),
                 rz=np.eye(3)):
        self.a, self.c = float(a), float(c)
        self.rangediff = c / 2
        self.focus_z = np.sqrt(a ** 2 + c ** 2)
        self.mu = np.asarray(mu, dtype=np.float64)
        self.Rx = np.asarray(rx, dtype=np.float64)
        self.Rz = np.asarray(rz, dtype=np.float64)
        self.Rot = self.Rz @ self.Rx
        foci_local = np.array([[0, 0, -self.focus_z],
                               [0, 0, self.focus_z]]).T  # (3, 2)
        self.foci = self.Rot @ foci_local + self.mu.reshape(-1, 1)

    # parametrization ---------------------------------------------------------
    def x(self, v, theta):
        return self.a * np.sinh(v) * np.cos(theta)

    def y(self, v, theta):
        return self.a * np.sinh(v) * np.sin(theta)

    def z(self, v, sign):
        return sign * self.c * np.cosh(v)

    def transform(self, vecs: np.ndarray) -> np.ndarray:
        """Rotate+translate (3, N) local points to world frame."""
        return self.Rot @ vecs + self.mu.reshape(-1, 1)

    def inverse_transform(self, points: np.ndarray) -> np.ndarray:
        return np.linalg.inv(self.Rot) @ (points - self.mu.reshape(-1, 1))

    # intersections -----------------------------------------------------------
    def _intersect_xy_sheet(self, v, sign):
        """Solve for theta(v) where the world-frame z = 0 (reference
        _intersectXYsheet, hyperboloidRoutines.py:170)."""
        v = np.asarray(v, dtype=np.float64)
        sinhv, coshv = np.sinh(v), np.cosh(v)
        a0 = self.Rot[2, 0] * self.a * sinhv
        a1 = self.Rot[2, 1] * self.a * sinhv
        a2 = self.Rot[2, 2] * sign * self.c * coshv + self.mu[2]
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha = np.arctan(a0 / a1)
            b = -a2 / np.sqrt(a0 ** 2 + a1 ** 2)
            theta1 = np.arcsin(b)
            theta2 = np.sign(b) * np.pi - theta1
        theta = np.hstack((theta2[::-1], theta1)) - np.hstack((alpha[::-1], alpha))
        v_ext = np.hstack((v[::-1], v))
        x = self.x(v_ext, theta)
        y = self.y(v_ext, theta)
        z = self.z(v_ext, sign)
        ok = ~(np.isnan(x) | np.isnan(y) | np.isnan(z))
        vec = np.vstack((x[ok], y[ok], np.broadcast_to(z, x.shape)[ok]))
        return self.transform(vec)

    def intersect_xy(self, v=None, only_return_one_sheet: bool = False):
        """World-frame z=0 plane intersection curve(s)."""
        if v is None:
            v = np.arange(0, 2, 0.01)
        msheet = self._intersect_xy_sheet(v, -1)
        if only_return_one_sheet:
            return msheet
        return msheet, self._intersect_xy_sheet(v, 1)

    @classmethod
    def from_foci(cls, s1: np.ndarray, s2: np.ndarray, rangediff: float):
        """Hyperboloid sheet of constant range difference
        (|s2 - x| - |s1 - x| = rangediff) from two foci (reference fromFoci,
        hyperboloidRoutines.py:417)."""
        s1 = np.asarray(s1, dtype=np.float64)
        s2 = np.asarray(s2, dtype=np.float64)
        v = s2 - s1
        vnorm = np.linalg.norm(v)
        d = vnorm / 2
        theta = np.arccos(np.dot(v, np.array([0, 0, 1.0])) / vnorm)
        rx = np.array([[1, 0, 0],
                       [0, np.cos(theta), -np.sin(theta)],
                       [0, np.sin(theta), np.cos(theta)]])
        phi = np.arctan2(v[1], v[0]) + np.pi / 2
        rz = np.array([[np.cos(phi), -np.sin(phi), 0],
                       [np.sin(phi), np.cos(phi), 0],
                       [0, 0, 1]])
        c = 0.5 * rangediff
        a = np.sqrt(d ** 2 - c ** 2)
        mu = (s2 + s1) / 2
        return cls(a, c, mu, rx, rz)
