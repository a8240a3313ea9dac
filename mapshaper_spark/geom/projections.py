"""Closed-form map projections (the -proj surface).

The reference delegates to the mproj library (a JS port of PROJ.4):
definition index /root/reference/src/geom/mapshaper-projections.js:163-168
(aliases robinson/webmercator/wgs84/albersusa + every '+proj=' string),
applied per vertex by projectArcs (/root/reference/src/commands/
mapshaper-proj.js:135-150). No proj library ships in this environment, so
the engine implements the widely-used projections from the public formulas
in Snyder, "Map Projections — A Working Manual" (USGS PP 1395, public
domain): Mercator (spherical + ellipsoidal), Lambert Conformal Conic
(2SP), Albers Equal-Area (2SP), Transverse Mercator / UTM (series form),
and Robinson (table interpolation). All kernels are vectorized numpy —
they run inside Arrow-batched pandas UDFs; the spherical-Mercator fast
path additionally exists as pure Catalyst expressions in operators/proj.

Forward accuracy is validated against Snyder's published worked examples
(tests/test_projections.py); inverses round-trip to < 1e-9 degrees.
"""

from __future__ import annotations

import math

import numpy as np

# (a, e^2); values are the standard published ellipsoid constants
ELLIPSOIDS = {
    "WGS84": (6378137.0, 0.0066943799901413165),
    "GRS80": (6378137.0, 0.0066943800229007876),
    "clrk66": (6378206.4, 0.006768657997291094),
    "sphere": (6370997.0, 0.0),
}

HALFPI = math.pi / 2.0
D2R = math.pi / 180.0


def _msfn(sphi, cphi, es):
    return cphi / np.sqrt(1.0 - es * sphi * sphi)


def _tsfn(phi, sphi, e):
    con = e * sphi
    return (np.tan(0.5 * (HALFPI - phi)) /
            np.power((1.0 - con) / (1.0 + con), 0.5 * e))


def _phi2(ts, e, iters=15):
    """Inverse of _tsfn by fixed-point iteration (Snyder eq. 7-9)."""
    phi = HALFPI - 2.0 * np.arctan(ts)
    for _ in range(iters):
        con = e * np.sin(phi)
        phi_new = HALFPI - 2.0 * np.arctan(
            ts * np.power((1.0 - con) / (1.0 + con), 0.5 * e))
        if np.all(np.abs(phi_new - phi) < 1e-12):
            phi = phi_new
            break
        phi = phi_new
    return phi


def _mlfn(phi, a, es):
    """Meridional arc length from the equator (Snyder eq. 3-21)."""
    return a * (
        (1 - es / 4 - 3 * es ** 2 / 64 - 5 * es ** 3 / 256) * phi
        - (3 * es / 8 + 3 * es ** 2 / 32 + 45 * es ** 3 / 1024) * np.sin(2 * phi)
        + (15 * es ** 2 / 256 + 45 * es ** 3 / 1024) * np.sin(4 * phi)
        - (35 * es ** 3 / 3072) * np.sin(6 * phi))


def _inv_mlfn(M, a, es):
    """Footpoint latitude for a meridional arc (Snyder eq. 7-19, 3-26)."""
    e1 = (1 - math.sqrt(1 - es)) / (1 + math.sqrt(1 - es))
    mu = M / (a * (1 - es / 4 - 3 * es ** 2 / 64 - 5 * es ** 3 / 256))
    return (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))


def _qsfn(sphi, e, es):
    if e < 1e-12:
        return 2.0 * sphi
    con = e * sphi
    return (1.0 - es) * (sphi / (1.0 - con * con) -
                         (0.5 / e) * np.log((1.0 - con) / (1.0 + con)))


class Projection:
    is_latlong = False
    has_inverse = True

    def fwd(self, lng, lat):  # degrees -> x, y
        raise NotImplementedError

    def inv(self, x, y):  # x, y -> degrees
        raise NotImplementedError


class LongLat(Projection):
    is_latlong = True

    def fwd(self, lng, lat):
        return np.asarray(lng, dtype=np.float64), np.asarray(lat, dtype=np.float64)

    def inv(self, x, y):
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)


class Mercator(Projection):
    def __init__(self, a=6378137.0, es=0.0, lon0=0.0, x0=0.0, y0=0.0, k0=1.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0, self.k0 = lon0, x0, y0, k0

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        x = self.a * self.k0 * lam + self.x0
        if self.es == 0.0:
            y = self.a * self.k0 * np.log(np.tan(0.25 * math.pi + 0.5 * phi))
        else:
            y = -self.a * self.k0 * np.log(
                _tsfn(phi, np.sin(phi), self.e))
        return x, y + self.y0

    def inv(self, x, y):
        lam = (np.asarray(x, dtype=np.float64) - self.x0) / (self.a * self.k0)
        ts = np.exp(-(np.asarray(y, dtype=np.float64) - self.y0) /
                    (self.a * self.k0))
        if self.es == 0.0:
            phi = HALFPI - 2.0 * np.arctan(ts)
        else:
            phi = _phi2(ts, self.e)
        return lam / D2R + self.lon0, phi / D2R


class LambertConformalConic(Projection):
    """LCC 2SP, Snyder eq. 15-1..15-11 (pp. 104-110)."""

    def __init__(self, a, es, lat1, lat2, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        p1, p2, p0 = lat1 * D2R, lat2 * D2R, lat0 * D2R
        m1 = float(_msfn(math.sin(p1), math.cos(p1), es))
        t1 = float(_tsfn(np.float64(p1), np.float64(math.sin(p1)), self.e))
        if abs(lat1 - lat2) < 1e-10:
            self.n = math.sin(p1)
        else:
            m2 = float(_msfn(math.sin(p2), math.cos(p2), es))
            t2 = float(_tsfn(np.float64(p2), np.float64(math.sin(p2)), self.e))
            self.n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        self.F = m1 / (self.n * t1 ** self.n)
        t0 = float(_tsfn(np.float64(p0), np.float64(math.sin(p0)), self.e))
        self.rho0 = self.a * self.F * t0 ** self.n

    def fwd(self, lng, lat):
        phi = np.asarray(lat, dtype=np.float64) * D2R
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        t = _tsfn(phi, np.sin(phi), self.e)
        rho = self.a * self.F * np.power(t, self.n)
        theta = self.n * lam
        return (self.x0 + rho * np.sin(theta),
                self.y0 + self.rho0 - rho * np.cos(theta))

    def inv(self, x, y):
        xp = np.asarray(x, dtype=np.float64) - self.x0
        yp = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.sign(self.n) * np.hypot(xp, yp)
        theta = np.arctan2(np.sign(self.n) * xp, np.sign(self.n) * yp)
        t = np.power(rho / (self.a * self.F), 1.0 / self.n)
        phi = _phi2(t, self.e)
        return (theta / self.n) / D2R + self.lon0, phi / D2R


class AlbersEqualArea(Projection):
    """AEA 2SP, Snyder eq. 14-1..14-21 (pp. 98-103)."""

    def __init__(self, a, es, lat1, lat2, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        p1, p2, p0 = lat1 * D2R, lat2 * D2R, lat0 * D2R
        m1 = float(_msfn(math.sin(p1), math.cos(p1), es))
        q1 = float(_qsfn(np.float64(math.sin(p1)), self.e, es))
        if abs(lat1 - lat2) < 1e-10:
            self.n = math.sin(p1)
        else:
            m2 = float(_msfn(math.sin(p2), math.cos(p2), es))
            q2 = float(_qsfn(np.float64(math.sin(p2)), self.e, es))
            self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        q0 = float(_qsfn(np.float64(math.sin(p0)), self.e, es))
        self.rho0 = self.a * math.sqrt(self.C - self.n * q0) / self.n

    def fwd(self, lng, lat):
        phi = np.asarray(lat, dtype=np.float64) * D2R
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        q = _qsfn(np.sin(phi), self.e, self.es)
        rho = self.a * np.sqrt(self.C - self.n * q) / self.n
        theta = self.n * lam
        return (self.x0 + rho * np.sin(theta),
                self.y0 + self.rho0 - rho * np.cos(theta))

    def inv(self, x, y):
        xp = np.asarray(x, dtype=np.float64) - self.x0
        yp = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.hypot(xp, yp)
        theta = np.arctan2(xp, yp)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        if self.es == 0.0:
            phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        else:
            phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
            for _ in range(15):
                sphi = np.sin(phi)
                con = self.e * sphi
                phi = phi + ((1.0 - con * con) ** 2 / (2.0 * np.cos(phi))) * (
                    q / (1.0 - self.es) - sphi / (1.0 - con * con) +
                    (0.5 / self.e) * np.log((1.0 - con) / (1.0 + con)))
        return (theta / self.n) / D2R + self.lon0, phi / D2R


class TransverseMercator(Projection):
    """Ellipsoidal TM series, Snyder eq. 8-9..8-17 (pp. 60-64)."""

    def __init__(self, a, es, lat0=0.0, lon0=0.0, k0=0.9996,
                 x0=500000.0, y0=0.0):
        self.a, self.es = a, es
        self.ep2 = es / (1.0 - es)
        self.lat0, self.lon0, self.k0 = lat0, lon0, k0
        self.x0, self.y0 = x0, y0
        self.M0 = self._mfn(lat0 * D2R)

    def _mfn(self, phi):
        es = self.es
        return self.a * (
            (1 - es / 4 - 3 * es ** 2 / 64 - 5 * es ** 3 / 256) * phi
            - (3 * es / 8 + 3 * es ** 2 / 32 + 45 * es ** 3 / 1024) * np.sin(2 * phi)
            + (15 * es ** 2 / 256 + 45 * es ** 3 / 1024) * np.sin(4 * phi)
            - (35 * es ** 3 / 3072) * np.sin(6 * phi))

    def fwd(self, lng, lat):
        phi = np.asarray(lat, dtype=np.float64) * D2R
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        sphi, cphi, tphi = np.sin(phi), np.cos(phi), np.tan(phi)
        N = self.a / np.sqrt(1.0 - self.es * sphi * sphi)
        T = tphi * tphi
        C = self.ep2 * cphi * cphi
        A = cphi * lam
        M = self._mfn(phi)
        x = self.k0 * N * (A + (1 - T + C) * A ** 3 / 6 +
                           (5 - 18 * T + T * T + 72 * C - 58 * self.ep2) *
                           A ** 5 / 120)
        y = self.k0 * (M - self.M0 + N * tphi * (
            A * A / 2 + (5 - T + 9 * C + 4 * C * C) * A ** 4 / 24 +
            (61 - 58 * T + T * T + 600 * C - 330 * self.ep2) * A ** 6 / 720))
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        es = self.es
        e1 = (1 - math.sqrt(1 - es)) / (1 + math.sqrt(1 - es))
        M = self.M0 + (np.asarray(y, dtype=np.float64) - self.y0) / self.k0
        mu = M / (self.a * (1 - es / 4 - 3 * es ** 2 / 64 - 5 * es ** 3 / 256))
        phi1 = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
                + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
                + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
                + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))
        sphi, cphi, tphi = np.sin(phi1), np.cos(phi1), np.tan(phi1)
        C1 = self.ep2 * cphi * cphi
        T1 = tphi * tphi
        N1 = self.a / np.sqrt(1 - es * sphi * sphi)
        R1 = self.a * (1 - es) / np.power(1 - es * sphi * sphi, 1.5)
        D = (np.asarray(x, dtype=np.float64) - self.x0) / (N1 * self.k0)
        phi = phi1 - (N1 * tphi / R1) * (
            D * D / 2 - (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1 - 9 * self.ep2) *
            D ** 4 / 24 +
            (61 + 90 * T1 + 298 * C1 + 45 * T1 * T1 - 252 * self.ep2 -
             3 * C1 * C1) * D ** 6 / 720)
        lam = (D - (1 + 2 * T1 + C1) * D ** 3 / 6 +
               (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + 8 * self.ep2 +
                24 * T1 * T1) * D ** 5 / 120) / cphi
        return lam / D2R + self.lon0, phi / D2R


# Robinson interpolation table (X multiplier, Y multiplier per 5 deg of
# latitude) — the classic published coefficients
_ROBINSON_LAT = np.arange(0, 95, 5, dtype=np.float64)
_ROBINSON_X = np.array([
    1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600, 0.9427,
    0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597, 0.7186, 0.6732,
    0.6213, 0.5722, 0.5322])
_ROBINSON_Y = np.array([
    0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720, 0.4340,
    0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903, 0.8435, 0.8936,
    0.9394, 0.9761, 1.0000])


class Robinson(Projection):
    """Robinson pseudocylindrical via table interpolation (monotone cubic
    over the published 5-degree table; mproj uses a Stirling polynomial —
    results agree to ~1e-4 of the scale, documented deviation)."""

    def __init__(self, a=6378137.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0

    def _interp(self, table, alat):
        return self._cubic(table, alat)

    def _cubic(self, table, alat):
        i = np.clip((alat / 5.0).astype(np.int64), 0, len(table) - 2)
        t = alat / 5.0 - i
        y0 = table[np.maximum(i - 1, 0)]
        y1 = table[i]
        y2 = table[i + 1]
        y3 = table[np.minimum(i + 2, len(table) - 1)]
        # Catmull-Rom
        return 0.5 * ((2 * y1) + (-y0 + y2) * t +
                      (2 * y0 - 5 * y1 + 4 * y2 - y3) * t * t +
                      (-y0 + 3 * y1 - 3 * y2 + y3) * t ** 3)

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        latv = np.asarray(lat, dtype=np.float64)
        alat = np.abs(latv)
        X = self._interp(_ROBINSON_X, alat)
        Y = self._interp(_ROBINSON_Y, alat)
        x = 0.8487 * self.a * X * lam + self.x0
        y = 1.3523 * self.a * Y * np.sign(latv) + self.y0
        return x, y

    def inv(self, x, y):
        # Newton on the Y table, then X division
        yy = (np.asarray(y, dtype=np.float64) - self.y0) / (1.3523 * self.a)
        alat = np.clip(np.abs(yy), 0, 1) * 90.0
        for _ in range(25):
            f = self._interp(_ROBINSON_Y, np.minimum(alat, 90.0)) - np.abs(yy)
            df = (self._interp(_ROBINSON_Y, np.minimum(alat + 1e-4, 90.0)) -
                  self._interp(_ROBINSON_Y, np.maximum(alat - 1e-4, 0.0))) / 2e-4
            step = np.where(df != 0, f / np.where(df == 0, 1, df), 0.0)
            alat = np.clip(alat - step, 0.0, 90.0)
        lat = alat * np.sign(yy)
        X = self._interp(_ROBINSON_X, alat)
        lam = (np.asarray(x, dtype=np.float64) - self.x0) / (0.8487 * self.a * X)
        return lam / D2R + self.lon0, lat


def _parse_params(defn: str) -> dict:
    out = {}
    for tok in defn.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            out[k] = v
        else:
            out[tok] = True
    return out


class Equirectangular(Projection):
    """eqc / Plate Carrée (Snyder eq. 12-1..12-6, p. 90): x scaled by
    cos(lat_ts) at the standard parallel; spherical (proj treats eqc as
    spherical-only)."""

    def __init__(self, a=6378137.0, lat_ts=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0
        self.coslat = math.cos(lat_ts * D2R)

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        return (self.a * lam * self.coslat + self.x0,
                self.a * phi + self.y0)

    def inv(self, x, y):
        lam = (np.asarray(x, dtype=np.float64) - self.x0) / (self.a * self.coslat)
        phi = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        return lam / D2R + self.lon0, phi / D2R


class LambertAzimuthalEqualArea(Projection):
    """laea, ellipsoidal oblique (Snyder eq. 24-2..24-14 via authalic
    latitude, pp. 187-190). Verified by the equal-area property (local
    area scale == 1 everywhere) + inverse round-trip (tests)."""

    def __init__(self, a, es, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        self.qp = float(_qsfn(np.float64(1.0), self.e, es))
        q0 = float(_qsfn(np.float64(math.sin(lat0 * D2R)), self.e, es))
        self.beta0 = math.asin(min(1.0, max(-1.0, q0 / self.qp)))
        self.rq = a * math.sqrt(self.qp / 2.0)
        m0 = float(_msfn(math.sin(lat0 * D2R), math.cos(lat0 * D2R), es))
        cb0 = math.cos(self.beta0)
        self.d = (a * m0) / (self.rq * cb0) if cb0 > 1e-12 else 1.0

    def _beta(self, phi):
        q = _qsfn(np.sin(phi), self.e, self.es)
        return np.arcsin(np.clip(q / self.qp, -1.0, 1.0))

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        beta = self._beta(phi)
        sb0, cb0 = math.sin(self.beta0), math.cos(self.beta0)
        sb, cb = np.sin(beta), np.cos(beta)
        denom = 1.0 + sb0 * sb + cb0 * cb * np.cos(lam)
        b = self.rq * np.sqrt(2.0 / np.maximum(denom, 1e-300))
        x = b * self.d * cb * np.sin(lam)
        y = (b / self.d) * (cb0 * sb - sb0 * cb * np.cos(lam))
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        xp = (np.asarray(x, dtype=np.float64) - self.x0) / self.d
        yp = (np.asarray(y, dtype=np.float64) - self.y0) * self.d
        rho = np.hypot(xp, yp)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.rq), -1.0, 1.0))
        sce, cce = np.sin(ce), np.cos(ce)
        sb0, cb0 = math.sin(self.beta0), math.cos(self.beta0)
        with np.errstate(divide="ignore", invalid="ignore"):
            beta = np.arcsin(np.clip(
                cce * sb0 + (yp * sce * cb0 / np.where(rho == 0, 1.0, rho)),
                -1.0, 1.0))
            lam = np.arctan2(xp * sce,
                             rho * cb0 * cce - yp * sb0 * sce)
        beta = np.where(rho == 0, self.beta0, beta)
        lam = np.where(rho == 0, 0.0, lam)
        # authalic -> geodetic latitude by fixed point on q
        q = self.qp * np.sin(beta)
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(15):
            sphi = np.sin(phi)
            con = self.e * sphi
            phi = phi + (q - _qsfn(sphi, self.e, self.es)) * \
                ((1.0 - con * con) ** 2 /
                 (2.0 * np.cos(phi) * (1.0 - self.es)))
        return lam / D2R + self.lon0, phi / D2R


class Stereographic(Projection):
    """stere. POLAR aspects use the ellipsoidal form (Snyder eq. 21-33..
    21-34, 15-9); non-polar centers use the SPHERICAL oblique form
    (eq. 21-2..21-4) — the proj-style double-stereographic oblique
    ellipsoid is out of scope (documented). Verified by conformality
    (local scale isotropy) + round-trip (tests)."""

    def __init__(self, a, es, lat0=90.0, lon0=0.0, k0=1.0, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lat0, self.lon0, self.k0 = lat0, lon0, k0
        self.x0, self.y0 = x0, y0
        self.north = lat0 > 89.999
        self.south = lat0 < -89.999
        self.polar = self.north or self.south
        if self.polar and es > 0:
            e = self.e
            self.tfac = math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        if self.polar:
            if self.south:
                phi, lam = -phi, -lam
            if self.es > 0:
                t = _tsfn(phi, np.sin(phi), self.e)
                rho = 2.0 * self.a * self.k0 * t / self.tfac
            else:
                rho = 2.0 * self.a * self.k0 * np.tan(0.25 * math.pi - 0.5 * phi)
            x = rho * np.sin(lam)
            y = -rho * np.cos(lam)
            if self.south:
                x, y = -x, -y
            return x + self.x0, y + self.y0
        p0 = self.lat0 * D2R
        s0, c0 = math.sin(p0), math.cos(p0)
        sp, cp = np.sin(phi), np.cos(phi)
        k = 2.0 * self.k0 / (1.0 + s0 * sp + c0 * cp * np.cos(lam))
        x = self.a * k * cp * np.sin(lam)
        y = self.a * k * (c0 * sp - s0 * cp * np.cos(lam))
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        xp = np.asarray(x, dtype=np.float64) - self.x0
        yp = np.asarray(y, dtype=np.float64) - self.y0
        if self.polar:
            if self.south:
                xp, yp = -xp, -yp
            rho = np.hypot(xp, yp)
            if self.es > 0:
                ts = rho * self.tfac / (2.0 * self.a * self.k0)
                phi = _phi2(ts, self.e)
            else:
                phi = 0.5 * math.pi - 2.0 * np.arctan(
                    rho / (2.0 * self.a * self.k0))
            lam = np.arctan2(xp, -yp)
            lam = np.where(rho == 0, 0.0, lam)
            if self.south:
                phi, lam = -phi, -lam
            return lam / D2R + self.lon0, phi / D2R
        p0 = self.lat0 * D2R
        s0, c0 = math.sin(p0), math.cos(p0)
        rho = np.hypot(xp, yp)
        c = 2.0 * np.arctan(rho / (2.0 * self.a * self.k0))
        sc, cc = np.sin(c), np.cos(c)
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = np.arcsin(np.clip(
                cc * s0 + (yp * sc * c0 / np.where(rho == 0, 1.0, rho)),
                -1.0, 1.0))
            lam = np.arctan2(xp * sc, rho * c0 * cc - yp * s0 * sc)
        phi = np.where(rho == 0, p0, phi)
        lam = np.where(rho == 0, 0.0, lam)
        return lam / D2R + self.lon0, phi / D2R


class Sinusoidal(Projection):
    """sinu, ellipsoidal (Snyder eq. 30-1..30-2 / inverse 30-6..30-8,
    pp. 243-248). Verified by the equal-area property + round-trip."""

    def __init__(self, a, es, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0 = lon0, x0, y0

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        sphi = np.sin(phi)
        x = self.a * lam * np.cos(phi) / np.sqrt(1.0 - self.es * sphi * sphi)
        return x + self.x0, _mlfn(phi, self.a, self.es) + self.y0

    def inv(self, x, y):
        phi = _inv_mlfn(np.asarray(y, dtype=np.float64) - self.y0,
                        self.a, self.es)
        sphi, cphi = np.sin(phi), np.cos(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = ((np.asarray(x, dtype=np.float64) - self.x0) *
                   np.sqrt(1.0 - self.es * sphi * sphi) / (self.a * cphi))
        lam = np.where(np.abs(cphi) < 1e-12, 0.0, lam)
        return lam / D2R + self.lon0, phi / D2R


class Mollweide(Projection):
    """moll, spherical (Snyder eq. 31-1..31-8, pp. 249-252): Newton solve
    of 2t + sin 2t = pi sin(phi). Verified by the equal-area property,
    the frame extents (2*sqrt(2)*R by sqrt(2)*R), and round-trip."""

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0

    def _theta(self, phi):
        target = math.pi * np.sin(phi)
        theta = phi.copy()
        for _ in range(25):
            denom = 2.0 + 2.0 * np.cos(2.0 * theta)
            delta = np.where(np.abs(denom) < 1e-14, 0.0,
                             -(2.0 * theta + np.sin(2.0 * theta) - target) /
                             np.maximum(denom, 1e-14))
            theta = theta + delta
            if np.all(np.abs(delta) < 1e-13):
                break
        return np.where(np.abs(phi) >= HALFPI - 1e-12,
                        np.sign(phi) * HALFPI, theta)

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        theta = self._theta(phi)
        x = (2.0 * math.sqrt(2.0) / math.pi) * self.a * lam * np.cos(theta)
        y = math.sqrt(2.0) * self.a * np.sin(theta)
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        theta = np.arcsin(np.clip(
            (np.asarray(y, dtype=np.float64) - self.y0) /
            (math.sqrt(2.0) * self.a), -1.0, 1.0))
        phi = np.arcsin(np.clip(
            (2.0 * theta + np.sin(2.0 * theta)) / math.pi, -1.0, 1.0))
        ctheta = np.cos(theta)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = (math.pi * (np.asarray(x, dtype=np.float64) - self.x0) /
                   (2.0 * math.sqrt(2.0) * self.a * ctheta))
        lam = np.where(np.abs(ctheta) < 1e-12, 0.0, lam)
        return lam / D2R + self.lon0, phi / D2R


class _SphericalAzimuthal(Projection):
    """Shared oblique-aspect machinery for the spherical azimuthal family
    (Snyder ch. 20/22/25: common direction equations, per-projection radial
    scale k'(c) and inverse radial angle c(rho))."""

    def __init__(self, a, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lat0, self.lon0 = a, lat0, lon0
        self.x0, self.y0 = x0, y0
        self.s0 = math.sin(lat0 * D2R)
        self.c0 = math.cos(lat0 * D2R)

    def _k(self, cosc):  # radial scale as a function of cos(angular dist)
        raise NotImplementedError

    def _c(self, rho):   # angular distance from projected radius
        raise NotImplementedError

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        sp, cp = np.sin(phi), np.cos(phi)
        cosc = np.clip(self.s0 * sp + self.c0 * cp * np.cos(lam), -1.0, 1.0)
        k = self._k(cosc)
        x = self.a * k * cp * np.sin(lam)
        y = self.a * k * (self.c0 * sp - self.s0 * cp * np.cos(lam))
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        xp = np.asarray(x, dtype=np.float64) - self.x0
        yp = np.asarray(y, dtype=np.float64) - self.y0
        rho = np.hypot(xp, yp)
        c = self._c(rho)
        sc, cc = np.sin(c), np.cos(c)
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = np.arcsin(np.clip(
                cc * self.s0 + yp * sc * self.c0 / np.where(rho == 0, 1.0, rho),
                -1.0, 1.0))
            lam = np.arctan2(xp * sc, rho * self.c0 * cc - yp * self.s0 * sc)
        phi = np.where(rho == 0, self.lat0 * D2R, phi)
        lam = np.where(rho == 0, 0.0, lam)
        return lam / D2R + self.lon0, phi / D2R


class AzimuthalEquidistant(_SphericalAzimuthal):
    """aeqd, spherical oblique (Snyder eq. 25-1..25-4, p. 195): k' = c/sin c,
    so projected distance from the center is EXACTLY R*c — the defining
    property the tests assert."""

    def _k(self, cosc):
        c = np.arccos(cosc)
        sinc = np.sin(c)
        return np.where(sinc < 1e-12, 1.0, c / np.where(sinc == 0, 1.0, sinc))

    def _c(self, rho):
        return rho / self.a


class Orthographic(_SphericalAzimuthal):
    """ortho, spherical (Snyder eq. 20-3..20-6, pp. 148-150): k' = 1. The
    far hemisphere projects onto the near disk (no horizon clip — matching
    proj's behavior of leaving clipping to the caller)."""

    def _k(self, cosc):
        return np.ones_like(cosc)

    def _c(self, rho):
        return np.arcsin(np.clip(rho / self.a, -1.0, 1.0))


class Gnomonic(_SphericalAzimuthal):
    """gnom, spherical (Snyder eq. 22-3..22-5, pp. 164-168): k' = 1/cos c.
    Great circles map to straight lines — the property the tests assert."""

    def _k(self, cosc):
        return 1.0 / np.maximum(cosc, 1e-12)

    def _c(self, rho):
        return np.arctan(rho / self.a)


class CylindricalEqualArea(Projection):
    """cea, ellipsoidal with standard parallel lat_ts (Snyder eq. 10-7,
    10-8, 10-11, pp. 81-83): x = a*k0*lam, y = a*q/(2*k0). Verified by the
    equal-area property + round-trip."""

    def __init__(self, a, es, lat_ts=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        phs = lat_ts * D2R
        self.k0 = float(_msfn(math.sin(phs), math.cos(phs), es)) if es > 0 \
            else math.cos(phs)
        self.qp = float(_qsfn(np.float64(1.0), self.e, es))

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        q = _qsfn(np.sin(phi), self.e, self.es)
        return (self.a * self.k0 * lam + self.x0,
                self.a * q / (2.0 * self.k0) + self.y0)

    def inv(self, x, y):
        lam = (np.asarray(x, dtype=np.float64) - self.x0) / (self.a * self.k0)
        q = 2.0 * (np.asarray(y, dtype=np.float64) - self.y0) * self.k0 / self.a
        if self.es == 0.0:
            phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        else:
            beta = np.arcsin(np.clip(q / self.qp, -1.0, 1.0))
            phi = beta
            for _ in range(15):
                sphi = np.sin(phi)
                con = self.e * sphi
                phi = phi + (self.qp * np.sin(beta) -
                             _qsfn(sphi, self.e, self.es)) * \
                    ((1.0 - con * con) ** 2 /
                     (2.0 * np.cos(phi) * (1.0 - self.es)))
        return lam / D2R + self.lon0, phi / D2R


class Miller(Projection):
    """mill, Miller cylindrical, spherical (Snyder eq. 18-1..18-4, p. 88):
    y = R * ln(tan(pi/4 + 0.4*phi)) / 0.8, exact closed-form inverse."""

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        y = self.a * np.log(np.tan(0.25 * math.pi + 0.4 * phi)) / 0.8
        return self.a * lam + self.x0, y + self.y0

    def inv(self, x, y):
        lam = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        phi = 2.5 * np.arctan(np.exp(
            0.8 * (np.asarray(y, dtype=np.float64) - self.y0) / self.a)) - \
            0.625 * math.pi
        return lam / D2R + self.lon0, phi / D2R


class EquidistantConic(Projection):
    """eqdc, ellipsoidal 2SP (Snyder eq. 16-1..16-6 / inverse 16-10..16-11,
    pp. 111-115). Along every meridian, projected distance equals the true
    meridional arc — the property the tests assert."""

    def __init__(self, a, es, lat1, lat2, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        p1, p2 = lat1 * D2R, lat2 * D2R
        m1 = float(_msfn(math.sin(p1), math.cos(p1), es))
        M1 = float(_mlfn(np.float64(p1), a, es))
        if abs(lat1 - lat2) < 1e-10:
            self.n = math.sin(p1)
        else:
            m2 = float(_msfn(math.sin(p2), math.cos(p2), es))
            M2 = float(_mlfn(np.float64(p2), a, es))
            self.n = a * (m1 - m2) / (M2 - M1)
        self.G = m1 / self.n + M1 / a
        self.rho0 = a * self.G - float(_mlfn(np.float64(lat0 * D2R), a, es))

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        rho = self.a * self.G - _mlfn(phi, self.a, self.es)
        theta = self.n * lam
        return (rho * np.sin(theta) + self.x0,
                self.rho0 - rho * np.cos(theta) + self.y0)

    def inv(self, x, y):
        xp = np.asarray(x, dtype=np.float64) - self.x0
        yp = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.hypot(xp, yp)
        if self.n < 0:
            rho = -rho
            theta = np.arctan2(-xp, -yp)
        else:
            theta = np.arctan2(xp, yp)
        M = self.a * self.G - rho
        phi = _inv_mlfn(M, self.a, self.es)
        return theta / (self.n * D2R) + self.lon0, phi / D2R


class AlbersUSA(Projection):
    """mapshaper 'albersusa' (AlbersNYT, /root/reference/src/geom/
    mapshaper-projections.js:132-140 + mapshaper-mixed-projection.js):
    WGS84 AEA base (lon_0=-96 lat_0=37.5 lat_1=29.5 lat_2=45.5) with two
    rectangular inset frames reprojected through LCC (lon_0=-96 lat_0=39
    lat_1=33 lat_2=45) and affine-placed: Alaska (center -152,63 ->
    -115,27; 6000x3000 km frame, scale 0.31, rotation 29.2deg) and Hawaii
    (center -157,20.9 -> -106.6,28.2; 3000x5000 km, scale 0.9, rotation
    40deg). Frame membership tests the BASE projection's raw
    (earth-radius-unit) coords; the first matching frame wins. The inverse
    is the plain base-AEA inverse — the reference's MixedProjection copies
    the base proj object and overrides only fwd, so its documented
    roundtrip behavior ignores the frames (projections-test.js:48 only
    roundtrips a CONUS point)."""

    def __init__(self):
        a, es = ELLIPSOIDS["WGS84"]
        self.a = a
        self.base = AlbersEqualArea(a, es, 29.5, 45.5, 37.5, -96.0)
        self.lcc = LambertConformalConic(a, es, 33.0, 45.0, 39.0, -96.0)
        self.frames = []
        for ctr1, ctr2, fw, fh, s, rot in (
                ((-152.0, 63.0), (-115.0, 27.0), 6e6, 3e6, 0.31, 29.2),
                ((-157.0, 20.9), (-106.6, 28.2), 3e6, 5e6, 0.9, 40.0)):
            bx, by = self.base.fwd(np.array([ctr1[0]]), np.array([ctr1[1]]))
            x1, y1 = float(bx[0]) / a, float(by[0]) / a
            # Matrix2D replay (mapshaper-matrix2d.js): rotate about (x1,y1),
            # scale (tx/ty NOT scaled), then translate so the transformed
            # frame center lands on the base-projected ctr2
            q = rot * D2R
            cosq, sinq = math.cos(q), math.sin(q)
            ma, mc, mb, md = cosq, -sinq, sinq, cosq
            tx = x1 - x1 * cosq + y1 * sinq
            ty = y1 - x1 * sinq - y1 * cosq
            ma, mc, mb, md = ma * s, mc * s, mb * s, md * s
            x1t = x1 * ma + y1 * mc + tx
            y1t = x1 * mb + y1 * md + ty
            bx2, by2 = self.base.fwd(np.array([ctr2[0]]), np.array([ctr2[1]]))
            tx += float(bx2[0]) / a - x1t
            ty += float(by2[0]) / a - y1t
            half_w, half_h = fw / (2.0 * a), fh / (2.0 * a)
            bbox = (x1 - half_w, y1 - half_h, x1 + half_w, y1 + half_h)
            self.frames.append((bbox, (ma, mb, mc, md, tx, ty)))

    def fwd(self, lng, lat):
        lng = np.atleast_1d(np.asarray(lng, dtype=np.float64))
        lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
        bx, by = self.base.fwd(lng, lat)
        x, y = bx / self.a, by / self.a
        ox, oy = x.copy(), y.copy()
        done = np.zeros(x.shape, dtype=bool)
        for bbox, (ma, mb, mc, md, tx, ty) in self.frames:
            m = (~done & (x >= bbox[0]) & (x <= bbox[2]) &
                 (y >= bbox[1]) & (y <= bbox[3]))
            if m.any():
                fx, fy = self.lcc.fwd(lng[m], lat[m])
                fx, fy = fx / self.a, fy / self.a
                ox[m] = fx * ma + fy * mc + tx
                oy[m] = fx * mb + fy * md + ty
                done |= m
        return ox * self.a, oy * self.a

    def inv(self, x, y):
        return self.base.inv(x, y)


ALIASES = {
    # mapshaper-projections.js:163-168
    "webmercator": "+proj=merc +a=6378137 +b=6378137",
    "wgs84": "+proj=longlat +datum=WGS84",
    "robinson": "+proj=robin +datum=WGS84",
    "EPSG:3857": "+proj=merc +a=6378137 +b=6378137",
    "EPSG:4326": "+proj=longlat +datum=WGS84",
}


def get_projection(defn: str) -> Projection:
    """'+proj=...' string or alias -> Projection instance (the engine's
    analog of internal.getCRS, mapshaper-proj.js:211-229)."""
    if defn == "albersusa":
        return AlbersUSA()
    if defn in ALIASES:
        defn = ALIASES[defn]
    elif not defn.startswith("+"):
        defn = "+proj=" + defn
    p = _parse_params(defn)
    name = p.get("proj")
    a, es = ELLIPSOIDS.get(p.get("datum", p.get("ellps", "WGS84")),
                           ELLIPSOIDS["WGS84"])
    if "a" in p:
        a = float(p["a"])
        es = 0.0 if p.get("b") == p.get("a") else es
        if "b" in p and p["b"] != p["a"]:
            b = float(p["b"])
            es = 1.0 - (b * b) / (a * a)
    lon0 = float(p.get("lon_0", 0.0))
    lat0 = float(p.get("lat_0", 0.0))
    x0 = float(p.get("x_0", 0.0))
    y0 = float(p.get("y_0", 0.0))
    k0 = float(p.get("k_0", p.get("k", 1.0)))
    if name in ("longlat", "latlong", "lonlat"):
        return LongLat()
    if name == "merc":
        return Mercator(a, es, lon0=lon0, x0=x0, y0=y0, k0=k0)
    if name == "lcc":
        lat1 = float(p.get("lat_1", 33.0))
        lat2 = float(p.get("lat_2", p.get("lat_1", 45.0)))
        return LambertConformalConic(a, es, lat1, lat2, lat0, lon0, x0, y0)
    if name == "aea":
        lat1 = float(p.get("lat_1", 29.5))
        lat2 = float(p.get("lat_2", 45.5))
        return AlbersEqualArea(a, es, lat1, lat2, lat0, lon0, x0, y0)
    if name == "tmerc":
        return TransverseMercator(a, es, lat0, lon0,
                                  k0 if ("k_0" in p or "k" in p) else 1.0,
                                  x0, y0)
    if name == "utm":
        zone = int(p["zone"])
        lon0 = zone * 6 - 183
        return TransverseMercator(a, es, 0.0, lon0, 0.9996, 500000.0,
                                  10000000.0 if "south" in p else 0.0)
    if name == "robin":
        return Robinson(a, lon0=lon0, x0=x0, y0=y0)
    if name in ("eqc", "platecarree"):
        lat_ts = float(p.get("lat_ts", 0.0))
        return Equirectangular(a, lat_ts=lat_ts, lon0=lon0, x0=x0, y0=y0)
    if name == "laea":
        return LambertAzimuthalEqualArea(a, es, lat0=lat0, lon0=lon0,
                                         x0=x0, y0=y0)
    if name == "stere":
        lat0s = float(p.get("lat_0", 90.0))
        k0s = k0
        if "lat_ts" in p and abs(lat0s) > 89.999:
            # polar standard-parallel spelling: derive k0 from lat_ts
            pts = float(p["lat_ts"]) * D2R
            if es > 0:
                e = math.sqrt(es)
                m = math.cos(pts) / math.sqrt(1 - es * math.sin(pts) ** 2)
                t = float(_tsfn(np.float64(abs(pts)),
                                np.float64(math.sin(abs(pts))), e))
                tfac = math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
                k0s = m * tfac / (2.0 * t)
            else:
                k0s = (1.0 + math.sin(abs(pts))) / 2.0
        return Stereographic(a, es, lat0=lat0s, lon0=lon0, k0=k0s,
                             x0=x0, y0=y0)
    if name == "sinu":
        return Sinusoidal(a, es, lon0=lon0, x0=x0, y0=y0)
    if name == "moll":
        return Mollweide(a, lon0=lon0, x0=x0, y0=y0)
    if name == "aeqd":
        return AzimuthalEquidistant(a, lat0=lat0, lon0=lon0, x0=x0, y0=y0)
    if name == "ortho":
        return Orthographic(a, lat0=lat0, lon0=lon0, x0=x0, y0=y0)
    if name == "gnom":
        return Gnomonic(a, lat0=lat0, lon0=lon0, x0=x0, y0=y0)
    if name == "cea":
        return CylindricalEqualArea(a, es, lat_ts=float(p.get("lat_ts", 0.0)),
                                    lon0=lon0, x0=x0, y0=y0)
    if name == "mill":
        return Miller(a, lon0=lon0, x0=x0, y0=y0)
    if name == "eqdc":
        lat1 = float(p.get("lat_1", 0.0))
        lat2 = float(p.get("lat_2", p.get("lat_1", 0.0)))
        return EquidistantConic(a, es, lat1, lat2, lat0, lon0, x0, y0)
    raise ValueError(f"unknown projection definition: {defn}")


def get_transform(src: str | Projection, dest: str | Projection):
    """(lng/lat or x/y arrays) -> arrays transform through src.inv -> dest.fwd
    (internal.getProjTransform, mapshaper-proj.js:111-126, incl. the
    latlong clamp of source longitudes)."""
    sp = get_projection(src) if isinstance(src, str) else src
    dp = get_projection(dest) if isinstance(dest, str) else dest

    def tf(x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if not sp.is_latlong:
            x, y = sp.inv(x, y)
        x = np.clip(x, -180.0, 180.0)
        if dp.is_latlong:
            return x, y
        return dp.fwd(x, y)

    return tf
