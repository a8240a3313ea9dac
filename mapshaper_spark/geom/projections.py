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
    "bessel": (6377397.155, 0.006674372230614254),
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


def _ssfn(phi, sphi, e):
    """Conformal-latitude kernel: chi = 2*atan(_ssfn(phi,sin phi,e)) - pi/2
    (Snyder eq. 3-1, the tan(pi/4 + chi/2) form)."""
    con = e * sphi
    return (np.tan(0.5 * (HALFPI + phi)) *
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
        if self.n < 0:
            # southern cone: rho is negative in the forward, so the polar
            # angle comes from the reflected point (Snyder p. 101 note:
            # "if n is negative, reverse the signs of x, y and rho0")
            rho = -rho
            theta = np.arctan2(-xp, -yp)
        else:
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


def _clenshaw_real(coefs, arg):
    """sum_j c_j * sin(2j*arg) via real Clenshaw summation (vectorized)."""
    x2 = 2.0 * np.cos(arg)
    h1 = np.zeros_like(np.asarray(arg, dtype=np.float64)) + coefs[-1]
    h2 = np.zeros_like(h1)
    for c in coefs[-2::-1]:
        h1, h2 = -h2 + x2 * h1 + c, h1
    return np.sin(arg) * h1


def _clenshaw_cplx(coefs, arg_r, arg_i):
    """sum_j c_j * sin(j*(arg_r + i*arg_i)) via complex Clenshaw;
    returns (real, imag) parts (vectorized)."""
    sr, cr = np.sin(arg_r), np.cos(arg_r)
    shi, chi = np.sinh(arg_i), np.cosh(arg_i)
    r = 2.0 * cr * chi
    im = -2.0 * sr * shi
    hr = np.zeros_like(r) + coefs[-1]
    hi = np.zeros_like(r)
    hr1 = np.zeros_like(r)
    hi1 = np.zeros_like(r)
    for c in coefs[-2::-1]:
        hr2, hi2 = hr1, hi1
        hr1, hi1 = hr, hi
        hr = -hr2 + r * hr1 - im * hi1 + c
        hi = -hi2 + im * hr1 + r * hi1
    sc = sr * chi
    cs = cr * shi
    return sc * hr - cs * hi, sc * hi + cs * hr


class ExtendedTransverseMercator(Projection):
    """etmerc/utm — the EXACT transverse Mercator via the Poder/Engsager
    6th-order Gauss-Krueger series (Engsager & Poder, ICC 2007; the
    Koenig & Weise coefficient tables; same algorithm as PROJ's etmerc,
    accurate to sub-mm out to ~60 deg from the central meridian, valid
    to +-150 deg). Pipeline: geodetic -> Gaussian (conformal) latitude
    -> complementary spherical TM -> complex trig series -> ellipsoidal
    normalized N/E. Verified against PROJ's published quickstart value
    (utm zone 32, 12E 55N) and near-CM agreement with the Snyder
    series (tests)."""

    _LON_LIMIT = 2.623395162778  # 150.3 deg in gudermannized easting

    def __init__(self, a, es, lat0=0.0, lon0=0.0, k0=1.0,
                 x0=0.0, y0=0.0):
        self.a, self.es = a, es
        self.lat0, self.lon0, self.k0 = lat0, lon0, k0
        self.x0, self.y0 = x0, y0
        f = es / (1.0 + math.sqrt(1.0 - es))   # flattening
        n = f / (2.0 - f)                       # third flattening
        # Gaussian <-> geodetic latitude series (KW (51)-(52), (61)-(62))
        self.cgb = [
            n * (2 + n * (-2 / 3 + n * (-2 + n * (116 / 45 + n * (
                26 / 45 + n * (-2854 / 675)))))),
            n**2 * (7 / 3 + n * (-8 / 5 + n * (-227 / 45 + n * (
                2704 / 315 + n * (2323 / 945))))),
            n**3 * (56 / 15 + n * (-136 / 35 + n * (-1262 / 105 + n *
                (73814 / 2835)))),
            n**4 * (4279 / 630 + n * (-332 / 35 + n * (-399572 / 14175))),
            n**5 * (4174 / 315 + n * (-144838 / 6237)),
            n**6 * (601676 / 22275),
        ]
        self.cbg = [
            n * (-2 + n * (2 / 3 + n * (4 / 3 + n * (-82 / 45 + n * (
                32 / 45 + n * (4642 / 4725)))))),
            n**2 * (5 / 3 + n * (-16 / 15 + n * (-13 / 9 + n * (
                904 / 315 + n * (-1522 / 945))))),
            n**3 * (-26 / 15 + n * (34 / 21 + n * (8 / 5 + n *
                (-12686 / 2835)))),
            n**4 * (1237 / 630 + n * (-12 / 5 + n * (-24832 / 14175))),
            n**5 * (-734 / 315 + n * (109598 / 31185)),
            n**6 * (444337 / 155925),
        ]
        # normalized meridian quadrant (KW p.50 (96))
        n2 = n * n
        self.Qn = k0 / (1 + n) * (1 + n2 * (1 / 4 + n2 * (
            1 / 64 + n2 / 256)))
        # spherical <-> ellipsoidal normalized N/E series (KW (65), (69))
        self.utg = [
            n * (-0.5 + n * (2 / 3 + n * (-37 / 96 + n * (1 / 360 + n * (
                81 / 512 + n * (-96199 / 604800)))))),
            n**2 * (-1 / 48 + n * (-1 / 15 + n * (437 / 1440 + n * (
                -46 / 105 + n * (1118711 / 3870720))))),
            n**3 * (-17 / 480 + n * (37 / 840 + n * (209 / 4480 + n *
                (-5569 / 90720)))),
            n**4 * (-4397 / 161280 + n * (11 / 504 + n *
                (830251 / 7257600))),
            n**5 * (-4583 / 161280 + n * (108847 / 3991680)),
            n**6 * (-20648693 / 638668800),
        ]
        self.gtu = [
            n * (0.5 + n * (-2 / 3 + n * (5 / 16 + n * (41 / 180 + n * (
                -127 / 288 + n * (7891 / 37800)))))),
            n**2 * (13 / 48 + n * (-3 / 5 + n * (557 / 1440 + n * (
                281 / 630 + n * (-1983433 / 1935360))))),
            n**3 * (61 / 240 + n * (-103 / 140 + n * (15061 / 26880 + n *
                (167603 / 181440)))),
            n**4 * (49561 / 161280 + n * (-179 / 168 + n *
                (6601661 / 7257600))),
            n**5 * (34729 / 80640 + n * (-3418889 / 1995840)),
            n**6 * (212378941 / 319334400),
        ]
        # origin-northing offset: true northing = N - Zb
        Z = float(self._gatg(self.cbg, np.float64(lat0 * D2R)))
        self.Zb = -self.Qn * (Z + float(_clenshaw_real(
            self.gtu, np.float64(2.0 * Z))))

    @staticmethod
    def _gatg(coefs, B):
        return B + _clenshaw_real(coefs, 2.0 * B)

    def fwd(self, lng, lat):
        phi = np.asarray(lat, dtype=np.float64) * D2R
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        Cn = self._gatg(self.cbg, phi)        # Gaussian latitude
        sCn, cCn = np.sin(Cn), np.cos(Cn)
        sCe, cCe = np.sin(lam), np.cos(lam)
        Cn = np.arctan2(sCn, cCe * cCn)       # compl. spherical lat
        Ce = np.arcsinh(np.tan(np.arctan2(
            sCe * cCn, np.hypot(sCn, cCn * cCe))))
        dn, de = _clenshaw_cplx(self.gtu, 2.0 * Cn, 2.0 * Ce)
        Cn = Cn + dn
        Ce = Ce + de
        bad = np.abs(Ce) > self._LON_LIMIT
        x = self.a * self.Qn * Ce
        y = self.a * (self.Qn * Cn + self.Zb)
        x = np.where(bad, np.inf, x)
        y = np.where(bad, np.inf, y)
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        Ce = (np.asarray(x, dtype=np.float64) - self.x0) / \
            (self.a * self.Qn)
        Cn = ((np.asarray(y, dtype=np.float64) - self.y0) / self.a -
              self.Zb) / self.Qn
        bad = np.abs(Ce) > self._LON_LIMIT
        dn, de = _clenshaw_cplx(self.utg, 2.0 * Cn, 2.0 * Ce)
        Cn = Cn + dn
        Ce = np.arctan(np.sinh(Ce + de))
        sCn, cCn = np.sin(Cn), np.cos(Cn)
        sCe, cCe = np.sin(Ce), np.cos(Ce)
        lam = np.arctan2(sCe, cCe * cCn)
        Cn = np.arctan2(sCn * cCe, np.hypot(sCe, cCe * cCn))
        phi = self._gatg(self.cgb, Cn)
        phi = np.where(bad, np.nan, phi)
        lam = np.where(bad, np.nan, lam)
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
    """stere — all four aspects, fully ellipsoidal (r5). POLAR: Snyder
    eq. 21-33..21-34 with 15-9. OBLIQUE/EQUATORIAL ellipsoidal: the
    conformal-latitude form, Snyder eq. 3-1, 14-15, 21-27..21-39
    (PP 1395 pp. 160-163) — the same construction as PROJ/mproj
    pj_stere (equatorial is the chi1=0 specialization, one code path).
    Spherical non-polar centers keep eq. 21-2..21-4. Verified by
    ellipsoid-metric conformality (h == k numerically), center scale
    == k0, and polar-limit agreement (tests)."""

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
        elif not self.polar and es > 0:
            p0 = lat0 * D2R
            s0 = math.sin(p0)
            # conformal latitude of the center (chi1) and 2*k0*m1
            chi1 = 2.0 * math.atan(float(_ssfn(p0, s0, self.e))) - HALFPI
            self.sinX1, self.cosX1 = math.sin(chi1), math.cos(chi1)
            self.akm1 = 2.0 * k0 * math.cos(p0) / \
                math.sqrt(1.0 - es * s0 * s0)

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
        if self.es > 0:
            # ellipsoidal oblique/equatorial: project the conformal
            # sphere (Snyder 21-27..21-29 with chi from 3-1)
            sp = np.sin(phi)
            chi = 2.0 * np.arctan(_ssfn(phi, sp, self.e)) - HALFPI
            sX, cX = np.sin(chi), np.cos(chi)
            clam = np.cos(lam)
            denom = self.cosX1 * (1.0 + self.sinX1 * sX +
                                  self.cosX1 * cX * clam)
            with np.errstate(divide="ignore", invalid="ignore"):
                A = self.a * self.akm1 / denom
            x = A * cX * np.sin(lam)
            y = A * (self.cosX1 * sX - self.sinX1 * cX * clam)
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
        if self.es > 0:
            # ellipsoidal oblique/equatorial inverse: Snyder 21-36..21-39
            # then iterate chi -> phi (eq. 3-4)
            rho = np.hypot(xp, yp)
            tp = 2.0 * np.arctan2(rho * self.cosX1, self.a * self.akm1)
            ct, st = np.cos(tp), np.sin(tp)
            safe = np.where(rho == 0.0, 1.0, rho)
            chi = np.arcsin(np.clip(
                ct * self.sinX1 + yp * st * self.cosX1 / safe, -1.0, 1.0))
            tchi = np.tan(0.5 * (HALFPI + chi))
            xn = xp * st
            yn = rho * self.cosX1 * ct - yp * self.sinX1 * st
            lam = np.where((xp == 0.0) & (yp == 0.0), 0.0,
                           np.arctan2(xn, yn))
            halfe = 0.5 * self.e
            phi = chi
            for _ in range(10):
                con = self.e * np.sin(phi)
                phi = 2.0 * np.arctan(
                    tchi * ((1.0 + con) / (1.0 - con)) ** halfe) - HALFPI
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


class Hammer(Projection):
    """hammer, spherical (Snyder pp. 160-163 / mproj pj_list tail): the
    classic equal-area world ellipse. Closed forward and inverse."""

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        d = np.sqrt(2.0 / (1.0 + np.cos(phi) * np.cos(lam / 2.0)))
        x = 2.0 * self.a * d * np.cos(phi) * np.sin(lam / 2.0)
        y = self.a * d * np.sin(phi)
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        xs = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        ys = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        z2 = 1.0 - (xs / 4.0) ** 2 - (ys / 2.0) ** 2
        z = np.sqrt(np.clip(z2, 0.0, None))
        lam = 2.0 * np.arctan2(z * xs, 2.0 * (2.0 * z * z - 1.0))
        phi = np.arcsin(np.clip(z * ys, -1.0, 1.0))
        return lam / D2R + self.lon0, phi / D2R


class WinkelTripel(Projection):
    """wintri, spherical (the arithmetic mean of equirectangular at lat_1
    and Aitoff; lat_1 defaults to acos(2/pi) like proj's pj_wink2 family).
    Forward closed; inverse by 2-variable Newton with numeric Jacobian."""

    def __init__(self, a, lat1=None, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0
        self.cosphi1 = (2.0 / math.pi if lat1 is None
                        else math.cos(lat1 * D2R))

    def _fwd_rad(self, lam, phi):
        alpha = np.arccos(np.clip(np.cos(phi) * np.cos(lam / 2.0), -1.0, 1.0))
        sinc = np.where(np.abs(alpha) < 1e-12, 1.0,
                        np.sin(alpha) / np.where(np.abs(alpha) < 1e-12, 1.0, alpha))
        x = 0.5 * (lam * self.cosphi1 + 2.0 * np.cos(phi) * np.sin(lam / 2.0) / sinc)
        y = 0.5 * (phi + np.sin(phi) / sinc)
        return x, y

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        x, y = self._fwd_rad(lam, phi)
        return self.a * x + self.x0, self.a * y + self.y0

    def inv(self, x, y):
        tx = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        ty = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        lam = np.clip(2.0 * tx / (1.0 + self.cosphi1), -math.pi, math.pi)
        phi = np.clip(ty, -HALFPI, HALFPI)
        h = 1e-7
        for _ in range(30):
            fx, fy = self._fwd_rad(lam, phi)
            rx, ry = fx - tx, fy - ty
            dxdl, dydl = self._fwd_rad(lam + h, phi)
            dxdp, dydp = self._fwd_rad(lam, phi + h)
            j11 = (dxdl - fx) / h
            j21 = (dydl - fy) / h
            j12 = (dxdp - fx) / h
            j22 = (dydp - fy) / h
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-15, 1e-15, det)
            dl = (rx * j22 - ry * j12) / det
            dp = (ry * j11 - rx * j21) / det
            lam = np.clip(lam - dl, -math.pi, math.pi)
            phi = np.clip(phi - dp, -HALFPI, HALFPI)
            if np.all(np.abs(dl) < 1e-13) and np.all(np.abs(dp) < 1e-13):
                break
        return lam / D2R + self.lon0, phi / D2R


class Aitoff(WinkelTripel):
    """aitoff, spherical (the azimuthal-equidistant-stretched hemisphere
    map Winkel Tripel averages with equirectangular): x = 2 cos(phi)
    sin(lam/2) / sinc(alpha), y = sin(phi) / sinc(alpha). Shares the
    2-variable Newton inverse with WinkelTripel via _fwd_rad."""

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lat1=None, lon0=lon0, x0=x0, y0=y0)
        self.cosphi1 = 1.0  # only used by the inverse's lam seed

    def _fwd_rad(self, lam, phi):
        alpha = np.arccos(np.clip(np.cos(phi) * np.cos(lam / 2.0), -1.0, 1.0))
        sinc = np.where(np.abs(alpha) < 1e-12, 1.0,
                        np.sin(alpha) / np.where(np.abs(alpha) < 1e-12, 1.0,
                                                 alpha))
        return (2.0 * np.cos(phi) * np.sin(lam / 2.0) / sinc,
                np.sin(phi) / sinc)


class NearSidedPerspective(_SphericalAzimuthal):
    """nsper, spherical general vertical perspective (Snyder eq.
    25-5..25-12, pp. 173-176): the view from a satellite at height h above
    the surface; k' = (P-1)/(P - cos c), visible cap cos c > 1/P. The h ->
    infinity limit is orthographic (tested)."""

    def __init__(self, a, h, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lat0=lat0, lon0=lon0, x0=x0, y0=y0)
        self.P = 1.0 + h / a

    def _k(self, cosc):
        return (self.P - 1.0) / (self.P - cosc)

    def _c(self, rho):
        # rho/R (P - cos c) = (P-1) sin c  ->  harmonic-addition closed form
        # (Snyder 25-12's arcsin form)
        r = np.asarray(rho, dtype=np.float64) / self.a
        t = np.arctan2(r, self.P - 1.0)
        amp = np.sqrt((self.P - 1.0) ** 2 + r * r)
        return np.arcsin(np.clip(r * self.P / amp, -1.0, 1.0)) - t


class EckertIV(Projection):
    """eck4, spherical (Snyder pp. 253-258): Newton solve of
    theta + sin(theta)cos(theta) + 2 sin(theta) = (2 + pi/2) sin(phi).
    Inverse closed."""

    _CX = 2.0 / math.sqrt(math.pi * (4.0 + math.pi))
    _CY = 2.0 * math.sqrt(math.pi / (4.0 + math.pi))

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        target = (2.0 + HALFPI) * np.sin(phi)
        theta = phi / 2.0
        for _ in range(25):
            st, ct = np.sin(theta), np.cos(theta)
            f = theta + st * ct + 2.0 * st - target
            fp = 1.0 + ct * ct - st * st + 2.0 * ct
            delta = -f / np.maximum(np.abs(fp), 1e-14) * np.sign(fp)
            theta = theta + delta
            if np.all(np.abs(delta) < 1e-13):
                break
        x = self._CX * self.a * lam * (1.0 + np.cos(theta))
        y = self._CY * self.a * np.sin(theta)
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        theta = np.arcsin(np.clip(
            (np.asarray(y, dtype=np.float64) - self.y0) / (self._CY * self.a),
            -1.0, 1.0))
        st, ct = np.sin(theta), np.cos(theta)
        phi = np.arcsin(np.clip((theta + st * ct + 2.0 * st) / (2.0 + HALFPI),
                                -1.0, 1.0))
        lam = (np.asarray(x, dtype=np.float64) - self.x0) / \
            (self._CX * self.a * (1.0 + ct))
        return lam / D2R + self.lon0, phi / D2R


class _PolyPseudoCylindrical(Projection):
    """Shared machinery for polynomial pseudocylindricals (Natural Earth,
    Equal Earth): y = poly(theta), x = lam * width(theta), inverse by
    Newton on theta."""

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0

    def _theta(self, phi):  # parametric latitude from geographic
        return phi

    def _phi(self, theta):
        return theta

    def _y_of_theta(self, t):
        raise NotImplementedError

    def _dy_dtheta(self, t):
        raise NotImplementedError

    def _xscale(self, t):
        raise NotImplementedError

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        t = self._theta(phi)
        return (self.a * lam * self._xscale(t) + self.x0,
                self.a * self._y_of_theta(t) + self.y0)

    def inv(self, x, y):
        ty = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        t = ty.copy()
        for _ in range(30):
            delta = -(self._y_of_theta(t) - ty) / self._dy_dtheta(t)
            t = t + delta
            if np.all(np.abs(delta) < 1e-13):
                break
        lam = (np.asarray(x, dtype=np.float64) - self.x0) / \
            (self.a * self._xscale(t))
        return lam / D2R + self.lon0, self._phi(t) / D2R


class NaturalEarth(_PolyPseudoCylindrical):
    """natearth (Savric, Jenny, Patterson & Hurni 2011 — published
    polynomial coefficients; same constants as proj's pj_natearth)."""

    def _y_of_theta(self, p):
        p2 = p * p
        return p * (1.007226 + p2 * (0.015085 + p2 * p2 * (
            -0.044475 + p2 * (0.028874 - 0.005916 * p2))))

    def _dy_dtheta(self, p):
        p2 = p * p
        return (1.007226 + p2 * (0.045255 + p2 * p2 * (
            -0.311325 + p2 * (0.259866 - 0.065076 * p2))))

    def _xscale(self, p):
        p2 = p * p
        return (0.870700 - p2 * (0.131979 + p2 * (0.013791 - p2 * p2 * p2 * (
            0.003971 - 0.001529 * p2))))


class EqualEarth(_PolyPseudoCylindrical):
    """eqearth (Savric, Patterson & Jenny 2018 — published equal-area
    pseudocylindrical; constants as in the paper / proj's pj_eqearth)."""

    _M = math.sqrt(3.0) / 2.0
    _A1, _A2, _A3, _A4 = 1.340264, -0.081106, 0.000893, 0.003796

    def _theta(self, phi):
        return np.arcsin(np.clip(self._M * np.sin(phi), -1.0, 1.0))

    def _phi(self, theta):
        return np.arcsin(np.clip(np.sin(theta) / self._M, -1.0, 1.0))

    def _y_of_theta(self, t):
        t2 = t * t
        return t * (self._A1 + self._A2 * t2 +
                    t2 * t2 * t2 * (self._A3 + self._A4 * t2))

    def _dy_dtheta(self, t):
        t2 = t * t
        return (self._A1 + 3.0 * self._A2 * t2 +
                t2 * t2 * t2 * (7.0 * self._A3 + 9.0 * self._A4 * t2))

    def _xscale(self, t):
        return np.cos(t) / (self._M * self._dy_dtheta(t))


class VanDerGrinten(Projection):
    """vandg, Van der Grinten I (Snyder pp. 239-242): circle-bounded world.
    Forward per eq. 33-1..33-11; inverse via the closed cubic 33-12..33-18."""

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        theta = np.arcsin(np.clip(np.abs(2.0 * phi / math.pi), 0.0, 1.0))
        st, ct = np.sin(theta), np.cos(theta)
        absl = np.abs(lam)
        safe_l = np.where(absl < 1e-12, 1e-12, absl)
        A = 0.5 * np.abs(math.pi / safe_l - safe_l / math.pi)
        denom_g = st + ct - 1.0
        G = ct / np.where(np.abs(denom_g) < 1e-12, 1e-12, denom_g)
        P = G * (2.0 / np.where(st < 1e-12, 1e-12, st) - 1.0)
        Q = A * A + G
        P2A2 = P * P + A * A
        under_x = A * A * (G - P * P) ** 2 - P2A2 * (G * G - P * P)
        x = (math.pi * (A * (G - P * P) +
                        np.sqrt(np.clip(under_x, 0.0, None))) / P2A2)
        under_y = (A * A + 1.0) * P2A2 - Q * Q
        y = math.pi * np.abs(P * Q - A * np.sqrt(np.clip(under_y, 0.0, None))) / P2A2
        x = np.where(absl < 1e-12, 0.0, x) * np.sign(lam)
        y = y * np.sign(phi)
        # phi == 0: equator maps to x = R*lam; |phi| == pi/2: poles
        x = np.where(np.abs(phi) < 1e-12, lam, x)
        y = np.where(np.abs(phi) < 1e-12, 0.0, y)
        polar = np.abs(np.abs(phi) - HALFPI) < 1e-12
        x = np.where(polar, 0.0, x)
        y = np.where(polar, math.pi * np.tan(theta / 2.0) * np.sign(phi), y)
        return self.a * x + self.x0, self.a * y + self.y0

    def inv(self, x, y):
        X = (np.asarray(x, dtype=np.float64) - self.x0) / (math.pi * self.a)
        Y = (np.asarray(y, dtype=np.float64) - self.y0) / (math.pi * self.a)
        absY = np.abs(Y)
        r2 = X * X + Y * Y
        c1 = -absY * (1.0 + r2)
        c2 = c1 - 2.0 * Y * Y + X * X
        c3 = -2.0 * c1 + 1.0 + 2.0 * Y * Y + r2 * r2
        d = Y * Y / c3 + (2.0 * c2 ** 3 / c3 ** 3 -
                          9.0 * c1 * c2 / (c3 * c3)) / 27.0
        a1 = (c1 - c2 * c2 / (3.0 * c3)) / c3
        m1 = 2.0 * np.sqrt(np.clip(-a1 / 3.0, 1e-30, None))
        inner = np.clip(3.0 * d / (a1 * m1), -1.0, 1.0)
        theta1 = np.arccos(inner) / 3.0
        phi = math.pi * (-m1 * np.cos(theta1 + math.pi / 3.0) -
                         c2 / (3.0 * c3)) * np.sign(Y)
        phi = np.where(absY < 1e-14, 0.0, phi)
        safe_x = np.where(np.abs(X) < 1e-12, 1e-12, X)
        lam = math.pi * (r2 - 1.0 + np.sqrt(
            1.0 + 2.0 * (X * X - Y * Y) + r2 * r2)) / (2.0 * safe_x)
        lam = np.where(np.abs(X) < 1e-12, 0.0, lam)
        return lam / D2R + self.lon0, phi / D2R


class GallStereographic(Projection):
    """gall, spherical cylindrical (Snyder p. 104): x = R lam / sqrt(2),
    y = R (1 + sqrt(2)/2) tan(phi/2). Closed both ways."""

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        return (self.a * lam / math.sqrt(2.0) + self.x0,
                self.a * (1.0 + math.sqrt(2.0) / 2.0) * np.tan(phi / 2.0) + self.y0)

    def inv(self, x, y):
        lam = (np.asarray(x, dtype=np.float64) - self.x0) * math.sqrt(2.0) / self.a
        phi = 2.0 * np.arctan((np.asarray(y, dtype=np.float64) - self.y0) /
                              (self.a * (1.0 + math.sqrt(2.0) / 2.0)))
        return lam / D2R + self.lon0, phi / D2R


class Cassini(Projection):
    """cass, spherical (Snyder pp. 92-95): transverse equidistant
    cylindrical. Closed both ways."""

    def __init__(self, a, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lat0, self.lon0 = a, lat0, lon0
        self.x0, self.y0 = x0, y0

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        x = self.a * np.arcsin(np.clip(np.cos(phi) * np.sin(lam), -1.0, 1.0))
        y = self.a * (np.arctan2(np.tan(phi), np.cos(lam)) - self.lat0 * D2R)
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        dd = (np.asarray(y, dtype=np.float64) - self.y0) / self.a + \
            self.lat0 * D2R
        phi = np.arcsin(np.clip(np.sin(dd) * np.cos(xr), -1.0, 1.0))
        lam = np.arctan2(np.tan(xr), np.cos(dd))
        return lam / D2R + self.lon0, phi / D2R


class Bonne(Projection):
    """bonne, spherical (Snyder eq. 19-1..19-5, pp. 138-140): equal-area
    pseudoconic. lat_1 is the standard parallel (required; the cone
    degenerates at 0)."""

    def __init__(self, a, lat1, lon0=0.0, x0=0.0, y0=0.0):
        if abs(lat1) < 1e-10:
            raise ValueError("+proj=bonne needs a nonzero +lat_1")
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0
        self.phi1 = lat1 * D2R
        self.cotphi1 = 1.0 / math.tan(self.phi1)

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        rho = self.cotphi1 + self.phi1 - phi
        with np.errstate(divide="ignore", invalid="ignore"):
            e_ = np.where(np.abs(rho) < 1e-12, 0.0,
                          lam * np.cos(phi) / rho)
        x = self.a * rho * np.sin(e_)
        y = self.a * (self.cotphi1 - rho * np.cos(e_))
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        yr = self.cotphi1 - (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        rho = np.sign(self.phi1) * np.sqrt(xr * xr + yr * yr)
        phi = self.cotphi1 + self.phi1 - rho
        cphi = np.cos(phi)
        ang = np.arctan2(np.sign(self.phi1) * xr, np.sign(self.phi1) * yr)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(np.abs(cphi) < 1e-12, 0.0, rho * ang / cphi)
        return lam / D2R + self.lon0, phi / D2R


class Polyconic(Projection):
    """poly, American polyconic, ellipsoidal (Snyder eq. 18-12..18-15 /
    iterative inverse 18-18, pp. 124-131)."""

    def __init__(self, a, es, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        self.ml0 = float(_mlfn(np.float64(lat0 * D2R), a, es)) / a

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        sp, cp = np.sin(phi), np.cos(phi)
        flat = np.abs(phi) < 1e-10
        ee = lam * sp
        with np.errstate(divide="ignore", invalid="ignore"):
            cot = cp / sp
            n_ = 1.0 / np.sqrt(1.0 - self.es * sp * sp)  # N/a
            x = np.where(flat, lam, n_ * cot * np.sin(ee))
            y = np.where(flat, -self.ml0,
                         _mlfn(phi, 1.0, self.es) - self.ml0 +
                         n_ * cot * (1.0 - np.cos(ee)))
        return self.a * x + self.x0, self.a * y + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        yr = (np.asarray(y, dtype=np.float64) - self.y0) / self.a + self.ml0
        flat = np.abs(yr) <= 1e-10
        r = yr * yr + xr * xr
        phi = yr.copy()
        one_es = 1.0 - self.es
        for _ in range(25):
            sp = np.sin(phi)
            cp = np.cos(phi)
            s2ph = sp * cp
            mlp = np.sqrt(1.0 - self.es * sp * sp)
            with np.errstate(divide="ignore", invalid="ignore"):
                c = sp * mlp / cp
                ml = _mlfn(phi, 1.0, self.es)
                mlb = ml * ml + r
                mlp3 = one_es / (mlp * mlp * mlp)
                dphi = ((ml + ml + c * mlb - 2.0 * yr * (c * ml + 1.0)) /
                        (self.es * s2ph * (mlb - 2.0 * yr * ml) / c +
                         2.0 * (yr - ml) * (c * mlp3 - 1.0 / s2ph) -
                         mlp3 - mlp3))
            dphi = np.where(flat | ~np.isfinite(dphi), 0.0, dphi)
            # damp + clamp: near |lam sin phi| ~ pi/2 the Newton step is
            # steep and overshoots past a pole, never to return (the fwd
            # map is only injective for |lam sin phi| < pi/2 anyway);
            # bounded steps keep the iterate in the convergence basin
            dphi = np.clip(dphi, -0.3, 0.3)
            phi = np.clip(phi + dphi, -HALFPI + 1e-9, HALFPI - 1e-9)
            if np.all(np.abs(dphi) < 1e-12):
                break
        sp = np.sin(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = (np.arcsin(np.clip(
                xr * np.tan(phi) * np.sqrt(1.0 - self.es * sp * sp),
                -1.0, 1.0)) / np.where(np.abs(sp) < 1e-12, 1.0, sp))
        lam = np.where(flat, xr, lam)
        phi = np.where(flat, 0.0, phi)
        return lam / D2R + self.lon0, phi / D2R


class Goode(Projection):
    """goode, spherical (Goode 1925 homolosine, uninterrupted as in proj's
    +proj=goode): sinusoidal equatorward of ~40d44', Mollweide poleward
    with the y offset that makes the two pieces meet. Equal-area."""

    PHI_LIM = 0.7109889596207567  # latitude where sinu and moll areas match

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0
        self.sinu = Sinusoidal(a, 0.0, lon0=lon0)
        self.moll = Mollweide(a, lon0=lon0)
        # y correction: moll y at the seam minus sinu y (= a*phi) at it
        _, ym = self.moll.fwd(np.array([lon0]),
                              np.array([self.PHI_LIM / D2R]))
        self.y_cor = float(ym[0]) - a * self.PHI_LIM

    def fwd(self, lng, lat):
        lng = np.asarray(lng, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        hi = np.abs(lat) * D2R > self.PHI_LIM
        xs, ys = self.sinu.fwd(lng, lat)
        xm, ym = self.moll.fwd(lng, lat)
        x = np.where(hi, xm, xs)
        y = np.where(hi, ym - np.sign(lat) * self.y_cor, ys)
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = np.asarray(y, dtype=np.float64) - self.y0
        hi = np.abs(y) > self.a * self.PHI_LIM
        ls, ps = self.sinu.inv(x, y)
        lm, pm = self.moll.inv(x, y + np.sign(y) * self.y_cor)
        return np.where(hi, lm, ls), np.where(hi, pm, ps)


class InterruptedGoode(Projection):
    """igh (interrupted Goode homolosine, the classic 6-lobe land layout):
    two northern lobes split at lam = -40 (central meridians -100, 30)
    and four southern lobes split at -100 / -20 / 80 (central meridians
    -160, -60, 20, 140); each lobe is the uninterrupted Goode placed at
    x = R * cm + goode(lam - cm). Equal-area like its pieces; the lobe
    x-splits (-40 north, -100/-20/80 south, applied to x/R in radians)
    are unambiguous because every lobe's x-extent shrinks toward its
    central meridian poleward of the equator."""

    N_SPLIT = -40.0
    S_SPLIT = (-100.0, -20.0, 80.0)
    N_CM = (-100.0, 30.0)
    S_CM = (-160.0, -60.0, 20.0, 140.0)

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0
        cms = sorted(set(self.N_CM) | set(self.S_CM))
        self.goode = {cm: Goode(a, lon0=cm) for cm in cms}

    def _cm(self, lam_deg, south):
        cm_s = np.full_like(np.asarray(lam_deg, dtype=np.float64),
                            self.S_CM[0])
        for s, c in zip(self.S_SPLIT, self.S_CM[1:]):
            cm_s = np.where(lam_deg >= s, c, cm_s)
        cm_n = np.where(lam_deg < self.N_SPLIT, self.N_CM[0], self.N_CM[1])
        return np.where(south, cm_s, cm_n)

    def fwd(self, lng, lat):
        lam = np.asarray(lng, dtype=np.float64) - self.lon0
        lam = lam - 360.0 * np.round(lam / 360.0)
        lat = np.asarray(lat, dtype=np.float64)
        cm = self._cm(lam, lat < 0)
        x = np.empty_like(lam)
        y = np.empty_like(lam)
        for c, g in self.goode.items():
            m = cm == c
            if m.any():
                # g carries lon0 = c, so the absolute lobe longitude goes
                # in and the lobe-centred x comes out
                gx, gy = g.fwd(lam[m], lat[m])
                x[m] = gx + self.a * c * D2R
                y[m] = gy
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a / D2R
        yv = np.asarray(y, dtype=np.float64) - self.y0
        cm = self._cm(xr, yv < 0)
        lam = np.empty_like(xr)
        phi = np.empty_like(xr)
        for c, g in self.goode.items():
            m = cm == c
            if m.any():
                gl, gp = g.inv((xr[m] - c) * D2R * self.a, yv[m])
                lam[m] = gl
                phi[m] = gp
        return lam + self.lon0, phi


class Eckert(Projection):
    """eck1/eck2/eck3/eck5/eck6, spherical closed forms (Snyder Appendix A
    pp. 253-258 table; the same equations proj's PJ_eck*.c implement).
    eck4 has its own class (iterative, implemented round 4)."""

    def __init__(self, variant, a, lon0=0.0, x0=0.0, y0=0.0):
        self.v, self.a = variant, a
        self.lon0, self.x0, self.y0 = lon0, x0, y0

    def _theta6(self, phi):
        # theta + sin theta = (1 + pi/2) sin phi, Newton
        target = (1.0 + HALFPI) * np.sin(phi)
        theta = phi.copy()
        for _ in range(25):
            delta = -(theta + np.sin(theta) - target) / (1.0 + np.cos(theta))
            theta = theta + delta
            if np.all(np.abs(delta) < 1e-13):
                break
        return theta

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        a = self.a
        if self.v == 1:
            c = 2.0 * math.sqrt(2.0 / (3.0 * math.pi))
            x, y = c * a * lam * (1.0 - np.abs(phi) / math.pi), c * a * phi
        elif self.v == 2:
            s = np.sqrt(4.0 - 3.0 * np.sin(np.abs(phi)))
            x = 2.0 / math.sqrt(6.0 * math.pi) * a * lam * s
            y = (math.sqrt(2.0 * math.pi / 3.0) * a * (2.0 - s) *
                 np.sign(phi))
        elif self.v == 3:
            c = math.sqrt(math.pi * (4.0 + math.pi))
            x = 2.0 / c * a * lam * (
                1.0 + np.sqrt(np.clip(1.0 - (2.0 * phi / math.pi) ** 2,
                                      0.0, 1.0)))
            y = 4.0 / c * a * phi
        elif self.v == 5:
            c = math.sqrt(2.0 + math.pi)
            x, y = a * lam * (1.0 + np.cos(phi)) / c, 2.0 * a * phi / c
        else:  # 6
            theta = self._theta6(phi)
            c = math.sqrt(2.0 + math.pi)
            x, y = a * lam * (1.0 + np.cos(theta)) / c, 2.0 * a * theta / c
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        xr = np.asarray(x, dtype=np.float64) - self.x0
        yr = np.asarray(y, dtype=np.float64) - self.y0
        a = self.a
        if self.v == 1:
            c = 2.0 * math.sqrt(2.0 / (3.0 * math.pi))
            phi = yr / (c * a)
            lam = xr / (c * a * (1.0 - np.abs(phi) / math.pi))
        elif self.v == 2:
            s = 2.0 - np.abs(yr) / (math.sqrt(2.0 * math.pi / 3.0) * a)
            phi = np.arcsin(np.clip((4.0 - s * s) / 3.0, -1.0, 1.0)) * \
                np.sign(yr)
            lam = xr / (2.0 / math.sqrt(6.0 * math.pi) * a * s)
        elif self.v == 3:
            c = math.sqrt(math.pi * (4.0 + math.pi))
            phi = yr * c / (4.0 * a)
            lam = xr * c / (2.0 * a * (
                1.0 + np.sqrt(np.clip(1.0 - (2.0 * phi / math.pi) ** 2,
                                      0.0, 1.0))))
        elif self.v == 5:
            c = math.sqrt(2.0 + math.pi)
            phi = yr * c / (2.0 * a)
            lam = xr * c / (a * (1.0 + np.cos(phi)))
        else:  # 6
            c = math.sqrt(2.0 + math.pi)
            theta = yr * c / (2.0 * a)
            phi = np.arcsin(np.clip((theta + np.sin(theta)) /
                                    (1.0 + HALFPI), -1.0, 1.0))
            lam = xr * c / (a * (1.0 + np.cos(theta)))
        return lam / D2R + self.lon0, phi / D2R


class SwissObliqueMercator(Projection):
    """somerc, ellipsoidal (the Swiss CH1903 / EPSG 9814 two-step:
    ellipsoid -> conformal sphere -> equatorial-aspect sphere -> Mercator;
    equations as published in the swisstopo projection formulae and proj's
    PJ_somerc.c). Conformal; origin maps exactly to (x_0, y_0)."""

    NITER = 20

    def __init__(self, a, es, lat0=0.0, lon0=0.0, k0=1.0, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        phi0 = lat0 * D2R
        hlf_e = 0.5 * self.e
        cp = math.cos(phi0) ** 2
        one_es = 1.0 - es
        self.c = math.sqrt(1.0 + es * cp * cp / one_es)
        sp = math.sin(phi0)
        self.sinp0 = sp / self.c
        phip0 = math.asin(self.sinp0)
        self.cosp0 = math.cos(phip0)
        spe = sp * self.e
        self.K = (math.log(math.tan(math.pi / 4 + 0.5 * phip0)) -
                  self.c * (math.log(math.tan(math.pi / 4 + 0.5 * phi0)) -
                            hlf_e * math.log((1.0 + spe) / (1.0 - spe))))
        # radius of the conformal sphere times k0 (in units of a)
        self.kR = k0 * math.sqrt(one_es) / (1.0 - es * sp * sp)
        self.hlf_e = hlf_e

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        sp = self.e * np.sin(phi)
        phip = 2.0 * np.arctan(np.exp(
            self.c * (np.log(np.tan(math.pi / 4 + 0.5 * phi)) -
                      self.hlf_e * np.log((1.0 + sp) / (1.0 - sp))) +
            self.K)) - HALFPI
        lamp = self.c * lam
        cp = np.cos(phip)
        phipp = np.arcsin(np.clip(self.cosp0 * np.sin(phip) -
                                  self.sinp0 * cp * np.cos(lamp),
                                  -1.0, 1.0))
        lampp = np.arcsin(np.clip(cp * np.sin(lamp) / np.cos(phipp),
                                  -1.0, 1.0))
        x = self.a * self.kR * lampp
        y = self.a * self.kR * np.log(np.tan(math.pi / 4 + 0.5 * phipp))
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        phipp = 2.0 * (np.arctan(np.exp(
            (np.asarray(y, dtype=np.float64) - self.y0) /
            (self.a * self.kR))) - math.pi / 4)
        lampp = (np.asarray(x, dtype=np.float64) - self.x0) / \
            (self.a * self.kR)
        cp = np.cos(phipp)
        phip = np.arcsin(np.clip(self.cosp0 * np.sin(phipp) +
                                 self.sinp0 * cp * np.cos(lampp),
                                 -1.0, 1.0))
        lamp = np.arcsin(np.clip(cp * np.sin(lampp) / np.cos(phip),
                                 -1.0, 1.0))
        con = (self.K - np.log(np.tan(math.pi / 4 + 0.5 * phip))) / self.c
        phi = phip.copy()
        for _ in range(self.NITER):
            esp = self.e * np.sin(phi)
            dphi = ((con + np.log(np.tan(math.pi / 4 + 0.5 * phi)) -
                     self.hlf_e * np.log((1.0 + esp) / (1.0 - esp))) *
                    (1.0 - esp * esp) * np.cos(phi) / (1.0 - self.es))
            phi = phi - dphi
            if np.all(np.abs(dphi) < 1e-12):
                break
        return (lamp / self.c) / D2R + self.lon0, phi / D2R


class ObliqueStereographic(Projection):
    """sterea, ellipsoidal (EPSG method 9809: Gauss conformal sphere +
    spherical oblique stereographic — the Dutch RD projection; the same
    construction as proj's pj_gauss + PJ_sterea.c). Conformal."""

    NITER = 20

    def __init__(self, a, es, lat0=0.0, lon0=0.0, k0=1.0, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0, self.k0 = lon0, x0, y0, k0
        phi0 = lat0 * D2R
        sphi, cphi2 = math.sin(phi0), math.cos(phi0) ** 2
        self.rc = math.sqrt(1.0 - es) / (1.0 - es * sphi * sphi)
        self.C = math.sqrt(1.0 + es * cphi2 * cphi2 / (1.0 - es))
        chi0 = math.asin(sphi / self.C)
        self.ratexp = 0.5 * self.C * self.e
        self.K = (math.tan(0.5 * chi0 + math.pi / 4) /
                  (math.tan(0.5 * phi0 + math.pi / 4) ** self.C *
                   self._srat(self.e * sphi, self.ratexp)))
        self.sinc0, self.cosc0 = math.sin(chi0), math.cos(chi0)
        self.R2 = 2.0 * self.rc

    @staticmethod
    def _srat(esinp, ex):
        return np.power((1.0 - esinp) / (1.0 + esinp), ex)

    def _gauss_fwd(self, lam, phi):
        chi = 2.0 * np.arctan(
            self.K * np.power(np.tan(0.5 * phi + math.pi / 4), self.C) *
            self._srat(self.e * np.sin(phi), self.ratexp)) - HALFPI
        return self.C * lam, chi

    def _gauss_inv(self, lam, chi):
        lam_out = lam / self.C
        num = np.power(np.tan(0.5 * chi + math.pi / 4) / self.K,
                       1.0 / self.C)
        phi = chi.copy()
        for _ in range(self.NITER):
            phi_new = 2.0 * np.arctan(
                num * self._srat(self.e * np.sin(phi), -0.5 * self.e)) - \
                HALFPI
            if np.all(np.abs(phi_new - phi) < 1e-14):
                phi = phi_new
                break
            phi = phi_new
        return lam_out, phi

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        lamc, chi = self._gauss_fwd(lam, phi)
        sinc, cosc = np.sin(chi), np.cos(chi)
        cosl = np.cos(lamc)
        k = self.k0 * self.R2 / (1.0 + self.sinc0 * sinc +
                                 self.cosc0 * cosc * cosl)
        x = self.a * k * cosc * np.sin(lamc)
        y = self.a * k * (self.cosc0 * sinc - self.sinc0 * cosc * cosl)
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / \
            (self.a * 2.0 * self.rc * self.k0)
        yr = (np.asarray(y, dtype=np.float64) - self.y0) / \
            (self.a * 2.0 * self.rc * self.k0)
        rho = np.sqrt(xr * xr + yr * yr)
        c = 2.0 * np.arctan(rho)
        sinc, cosc = np.sin(c), np.cos(c)
        with np.errstate(divide="ignore", invalid="ignore"):
            chi = np.where(rho < 1e-14, math.asin(self.sinc0),
                           np.arcsin(np.clip(
                               cosc * self.sinc0 +
                               yr * sinc * self.cosc0 / np.maximum(rho, 1e-300),
                               -1.0, 1.0)))
            lamc = np.where(rho < 1e-14, 0.0,
                            np.arctan2(xr * sinc,
                                       rho * self.cosc0 * cosc -
                                       yr * self.sinc0 * sinc))
        lam, phi = self._gauss_inv(lamc, chi)
        return lam / D2R + self.lon0, phi / D2R


class HotineObliqueMercator(Projection):
    """omerc (azimuth form), ellipsoidal (Snyder eq. 9-11..9-47,
    pp. 70-75): conformal along a central geodesic at azimuth alpha
    through (lonc, lat_0). Output axes are rectified by alpha (Snyder
    9-35/36); u is offset so the center maps to the origin (+ x_0/y_0),
    the common national-grid convention."""

    def __init__(self, a, es, lat0, lonc, alpha, k0=1.0, x0=0.0, y0=0.0,
                 no_off=False):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.x0, self.y0 = x0, y0
        phi0 = lat0 * D2R
        alc = alpha * D2R
        sphi0, cphi0 = math.sin(phi0), math.cos(phi0)
        one_es = 1.0 - es
        con = 1.0 - es * sphi0 * sphi0
        self.B = math.sqrt(1.0 + es * cphi0 ** 4 / one_es)
        self.A = a * self.B * k0 * math.sqrt(one_es) / con
        t0 = float(_tsfn(np.float64(phi0), np.float64(sphi0), self.e))
        D = self.B * math.sqrt(one_es) / (cphi0 * math.sqrt(con))
        D2 = max(D * D, 1.0)
        F = D + math.copysign(math.sqrt(D2 - 1.0), phi0)
        self.E = F * t0 ** self.B
        G = (F - 1.0 / F) / 2.0
        self.g0 = math.asin(min(1.0, max(-1.0, math.sin(alc) / D)))
        self.lam0 = lonc * D2R - math.asin(
            min(1.0, max(-1.0, G * math.tan(self.g0)))) / self.B
        self.singam, self.cosgam = math.sin(self.g0), math.cos(self.g0)
        self.sinrot, self.cosrot = math.sin(alc), math.cos(alc)
        # u at the projection center (Snyder 9-38's uc), subtracted so the
        # center maps to the origin unless no_off
        if no_off or abs(alpha) < 1e-12:
            self.u0 = 0.0
        else:
            self.u0 = math.copysign(
                (self.A / self.B) * math.atan2(math.sqrt(D2 - 1.0),
                                               math.cos(alc)), phi0)

    def fwd(self, lng, lat):
        lam = np.asarray(lng, dtype=np.float64) * D2R - self.lam0
        # wrap into (-pi, pi] so features across the antimeridian from the
        # central line don't explode
        lam = np.arctan2(np.sin(lam), np.cos(lam))
        phi = np.asarray(lat, dtype=np.float64) * D2R
        t = _tsfn(phi, np.sin(phi), self.e)
        Q = self.E / np.power(t, self.B)
        S = (Q - 1.0 / Q) / 2.0
        T = (Q + 1.0 / Q) / 2.0
        V = np.sin(self.B * lam)
        U = (-V * self.cosgam + S * self.singam) / T
        v = self.A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * self.B)
        u = (self.A / self.B) * np.arctan2(
            S * self.cosgam + V * self.singam, np.cos(self.B * lam)) - \
            self.u0
        x = v * self.cosrot + u * self.sinrot
        y = u * self.cosrot - v * self.sinrot
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        xr = np.asarray(x, dtype=np.float64) - self.x0
        yr = np.asarray(y, dtype=np.float64) - self.y0
        v = xr * self.cosrot - yr * self.sinrot
        u = yr * self.cosrot + xr * self.sinrot + self.u0
        Qp = np.exp(-self.B * v / self.A)
        Sp = (Qp - 1.0 / Qp) / 2.0
        Tp = (Qp + 1.0 / Qp) / 2.0
        Vp = np.sin(self.B * u / self.A)
        Up = np.clip((Vp * self.cosgam + Sp * self.singam) / Tp, -1.0, 1.0)
        t = np.power(self.E / np.sqrt((1.0 + Up) / (1.0 - Up)), 1.0 / self.B)
        phi = _phi2(t, self.e)
        lam = self.lam0 - np.arctan2(
            Sp * self.cosgam - Vp * self.singam,
            np.cos(self.B * u / self.A)) / self.B
        return lam / D2R, phi / D2R


class Krovak(Projection):
    """krovak, ellipsoidal oblique conformal conic (EPSG method 9819, the
    Czech/Slovak S-JTSK grid): Gauss conformal sphere -> rotation to the
    oblique pole -> conic at the pseudo standard parallel 78.5deg. Default
    parameters are the S-JTSK constants on Bessel; output follows the
    PROJ/GIS orientation (x = -westing, y = -southing, both negative in
    Bohemia)."""

    PHI_P = 78.5 * D2R  # pseudo standard parallel

    def __init__(self, a, es, lat0=49.5, lon0=24.833333333333332,
                 alpha=30.288139752777778, k0=0.9999, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        phiC = lat0 * D2R
        sC = math.sin(phiC)
        one_es = 1.0 - es
        self.A_ = a * math.sqrt(one_es) / (1.0 - es * sC * sC)
        self.B = math.sqrt(1.0 + es * math.cos(phiC) ** 4 / one_es)
        g0 = math.asin(sC / self.B)
        self.t0 = (math.tan(math.pi / 4 + g0 / 2) *
                   ((1.0 + self.e * sC) / (1.0 - self.e * sC)) **
                   (self.e * self.B / 2) /
                   math.tan(math.pi / 4 + phiC / 2) ** self.B)
        self.alC = alpha * D2R
        self.sin_al, self.cos_al = math.sin(self.alC), math.cos(self.alC)
        self.n = math.sin(self.PHI_P)
        self.r0 = k0 * self.A_ / math.tan(self.PHI_P)
        self.tanTP = math.tan(math.pi / 4 + self.PHI_P / 2)

    def _gauss_u(self, phi):
        esp = self.e * np.sin(phi)
        return 2.0 * (np.arctan(
            self.t0 * np.power(np.tan(phi / 2 + math.pi / 4), self.B) /
            np.power((1.0 + esp) / (1.0 - esp), self.e * self.B / 2)) -
            math.pi / 4)

    def fwd(self, lng, lat):
        lam = np.asarray(lng, dtype=np.float64) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        U = self._gauss_u(phi)
        V = self.B * (self.lon0 * D2R - lam)
        T = np.arcsin(np.clip(self.cos_al * np.sin(U) +
                              self.sin_al * np.cos(U) * np.cos(V),
                              -1.0, 1.0))
        D = np.arcsin(np.clip(np.cos(U) * np.sin(V) / np.cos(T), -1.0, 1.0))
        theta = self.n * D
        r = self.r0 * self.tanTP ** self.n / \
            np.power(np.tan(T / 2 + math.pi / 4), self.n)
        southing = r * np.cos(theta)
        westing = r * np.sin(theta)
        return -westing + self.x0, -southing + self.y0

    def inv(self, x, y):
        westing = -(np.asarray(x, dtype=np.float64) - self.x0)
        southing = -(np.asarray(y, dtype=np.float64) - self.y0)
        r = np.hypot(westing, southing)
        theta = np.arctan2(westing, southing)
        D = theta / self.n
        T = 2.0 * (np.arctan(np.power(self.r0 / r, 1.0 / self.n) *
                             self.tanTP) - math.pi / 4)
        U = np.arcsin(np.clip(self.cos_al * np.sin(T) -
                              self.sin_al * np.cos(T) * np.cos(D),
                              -1.0, 1.0))
        V = np.arcsin(np.clip(np.cos(T) * np.sin(D) / np.cos(U), -1.0, 1.0))
        # invert the conformal-sphere latitude by fixed point
        phi = U.copy()
        base = np.power(np.tan(U / 2 + math.pi / 4) / self.t0, 1.0 / self.B)
        for _ in range(20):
            esp = self.e * np.sin(phi)
            phi_new = 2.0 * (np.arctan(
                base * np.power((1.0 + esp) / (1.0 - esp), self.e / 2)) -
                math.pi / 4)
            if np.all(np.abs(phi_new - phi) < 1e-14):
                phi = phi_new
                break
            phi = phi_new
        lam = self.lon0 * D2R - V / self.B
        return lam / D2R, phi / D2R


class _SimplePseudoCylindrical(Projection):
    """Shared frame for spherical pseudocylindricals with closed forward
    and inverse forms (the +proj= long tail the reference reaches through
    mproj's pj_list, mapshaper-projections.js:4-66; equations from Snyder,
    "Map Projections — A Working Manual" / "An Album of Map Projections").
    Subclasses implement _fwd/_inv on radians over the unit sphere."""

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        x, y = self._fwd(lam, phi)
        return self.a * x + self.x0, self.a * y + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        yr = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        lam, phi = self._inv(xr, yr)
        return lam / D2R + self.lon0, phi / D2R


class KavrayskiyVII(_SimplePseudoCylindrical):
    """kav7: x = (3/2) lam sqrt(1/3 - (phi/pi)^2), y = phi."""

    def _fwd(self, lam, phi):
        s = np.sqrt(np.clip(1.0 / 3.0 - (phi / math.pi) ** 2, 0.0, None))
        return 1.5 * lam * s, phi

    def _inv(self, x, y):
        phi = y
        s = np.sqrt(np.clip(1.0 / 3.0 - (phi / math.pi) ** 2, 1e-12, None))
        return x / (1.5 * s), phi


class WagnerVI(_SimplePseudoCylindrical):
    """wag6: x = lam sqrt(1 - 3 (phi/pi)^2), y = phi."""

    def _fwd(self, lam, phi):
        s = np.sqrt(np.clip(1.0 - 3.0 * (phi / math.pi) ** 2, 0.0, None))
        return lam * s, phi

    def _inv(self, x, y):
        phi = y
        s = np.sqrt(np.clip(1.0 - 3.0 * (phi / math.pi) ** 2, 1e-12, None))
        return x / s, phi


class Collignon(_SimplePseudoCylindrical):
    """collg (equal-area, triangular): x = 2/sqrt(pi) lam sqrt(1-sin phi),
    y = sqrt(pi) (1 - sqrt(1 - sin phi))."""

    def _fwd(self, lam, phi):
        s = np.sqrt(np.clip(1.0 - np.sin(phi), 0.0, None))
        return 2.0 / SQRT_PI * lam * s, SQRT_PI * (1.0 - s)

    def _inv(self, x, y):
        s = 1.0 - y / SQRT_PI
        phi = np.arcsin(np.clip(1.0 - s * s, -1.0, 1.0))
        lam = x * SQRT_PI / (2.0 * np.maximum(s, 1e-12))
        return lam, phi


class CrasterParabolic(_SimplePseudoCylindrical):
    """crast (equal-area, parabolic meridians):
    x = sqrt(3/pi) lam (2 cos(2 phi / 3) - 1), y = sqrt(3 pi) sin(phi/3)."""

    C = math.sqrt(3.0 / math.pi)

    def _fwd(self, lam, phi):
        return (self.C * lam * (2.0 * np.cos(2.0 * phi / 3.0) - 1.0),
                math.sqrt(3.0 * math.pi) * np.sin(phi / 3.0))

    def _inv(self, x, y):
        phi = 3.0 * np.arcsin(np.clip(y / math.sqrt(3.0 * math.pi),
                                      -1.0, 1.0))
        lam = x / (self.C * (2.0 * np.cos(2.0 * phi / 3.0) - 1.0))
        return lam, phi


class QuarticAuthalic(_SimplePseudoCylindrical):
    """qua_aut (equal-area): x = lam cos phi / cos(phi/2),
    y = 2 sin(phi/2)."""

    def _fwd(self, lam, phi):
        h = 0.5 * phi
        return lam * np.cos(phi) / np.cos(h), 2.0 * np.sin(h)

    def _inv(self, x, y):
        h = np.arcsin(np.clip(0.5 * y, -1.0, 1.0))
        phi = 2.0 * h
        lam = x * np.cos(h) / np.where(np.abs(np.cos(phi)) < 1e-12,
                                       1e-12, np.cos(phi))
        return lam, phi


class WinkelI(_SimplePseudoCylindrical):
    """wink1: x = lam (cos lat_ts + cos phi)/2, y = phi (arithmetic mean
    of equirectangular and sinusoidal)."""

    def __init__(self, a, lat_ts=0.0, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0, x0, y0)
        self.cosphi1 = math.cos(lat_ts * D2R)

    def _fwd(self, lam, phi):
        return 0.5 * lam * (self.cosphi1 + np.cos(phi)), phi

    def _inv(self, x, y):
        phi = y
        return 2.0 * x / (self.cosphi1 + np.cos(phi)), phi


class Loximuthal(_SimplePseudoCylindrical):
    """loxim: straight loxodromes from the central point (lat_1).
    y = phi - phi1; x = lam (phi - phi1) / ln(tan(pi/4 + phi/2) /
    tan(pi/4 + phi1/2)), degenerating to lam cos(phi1) on the parallel."""

    EPS = 1e-8

    def __init__(self, a, lat1=0.0, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0, x0, y0)
        self.phi1 = lat1 * D2R
        self.cosphi1 = math.cos(self.phi1)
        self.tanphi1 = math.tan(0.25 * math.pi + 0.5 * self.phi1)

    def _fwd(self, lam, phi):
        d = phi - self.phi1
        t = np.tan(0.25 * math.pi + 0.5 * phi)
        ln = np.log(np.maximum(t, 1e-12) / self.tanphi1)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = np.where(np.abs(d) < self.EPS, lam * self.cosphi1,
                         np.where(np.abs(ln) < self.EPS, 0.0, lam * d / ln))
        return x, d

    def _inv(self, x, y):
        phi = y + self.phi1
        d = y
        t = np.tan(0.25 * math.pi + 0.5 * phi)
        ln = np.log(np.maximum(t, 1e-12) / self.tanphi1)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(np.abs(d) < self.EPS, x / self.cosphi1,
                           np.where(np.abs(ln) < self.EPS, 0.0, x * ln / d))
        return lam, phi


class TransverseCylindricalEqualArea(Projection):
    """tcea, spherical (Snyder eq. 10-1..10-7): x = cos phi sin lam / k0,
    y = k0 (atan2(tan phi, cos lam) - lat_0). Equal-area."""

    def __init__(self, a, lat0=0.0, lon0=0.0, k0=1.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0
        self.phi0, self.k0 = lat0 * D2R, k0

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        x = self.a * np.cos(phi) * np.sin(lam) / self.k0
        y = self.a * self.k0 * (np.arctan2(np.tan(phi), np.cos(lam)) -
                                self.phi0)
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        t = (np.asarray(x, dtype=np.float64) - self.x0) * self.k0 / self.a
        d = (np.asarray(y, dtype=np.float64) - self.y0) / (self.a * self.k0) \
            + self.phi0
        s = np.sqrt(np.clip(1.0 - t * t, 0.0, 1.0))
        phi = np.arcsin(np.clip(s * np.sin(d), -1.0, 1.0))
        lam = np.arctan2(t, s * np.cos(d))
        return lam / D2R + self.lon0, phi / D2R


class CentralCylindrical(_SimplePseudoCylindrical):
    """cc: x = lam, y = tan phi (perspective from the axis)."""

    def _fwd(self, lam, phi):
        return lam, np.tan(np.clip(phi, -1.5607, 1.5607))

    def _inv(self, x, y):
        return x, np.arctan(y)


class NellHammer(_SimplePseudoCylindrical):
    """nell_h (equal-area): x = lam (1 + cos phi)/2,
    y = 2 (phi - tan(phi/2)); inverse iterates phi (Newton)."""

    def _fwd(self, lam, phi):
        return 0.5 * lam * (1.0 + np.cos(phi)), 2.0 * (phi - np.tan(0.5 * phi))

    def _inv(self, x, y):
        phi = np.clip(y, -HALFPI, HALFPI).copy()
        for _ in range(30):
            f = 2.0 * (phi - np.tan(0.5 * phi)) - y
            fp = 2.0 - 1.0 / np.cos(0.5 * phi) ** 2
            step = np.where(np.abs(fp) < 1e-12, 0.0, f / fp)
            phi = phi - step
            if np.all(np.abs(step) < 1e-13):
                break
        lam = 2.0 * x / (1.0 + np.cos(phi))
        return lam, phi


class _MollweideFamily(_SimplePseudoCylindrical):
    """Generalized Mollweide frame (Snyder pp. 249-252 generalization used
    by proj's moll/wag4/wag5 group): solve t + sin t = C_p sin(phi) by
    Newton (t = 2*theta), then x = C_x lam cos(theta), y = C_y sin(theta).
    Subclasses pin (C_x, C_y, C_p)."""

    C_x = C_y = C_p = 1.0
    MAX_ITER = 12
    TOL = 1e-12

    def _fwd(self, lam, phi):
        k = self.C_p * np.sin(phi)
        t = np.asarray(phi, dtype=np.float64).copy()
        for _ in range(self.MAX_ITER):
            step = (t + np.sin(t) - k) / (1.0 + np.cos(t))
            t = t - step
            if np.all(np.abs(step) < self.TOL):
                break
        th = 0.5 * t
        return self.C_x * lam * np.cos(th), self.C_y * np.sin(th)

    def _inv(self, x, y):
        th = np.arcsin(np.clip(y / self.C_y, -1.0, 1.0))
        lam = x / (self.C_x * np.maximum(np.cos(th), 1e-12))
        t = 2.0 * th
        phi = np.arcsin(np.clip((t + np.sin(t)) / self.C_p, -1.0, 1.0))
        return lam, phi


def _moll_constants(p: float) -> tuple[float, float, float]:
    """(C_x, C_y, C_p) for the generalized Mollweide whose pole maps to
    parametric angle theta = p (proj pj_moll.c setup): moll is p = pi/2,
    Wagner IV p = pi/3."""
    sp = math.sin(p)
    p2 = 2.0 * p
    r = math.sqrt(2.0 * math.pi * sp / (p2 + math.sin(p2)))
    return 2.0 * r / math.pi, r / sp, p2 + math.sin(p2)


class WagnerIV(_MollweideFamily):
    """wag4 (equal-area): Mollweide family bounded at theta = 60 deg
    (C_x 0.86310, C_y 1.56548, C_p 2.96042 follow from the construction)."""

    C_x, C_y, C_p = _moll_constants(math.pi / 3.0)


class WagnerV(_MollweideFamily):
    """wag5 (Wagner 1949): Mollweide-family compromise with the published
    constants x = 0.90977 lam cos(theta), y = 1.65014 sin(theta),
    2 theta + sin(2 theta) = 3.00896 sin(phi) (Snyder, "An Album of Map
    Projections" p. 44)."""

    C_x, C_y, C_p = 0.90977, 1.65014, 3.00896


class WagnerII(_SimplePseudoCylindrical):
    """wag2 (Wagner 1932 compromise, Album p. 40):
    theta = asin(0.88022 sin(0.8855 phi)); x = 0.92483 lam cos(theta),
    y = 1.38725 theta. Closed inverse."""

    C_x, C_y, C_p1, C_p2 = 0.92483, 1.38725, 0.88022, 0.8855

    def _fwd(self, lam, phi):
        th = np.arcsin(self.C_p1 * np.sin(self.C_p2 * phi))
        return self.C_x * lam * np.cos(th), self.C_y * th

    def _inv(self, x, y):
        th = y / self.C_y
        lam = x / (self.C_x * np.cos(th))
        phi = np.arcsin(np.clip(np.sin(th) / self.C_p1, -1.0, 1.0)) / self.C_p2
        return lam, phi


class WagnerIII(_SimplePseudoCylindrical):
    """wag3 (Wagner 1932): x = C lam cos(2 phi / 3), y = phi, with
    C = cos(lat_ts) / cos(2 lat_ts / 3) making lat_ts true to scale."""

    def __init__(self, a, lat_ts=0.0, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0, x0, y0)
        ts = lat_ts * D2R
        self.C = math.cos(ts) / math.cos(2.0 * ts / 3.0)

    def _fwd(self, lam, phi):
        return self.C * lam * np.cos(2.0 * phi / 3.0), phi

    def _inv(self, x, y):
        phi = y
        return x / (self.C * np.cos(2.0 * phi / 3.0)), phi


class _STSProjection(_SimplePseudoCylindrical):
    """Shared sine/tangent-series frame (proj PJ_sts.c; Snyder's Album for
    the member formulas): with phi' = phi / Q_p,
      sine mode: x = (Q_q/Q_p) lam cos(phi) / cos(phi'), y = Q_p sin(phi')
      tan mode:  x = (Q_q/Q_p) lam cos(phi) cos(phi')^2, y = Q_p tan(phi')
    Members pin (Q_p, Q_q, tan_mode): Kavraisky V (1.50488, 1.35439, sine),
    McBryde-Thomas sine I (1.48875, 1.36509, sine), Foucaut (2, 2, tan).
    All equal-area (verified by the Jacobian property test)."""

    Q_p = Q_q = 1.0
    TAN_MODE = False

    def _fwd(self, lam, phi):
        cx = self.Q_q / self.Q_p
        ph = phi / self.Q_q
        c = np.cos(ph)
        if self.TAN_MODE:
            return cx * lam * np.cos(phi) * c * c, self.Q_p * np.tan(ph)
        return cx * lam * np.cos(phi) / c, self.Q_p * np.sin(ph)

    def _inv(self, x, y):
        cx = self.Q_q / self.Q_p
        if self.TAN_MODE:
            ph = np.arctan(y / self.Q_p)
            phi = ph * self.Q_q
            c = np.cos(ph)
            lam = x / (cx * np.maximum(np.cos(phi), 1e-12) * c * c)
        else:
            ph = np.arcsin(np.clip(y / self.Q_p, -1.0, 1.0))
            phi = ph * self.Q_q
            lam = x * np.cos(ph) / (cx * np.maximum(np.cos(phi), 1e-12))
        return lam, phi


class KavrayskiyV(_STSProjection):
    """kav5: x = 0.9 lam cos(phi)/cos(phi/1.35439),
    y = 1.50488 sin(phi/1.35439) (equal-area)."""

    Q_p, Q_q, TAN_MODE = 1.50488, 1.35439, False


class McBrydeThomasSine(_STSProjection):
    """mbt_s (McBryde-Thomas flat-pole sine no. 1 constants, Album p. 48)."""

    Q_p, Q_q, TAN_MODE = 1.48875, 1.36509, False


class Foucaut(_STSProjection):
    """fouc (Foucaut 1862 stereographic-equivalent, equal-area):
    x = lam cos(phi) cos(phi/2)^2, y = 2 tan(phi/2)."""

    Q_p, Q_q, TAN_MODE = 2.0, 2.0, True


class Times(_SimplePseudoCylindrical):
    """times (Moir 1965, The Times Atlas): t = tan(phi/2),
    x = lam (0.74482 - 0.34588 sin^2(pi/4 t)), y = 1.70711 t.
    Closed inverse."""

    def _fwd(self, lam, phi):
        t = np.tan(0.5 * phi)
        s = np.sin(0.25 * math.pi * t)
        return lam * (0.74482 - 0.34588 * s * s), 1.70711 * t

    def _inv(self, x, y):
        t = y / 1.70711
        s = np.sin(0.25 * math.pi * t)
        return x / (0.74482 - 0.34588 * s * s), 2.0 * np.arctan(t)


class Fahey(_SimplePseudoCylindrical):
    """fahey (Fahey 1975, standard parallels 35deg): t = tan(phi/2),
    x = cos(35deg) lam sqrt(1 - t^2), y = (1 + cos(35deg)) t."""

    C = math.cos(35.0 * math.pi / 180.0)

    def _fwd(self, lam, phi):
        t = np.tan(0.5 * phi)
        return (self.C * lam * np.sqrt(np.clip(1.0 - t * t, 0.0, None)),
                (1.0 + self.C) * t)

    def _inv(self, x, y):
        t = y / (1.0 + self.C)
        s = np.clip(1.0 - t * t, 1e-12, None)
        return x / (self.C * np.sqrt(s)), 2.0 * np.arctan(t)


class URMFPS(_SimplePseudoCylindrical):
    """urmfps (Urmaev flat-polar sinusoidal, +n= required): with
    sin(theta) = n sin(phi), x = C_x lam cos(theta), y = C_y theta / n,
    C_x = 0.8773826753 and C_y = 1/C_x — the pseudocylindrical equal-area
    closure f(phi) g'(phi) = cos(phi) forces C_x C_y = 1 for any n.
    wag1 (Wagner I = Kavrayskiy VI) is the n = sqrt(3)/2 member (its pole
    line is half the equator: cos(asin(n)) = 1/2)."""

    C_x = 0.8773826753
    C_y = 1.0 / C_x

    def __init__(self, a, n, lon0=0.0, x0=0.0, y0=0.0):
        if not 0.0 < n <= 1.0:
            raise ValueError("urmfps: +n= must be in (0, 1]")
        super().__init__(a, lon0, x0, y0)
        self.n = n

    def _fwd(self, lam, phi):
        th = np.arcsin(self.n * np.sin(phi))
        return self.C_x * lam * np.cos(th), self.C_y * th / self.n

    def _inv(self, x, y):
        th = y * self.n / self.C_y
        phi = np.arcsin(np.clip(np.sin(th) / self.n, -1.0, 1.0))
        return x / (self.C_x * np.maximum(np.cos(th), 1e-12)), phi


class Boggs(_SimplePseudoCylindrical):
    """boggs (Boggs eumorphic, equal-area): the parallel spacing is the
    arithmetic mean of the sinusoidal's and Mollweide's, and x is the
    harmonic mean the equal-area closure then forces. With the Mollweide
    parametric angle t (2t + sin 2t = pi sin phi):
        x = 2.00276 lam / (sec phi + 1.11072 sec t)
        y = 0.49931 (phi + sqrt(2) sin t)
    (1.11072 = pi/(2 sqrt 2); 2.00276 = 1/0.49931; with those the closure
    f g' = cos phi holds exactly — verified by the Jacobian property test.)
    Forward solves t by Newton; the inverse recovers phi from the monotone
    y(phi) by bisection, then lam closed-form."""

    C_y = 0.49931
    C_x = 1.0 / C_y
    C_s = math.pi / (2.0 * math.sqrt(2.0))

    @staticmethod
    def _moll_t(phi):
        k = math.pi * np.sin(phi)
        t2 = np.asarray(phi, dtype=np.float64).copy() * 2.0
        for _ in range(14):
            step = (t2 + np.sin(t2) - k) / np.maximum(1.0 + np.cos(t2), 1e-9)
            t2 = t2 - step
            if np.all(np.abs(step) < 1e-13):
                break
        return 0.5 * t2

    def _fwd(self, lam, phi):
        t = self._moll_t(phi)
        sec_phi = 1.0 / np.maximum(np.cos(phi), 1e-9)
        sec_t = 1.0 / np.maximum(np.cos(t), 1e-9)
        x = self.C_x * lam / (sec_phi + self.C_s * sec_t)
        y = self.C_y * (phi + math.sqrt(2.0) * np.sin(t))
        return x, y

    def _inv(self, x, y):
        lo = np.full_like(np.asarray(y, dtype=np.float64), -HALFPI)
        hi = np.full_like(lo, HALFPI)
        for _ in range(55):
            mid = 0.5 * (lo + hi)
            t = self._moll_t(mid)
            f = self.C_y * (mid + math.sqrt(2.0) * np.sin(t))
            lo = np.where(f < y, mid, lo)
            hi = np.where(f < y, hi, mid)
        phi = 0.5 * (lo + hi)
        t = self._moll_t(phi)
        sec_phi = 1.0 / np.maximum(np.cos(phi), 1e-9)
        sec_t = 1.0 / np.maximum(np.cos(t), 1e-9)
        lam = x * (sec_phi + self.C_s * sec_t) / self.C_x
        return lam, phi


class Nell(_SimplePseudoCylindrical):
    """nell (Nell 1890 modified sinusoidal): theta + sin theta = 2 sin phi
    (Newton), x = lam (1 + cos theta) / 2, y = theta. Closed inverse."""

    def _fwd(self, lam, phi):
        k = 2.0 * np.sin(phi)
        th = np.asarray(phi, dtype=np.float64).copy()
        for _ in range(14):
            step = (th + np.sin(th) - k) / (1.0 + np.cos(th))
            th = th - step
            if np.all(np.abs(step) < 1e-13):
                break
        return 0.5 * lam * (1.0 + np.cos(th)), th

    def _inv(self, x, y):
        th = y
        phi = np.arcsin(np.clip(0.5 * (th + np.sin(th)), -1.0, 1.0))
        return 2.0 * x / (1.0 + np.cos(th)), phi


class PutninsP2(_SimplePseudoCylindrical):
    """putp2 (Putnins P2, equal-area): theta solves
        theta + sin theta cos theta - sin theta = C_p sin phi
    with C_p = 0.6141848493043784 (which makes the pole land exactly at
    theta = 60 deg, where the lhs derivative cos t (2 cos t - 1) vanishes —
    so the forward solves by bisection, not Newton);
    x = 1.89490 lam (cos theta - 1/2), y = 1.71848 sin theta.
    The closure C_x C_y C_p = 2 pins the constants (1.89490 * 1.71848 *
    0.61418 = 2.0000), verified by the Jacobian property test."""

    C_x, C_y, C_p = 1.89490, 1.71848, 0.6141848493043784
    TH_MAX = math.pi / 3.0

    @classmethod
    def _theta(cls, phi):
        k = cls.C_p * np.sin(phi)
        lo = np.full_like(np.asarray(phi, dtype=np.float64), -cls.TH_MAX)
        hi = np.full_like(lo, cls.TH_MAX)
        for _ in range(55):
            mid = 0.5 * (lo + hi)
            f = mid + np.sin(mid) * np.cos(mid) - np.sin(mid)
            lo = np.where(f < k, mid, lo)
            hi = np.where(f < k, hi, mid)
        th = 0.5 * (lo + hi)
        # The root is quadratically degenerate at the poles (f' -> 0 at
        # theta = +-pi/3), so bisection can only locate it to ~sqrt(eps);
        # snap exact-pole inputs to the exact pole angle.
        return np.where(np.abs(k) >= cls.C_p * (1.0 - 1e-14),
                        np.sign(k) * cls.TH_MAX, th)

    def _fwd(self, lam, phi):
        th = self._theta(phi)
        return (self.C_x * lam * (np.cos(th) - 0.5),
                self.C_y * np.sin(th))

    def _inv(self, x, y):
        th = np.arcsin(np.clip(y / self.C_y, -1.0, 1.0))
        phi = np.arcsin(np.clip(
            (th + np.sin(th) * np.cos(th) - np.sin(th)) / self.C_p,
            -1.0, 1.0))
        lam = x / (self.C_x * np.maximum(np.cos(th) - 0.5, 1e-9))
        return lam, phi


class Hatano(_SimplePseudoCylindrical):
    """hatano (Hatano 1972 asymmetrical equal-area): per hemisphere,
    2 theta + sin 2 theta = C_p sin phi (Mollweide-type Newton) with
    C_p = 2.67595 north / 2.43763 south; x = 0.85 lam cos theta,
    y = C_y sin theta with C_y = 1.75859 north / 1.93052 south. Both
    hemispheres satisfy the closure 0.85 C_y C_p = 4 (north:
    1.75859 * 2.67595 = 4.7059 = 4/0.85; south: 1.93052 * 2.43763 =
    4.7059), so the projection is equal-area across the equator seam."""

    C_x = 0.85
    CP_N, CY_N = 2.67595, 1.75859
    CP_S, CY_S = 2.43763, 1.93052

    def _fwd(self, lam, phi):
        c_p = np.where(phi >= 0.0, self.CP_N, self.CP_S)
        c_y = np.where(phi >= 0.0, self.CY_N, self.CY_S)
        k = c_p * np.sin(phi)
        # seed t2 = phi (the Mollweide-family seed): the 2*phi seed lands in
        # the flat 1+cos(t2) ~ 0 region near the poles and Newton blows up
        t2 = np.asarray(phi, dtype=np.float64).copy()
        for _ in range(20):
            step = (t2 + np.sin(t2) - k) / np.maximum(1.0 + np.cos(t2), 1e-9)
            t2 = t2 - np.clip(step, -0.75, 0.75)
            if np.all(np.abs(step) < 1e-13):
                break
        th = 0.5 * t2
        return self.C_x * lam * np.cos(th), c_y * np.sin(th)

    def _inv(self, x, y):
        c_p = np.where(y >= 0.0, self.CP_N, self.CP_S)
        c_y = np.where(y >= 0.0, self.CY_N, self.CY_S)
        th = np.arcsin(np.clip(y / c_y, -1.0, 1.0))
        t2 = 2.0 * th
        phi = np.arcsin(np.clip((t2 + np.sin(t2)) / c_p, -1.0, 1.0))
        lam = x / (self.C_x * np.maximum(np.cos(th), 1e-12))
        return lam, phi


class GeneralSinusoidal(_SimplePseudoCylindrical):
    """gn_sinu (+m= +n= required): the general sinusoidal series
        m theta + sin theta = n sin phi  (Newton; derivative m + cos theta)
        x = C_x lam (m + cos theta),  y = C_y theta
    with C_y = sqrt((m+1)/n) and C_x = C_y/(m+1) — the equal-area closure
    C_x C_y n = 1. sinu is the (m=0, n=1) member and eck6 the
    (m=1, n=1+pi/2) member (both verified by the family-consistency
    test)."""

    def __init__(self, a, m, n, lon0=0.0, x0=0.0, y0=0.0):
        if n <= 0.0 or m < 0.0:
            raise ValueError("gn_sinu: needs +n= > 0 and +m= >= 0")
        super().__init__(a, lon0, x0, y0)
        self.m, self.n = m, n
        self.C_y = math.sqrt((m + 1.0) / n)
        self.C_x = self.C_y / (m + 1.0)

    def _fwd(self, lam, phi):
        k = self.n * np.sin(phi)
        th = np.asarray(phi, dtype=np.float64).copy()
        for _ in range(16):
            step = (self.m * th + np.sin(th) - k) / \
                np.maximum(self.m + np.cos(th), 1e-9)
            th = th - step
            if np.all(np.abs(step) < 1e-13):
                break
        return self.C_x * lam * (self.m + np.cos(th)), self.C_y * th

    def _inv(self, x, y):
        th = y / self.C_y
        phi = np.arcsin(np.clip((self.m * th + np.sin(th)) / self.n,
                                -1.0, 1.0))
        lam = x / (self.C_x * np.maximum(self.m + np.cos(th), 1e-9))
        return lam, phi


class WagnerVII(WinkelTripel):
    """wag7 (Wagner VII / Hammer-Wagner, equal-area modified azimuthal,
    Snyder & Voxland Album p. 62): with sin psi = 0.90630779 sin phi and
    D = sqrt(2 / (1 + cos psi cos(lam/3))),
        x = 2.66723 D cos psi sin(lam/3),  y = 1.24104 D sin psi.
    Equal-area (checked numerically by the Jacobian property test).
    Inverse: CLOSED (Hammer-type algebra): with u = x/C_x, v = y/C_y the
    forward gives u^2 + v^2 = D^2 (1 - (cos psi cos(lam/3))^2) and
    cos psi cos(lam/3) = 2/D^2 - 1, so D^2 = 4 / (4 - u^2 - v^2); then
    sin psi = v/D and lam/3 = atan2(u/D, 2/D^2 - 1)."""

    C_x, C_y, C_n = 2.66723, 1.24104, 0.90630779

    def __init__(self, a, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lat1=None, lon0=lon0, x0=x0, y0=y0)

    def _fwd_rad(self, lam, phi):
        sp = self.C_n * np.sin(phi)
        cp = np.sqrt(np.clip(1.0 - sp * sp, 0.0, None))
        cl = np.cos(lam / 3.0)
        d = np.sqrt(2.0 / np.maximum(1.0 + cp * cl, 1e-12))
        return (self.C_x * d * cp * np.sin(lam / 3.0),
                self.C_y * d * sp)

    def inv(self, x, y):
        u = ((np.asarray(x, dtype=np.float64) - self.x0) / self.a) / self.C_x
        v = ((np.asarray(y, dtype=np.float64) - self.y0) / self.a) / self.C_y
        r2 = np.clip(u * u + v * v, 0.0, 4.0 - 1e-12)
        d2 = 4.0 / (4.0 - r2)
        d = np.sqrt(d2)
        sp = np.clip(v / d, -1.0, 1.0)
        lam = 3.0 * np.arctan2(u / d, 2.0 / d2 - 1.0)
        phi = np.arcsin(np.clip(sp / self.C_n, -1.0, 1.0))
        return lam / D2R + self.lon0, phi / D2R


class McBrydeThomasFlatPolarSine2(_SimplePseudoCylindrical):
    """mbtfps (McBryde-Thomas flat-polar sinusoidal No. 2, equal-area;
    Snyder & Voxland Album p. 48): theta solves
        (C2/3) sin(theta/C2) + sin theta = C3 sin phi   (Newton)
    with C2 = 1.36509, C3 = 1.41546; then
        x = 0.22248 lam (1 + 3 cos theta / cos(theta/C2))
        y = 1.44492 sin(theta/C2).
    Equal-area closure 3 C_x C_y C3 / C2 = 1 and C1 = C2/3 pin the
    constants (verified by the Jacobian property test). Closed inverse."""

    C1, C2, C3 = 0.45503, 1.36509, 1.41546
    C_x, C_y = 0.22248, 1.44492

    def _theta(self, phi):
        k = self.C3 * np.sin(phi)
        th = np.asarray(phi, dtype=np.float64).copy()
        for _ in range(16):
            t = th / self.C2
            step = (self.C1 * np.sin(t) + np.sin(th) - k) / \
                (self.C1 / self.C2 * np.cos(t) + np.cos(th))
            th = th - step
            if np.all(np.abs(step) < 1e-13):
                break
        return th

    def _fwd(self, lam, phi):
        th = self._theta(phi)
        t = th / self.C2
        x = self.C_x * lam * (1.0 + 3.0 * np.cos(th) / np.cos(t))
        return x, self.C_y * np.sin(t)

    def _inv(self, x, y):
        t = np.arcsin(np.clip(y / self.C_y, -1.0, 1.0))
        th = self.C2 * t
        lam = x / (self.C_x * (1.0 + 3.0 * np.cos(th) / np.cos(t)))
        phi = np.arcsin(np.clip(
            (self.C1 * np.sin(t) + np.sin(th)) / self.C3, -1.0, 1.0))
        return lam, phi


class McBrydeThomasFlatPolarQuartic(_SimplePseudoCylindrical):
    """mbtfpq (McBryde-Thomas flat-polar quartic, equal-area; Snyder &
    Voxland Album p. 52): theta solves
        sin(theta/2) + sin theta = (1 + sqrt(2)/2) sin phi   (Newton)
    then x = 0.31246 lam (1 + 2 cos theta / cos(theta/2)),
         y = 1.87476 sin(theta/2).
    Closure C_x C_y C = 1 pins the constants. Closed inverse."""

    C = 1.0 + math.sqrt(2.0) / 2.0
    C_x, C_y = 0.31246, 1.87476

    def _theta(self, phi):
        k = self.C * np.sin(phi)
        th = np.asarray(phi, dtype=np.float64).copy()
        for _ in range(16):
            step = (np.sin(0.5 * th) + np.sin(th) - k) / \
                (0.5 * np.cos(0.5 * th) + np.cos(th))
            th = th - step
            if np.all(np.abs(step) < 1e-13):
                break
        return th

    def _fwd(self, lam, phi):
        th = self._theta(phi)
        x = self.C_x * lam * (1.0 + 2.0 * np.cos(th) / np.cos(0.5 * th))
        return x, self.C_y * np.sin(0.5 * th)

    def _inv(self, x, y):
        t = np.arcsin(np.clip(y / self.C_y, -1.0, 1.0))
        th = 2.0 * t
        lam = x / (self.C_x * (1.0 + 2.0 * np.cos(th) / np.cos(0.5 * th)))
        phi = np.arcsin(np.clip((np.sin(0.5 * th) + np.sin(th)) / self.C,
                                -1.0, 1.0))
        return lam, phi


class McBrydeThomasFlatPolarParabolic(_SimplePseudoCylindrical):
    """mbtfpp (McBryde-Thomas flat-polar parabolic, equal-area; Snyder &
    Voxland Album p. 44): DIRECT relation sin theta = C sin phi with
    C = 0.95257934441568, then
        x = 0.92582 lam (2 cos(2 theta / 3) - 1)
        y = 3.40168 sin(theta / 3).
    The triple-angle identity cos theta = cos(theta/3)(2 cos(2theta/3)-1)
    makes the closure C_x C_y C / 3 = 1 exact (Jacobian-verified).
    Fully closed forward AND inverse."""

    CS = 0.95257934441568
    C_x, C_y = 0.92582, 3.40168

    def _fwd(self, lam, phi):
        th = np.arcsin(np.clip(self.CS * np.sin(phi), -1.0, 1.0))
        x = self.C_x * lam * (2.0 * np.cos(2.0 * th / 3.0) - 1.0)
        return x, self.C_y * np.sin(th / 3.0)

    def _inv(self, x, y):
        th = 3.0 * np.arcsin(np.clip(y / self.C_y, -1.0, 1.0))
        lam = x / (self.C_x * (2.0 * np.cos(2.0 * th / 3.0) - 1.0))
        phi = np.arcsin(np.clip(np.sin(th) / self.CS, -1.0, 1.0))
        return lam, phi


class _Eck3Family(_SimplePseudoCylindrical):
    """Shared frame for the Eckert-III-like pseudocylindricals the
    reference reaches via mproj's pj_eck3_init (putp1 among them):
        x = C_x lam (A + sqrt(1 - B phi^2)),  y = C_y phi
    with closed inverse (phi = y / C_y)."""

    C_x = C_y = 1.0
    A = 0.0
    B = 0.0

    def _fwd(self, lam, phi):
        s = np.sqrt(np.clip(1.0 - self.B * phi * phi, 0.0, None))
        return self.C_x * lam * (self.A + s), self.C_y * phi

    def _inv(self, x, y):
        phi = y / self.C_y
        s = np.sqrt(np.clip(1.0 - self.B * phi * phi, 0.0, None))
        return x / (self.C_x * (self.A + s)), phi


class PutninsP1(_Eck3Family):
    """putp1 (Putnins P1; mproj pj_putp1 via the eck3 frame):
    C_x = 1.89490, C_y = 0.94745 = C_x/2, A = -0.5,
    B = 0.30396355092701331433 = (4 - sqrt(12)) / (pi^2 ... ) — the
    published PROJ constant; x spans +-~pi at the equator."""

    C_x, C_y = 1.89490, 0.94745
    A, B = -0.5, 0.30396355092701331433


class PutninsP3(_SimplePseudoCylindrical):
    """putp3 / putp3p (Putnins P3 and P3'; mproj pj_putp3):
        x = C lam (1 - A phi^2),  y = C phi
    with C = sqrt(2/pi) = 0.79788456 and A = (4 or 2) / pi^2 —
    4/pi^2 for putp3, halved for the prime variant."""

    C = 0.79788456
    RPISQ = 0.1013211836  # 1 / pi^2

    def __init__(self, a, prime=False, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0=lon0, x0=x0, y0=y0)
        self.A = (2.0 if prime else 4.0) * self.RPISQ

    def _fwd(self, lam, phi):
        return self.C * lam * (1.0 - self.A * phi * phi), self.C * phi

    def _inv(self, x, y):
        phi = y / self.C
        return x / (self.C * (1.0 - self.A * phi * phi)), phi


class PutninsP4P(_SimplePseudoCylindrical):
    """putp4p / weren (Putnins P4' and Werenskiold I; mproj pj_putp4p):
        phi' = asin(0.883883476 sin phi)
        x = C_x lam cos phi' / cos(phi'/3),  y = C_y sin(phi'/3)
    putp4p: C_x = 0.874038744, C_y = 3.883251825 (equal-area);
    weren:  C_x = 1,           C_y = 4.442882938 (same graticule,
    rescaled). Closed inverse (the reference's s_inv)."""

    K = 0.883883476

    def __init__(self, a, c_x, c_y, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0=lon0, x0=x0, y0=y0)
        self.C_x, self.C_y = c_x, c_y

    def _fwd(self, lam, phi):
        ph = np.arcsin(np.clip(self.K * np.sin(phi), -1.0, 1.0))
        x = self.C_x * lam * np.cos(ph) / np.cos(ph / 3.0)
        return x, self.C_y * np.sin(ph / 3.0)

    def _inv(self, x, y):
        t = np.arcsin(np.clip(y / self.C_y, -1.0, 1.0))
        lam = x * np.cos(t) / self.C_x
        ph = 3.0 * t
        lam = lam / np.cos(ph)
        phi = np.arcsin(np.clip(np.sin(ph) / self.K, -1.0, 1.0))
        return lam, phi


class PutninsP5(_SimplePseudoCylindrical):
    """putp5 / putp5p (Putnins P5 and P5'; mproj pj_putp5):
        x = C lam (A - B sqrt(1 + D phi^2)),  y = C phi
    C = 1.01346, D = 1.2158542; A,B = 2,1 (P5) or 1.5,0.5 (P5')."""

    C, D = 1.01346, 1.2158542

    def __init__(self, a, prime=False, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0=lon0, x0=x0, y0=y0)
        self.A, self.B = (1.5, 0.5) if prime else (2.0, 1.0)

    def _fwd(self, lam, phi):
        s = np.sqrt(1.0 + self.D * phi * phi)
        return self.C * lam * (self.A - self.B * s), self.C * phi

    def _inv(self, x, y):
        phi = y / self.C
        s = np.sqrt(1.0 + self.D * phi * phi)
        return x / (self.C * (self.A - self.B * s)), phi


class PutninsP6(_SimplePseudoCylindrical):
    """putp6 / putp6p (Putnins P6 and P6'; mproj pj_putp6): theta solves
        (A - r) theta - ln(theta + r) = B sin phi,  r = sqrt(1 + theta^2)
    by Newton from theta0 = 1.10265779 phi (derivative A - 2r); then
        x = C_x lam (D - r),  y = C_y theta.
    P6: C_x 1.01346, C_y 0.91910, A 4, B 2.1471437182129378784, D 2;
    P6': C_x 0.44329, C_y 0.80404, A 6, B 5.61125, D 3."""

    CON_POLE = 1.732050807568877

    def __init__(self, a, prime=False, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0=lon0, x0=x0, y0=y0)
        if prime:
            self.C_x, self.C_y, self.A, self.B, self.D = \
                0.44329, 0.80404, 6.0, 5.61125, 3.0
        else:
            self.C_x, self.C_y, self.A, self.B, self.D = \
                1.01346, 0.91910, 4.0, 2.1471437182129378784, 2.0

    def _theta(self, phi):
        p = self.B * np.sin(phi)
        th = 1.10265779 * np.asarray(phi, dtype=np.float64)
        ok = np.zeros_like(th, dtype=bool)
        for _ in range(10):
            r = np.sqrt(1.0 + th * th)
            v = ((self.A - r) * th - np.log(th + r) - p) / (self.A - 2.0 * r)
            th = th - v
            ok = ok | (np.abs(v) < 1e-10)
            if np.all(ok):
                break
        # non-converged points are pinned at the pole, like the reference
        return np.where(ok, th, np.where(p < 0, -self.CON_POLE,
                                         self.CON_POLE))

    def _fwd(self, lam, phi):
        th = self._theta(phi)
        r = np.sqrt(1.0 + th * th)
        return self.C_x * lam * (self.D - r), self.C_y * th

    def _inv(self, x, y):
        th = y / self.C_y
        r = np.sqrt(1.0 + th * th)
        lam = x / (self.C_x * (self.D - r))
        phi = np.arcsin(np.clip(
            ((self.A - r) * th - np.log(th + r)) / self.B, -1.0, 1.0))
        return lam, phi


class UrmaevV(_SimplePseudoCylindrical):
    """urm5 (Urmaev V; mproj pj_urm5 — forward only, like the reference):
    requires n (0 < n <= 1), q and alpha parameters;
        phi' = asin(n sin phi),  m = cos(alpha)/sqrt(1 - n^2 sin^2 alpha)
        x = m lam cos phi',  y = phi' (1 + phi'^2 q/3) / (m n)."""

    has_inverse = False

    def __init__(self, a, n, q, alpha, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0=lon0, x0=x0, y0=y0)
        if not 0.0 < n <= 1.0:
            raise ValueError("urm5 requires 0 < n <= 1")
        self.n, self.q3 = n, q / 3.0
        t = n * math.sin(alpha)
        self.m = math.cos(alpha) / math.sqrt(1.0 - t * t)
        self.rmn = 1.0 / (self.m * self.n)

    def _fwd(self, lam, phi):
        ph = np.arcsin(np.clip(self.n * np.sin(phi), -1.0, 1.0))
        x = self.m * lam * np.cos(ph)
        y = ph * (1.0 + ph * ph * self.q3) * self.rmn
        return x, y


class WinkelII(_SimplePseudoCylindrical):
    """wink2 (Winkel II; mproj pj_wink2 — forward only): the x-average of
    equirectangular(lat_1) and a Mollweide-like ordinate; theta solves
    theta + sin theta = pi sin phi by Newton from 1.8 phi, halved."""

    has_inverse = False

    def __init__(self, a, lat1=0.0, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0=lon0, x0=x0, y0=y0)
        self.cosphi1 = math.cos(lat1 * D2R)

    def _fwd(self, lam, phi):
        y0 = phi * (2.0 / math.pi)
        k = math.pi * np.sin(phi)
        th = 1.8 * np.asarray(phi, dtype=np.float64)
        ok = np.zeros_like(th, dtype=bool)
        for _ in range(10):
            v = (th + np.sin(th) - k) / (1.0 + np.cos(th))
            th = th - v
            ok = ok | (np.abs(v) < 1e-7)
            if np.all(ok):
                break
        th = np.where(ok, 0.5 * th,
                      np.where(th < 0, -HALFPI, HALFPI))
        x = 0.5 * lam * (np.cos(th) + self.cosphi1)
        y = (math.pi / 4.0) * (np.sin(th) + y0)
        return x, y


class Denoyer(_SimplePseudoCylindrical):
    """denoy (Denoyer semi-elliptical; mproj pj_denoy — forward only):
        x = lam cos((C0 + |lam|(C1 + lam^2 C3)) phi (D1 + D5 phi^4))
        y = phi."""

    has_inverse = False
    C0, C1, C3 = 0.95, -1.0 / 12.0, 1.0 / 600.0
    D1, D5 = 0.9, 0.03

    def _fwd(self, lam, phi):
        al = np.abs(lam)
        scale = ((self.C0 + al * (self.C1 + al * al * self.C3)) *
                 (phi * (self.D1 + self.D5 * phi ** 4)))
        return lam * np.cos(scale), phi


class NaturalEarth2(_SimplePseudoCylindrical):
    """natearth2 (Natural Earth II; mproj pj_natearth2, Savric & Jenny
    polynomial): x = lam (A0 + A1 p2 + p12 (A2 + A3 p2 + A4 p4 + A5 p6)),
    y = phi (B0 + p8 (B1 + B2 p2 + B3 p4)); inverse by Newton on y."""

    A = (0.84719, -0.13063, -0.04515, 0.05494, -0.02326, 0.00331)
    B = (1.01183, -0.02625, 0.01926, -0.00396)
    MAX_Y = 0.84719 * 0.535117535153096 * math.pi

    def _xscale(self, phi2, phi4, phi6):
        A0, A1, A2, A3, A4, A5 = self.A
        return (A0 + A1 * phi2 +
                phi6 * phi6 * (A2 + A3 * phi2 + A4 * phi4 + A5 * phi6))

    def _fwd(self, lam, phi):
        p2 = phi * phi
        p4 = p2 * p2
        p6 = p2 * p4
        B0, B1, B2, B3 = self.B
        y = phi * (B0 + p4 * p4 * (B1 + B2 * p2 + B3 * p4))
        return lam * self._xscale(p2, p4, p6), y

    def _inv(self, x, y):
        B0, B1, B2, B3 = self.B
        C0, C1, C2, C3 = B0, 9.0 * B1, 11.0 * B2, 13.0 * B3
        y = np.clip(y, -self.MAX_Y, self.MAX_Y)
        yc = np.asarray(y, dtype=np.float64).copy()
        for _ in range(30):
            y2 = yc * yc
            y4 = y2 * y2
            f = yc * (B0 + y4 * y4 * (B1 + B2 * y2 + B3 * y4)) - y
            fder = C0 + y4 * y4 * (C1 + C2 * y2 + C3 * y4)
            tol = f / fder
            yc = yc - tol
            if np.all(np.abs(tol) < 1e-11):
                break
        p2 = yc * yc
        p4 = p2 * p2
        p6 = p2 * p4
        return x / self._xscale(p2, p4, p6), yc


class Airy(_SimplePseudoCylindrical):
    """airy (Airy minimum-error azimuthal; mproj pj_airy — forward only):
    K_rho = -ln((1+cos z)/2)/(1-cos z) - C_b (1+cos z)/2 with
    C_b from lat_b (beta = (pi/2 - lat_b)/2; C_b = ln(cos beta)/tan^2 beta,
    or -1/2 when beta ~ 0); polar/equatorial/oblique aspects like the
    azimuthal family. Points past the horizon raise unless +no_cut."""

    has_inverse = False

    def __init__(self, a, lat0=0.0, lat_b=90.0, no_cut=False,
                 lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0=lon0, x0=x0, y0=y0)
        self.no_cut = no_cut
        beta = 0.5 * (HALFPI - lat_b * D2R)
        if abs(beta) < 1e-10:
            self.Cb = -0.5
        else:
            t = 1.0 / math.tan(beta)
            self.Cb = t * t * math.log(math.cos(beta))
        phi0 = lat0 * D2R
        if abs(abs(phi0) - HALFPI) < 1e-10:
            self.mode = "s_pole" if phi0 < 0 else "n_pole"
        elif abs(phi0) < 1e-10:
            self.mode = "equit"
        else:
            self.mode = "obliq"
            self.sinph0, self.cosph0 = math.sin(phi0), math.cos(phi0)

    def _fwd(self, lam, phi):
        EPS = 1e-10
        sinlam, coslam = np.sin(lam), np.cos(lam)
        if self.mode in ("equit", "obliq"):
            sinphi, cosphi = np.sin(phi), np.cos(phi)
            cosz = cosphi * coslam
            if self.mode == "obliq":
                cosz = self.sinph0 * sinphi + self.cosph0 * cosz
            if not self.no_cut and np.any(cosz < -EPS):
                raise ValueError("airy: point past the horizon (+no_cut "
                                 "to allow)")
            s = 1.0 - cosz
            t = 0.5 * (1.0 + cosz)
            with np.errstate(divide="ignore", invalid="ignore"):
                krho = np.where(np.abs(s) > EPS,
                                -np.log(t) / np.where(s == 0, 1.0, s)
                                - self.Cb / np.where(t == 0, 1.0, t),
                                0.5 - self.Cb)
            x = krho * cosphi * sinlam
            if self.mode == "obliq":
                y = krho * (self.cosph0 * sinphi -
                            self.sinph0 * cosphi * coslam)
            else:
                y = krho * sinphi
            return x, y
        # polar aspects
        ph = np.abs((HALFPI if self.mode == "n_pole" else -HALFPI) - phi)
        if not self.no_cut and np.any(ph - EPS > HALFPI):
            raise ValueError("airy: point past the horizon (+no_cut to "
                             "allow)")
        half = 0.5 * ph
        t = np.tan(half)
        with np.errstate(divide="ignore", invalid="ignore"):
            krho = np.where(half > EPS,
                            -2.0 * (np.log(np.cos(half)) /
                                    np.where(t == 0, 1.0, t)
                                    + t * self.Cb),
                            0.0)
        x = krho * sinlam
        y = krho * coslam
        if self.mode == "n_pole":
            y = -y
        return x, y


class Gilbert(Projection):
    """gilbert (Gilbert two-world globe; mproj pj_gilbert — forward only,
    spherical): phi' = asin(tan(phi/2)), lam' = lam/2, then orthographic
    onto the hemisphere centred at (0, lat_1')."""

    has_inverse = False

    def __init__(self, a, lat1=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0
        p1 = math.asin(max(-1.0, min(1.0, math.tan(0.5 * lat1 * D2R))))
        self.sp1, self.cp1 = math.sin(p1), math.cos(p1)

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R * 0.5
        phi = np.arcsin(np.clip(
            np.tan(0.5 * np.asarray(lat, dtype=np.float64) * D2R),
            -1.0, 1.0))
        sp, cp = np.sin(phi), np.cos(phi)
        cl = np.cos(lam)
        if np.any(self.sp1 * sp + self.cp1 * cp * cl < 0):
            raise ValueError("gilbert: point on the far hemisphere")
        x = cp * np.sin(lam)
        y = self.cp1 * sp - self.sp1 * cp * cl
        return self.a * x + self.x0, self.a * y + self.y0


class VanDerGrinten2(_SimplePseudoCylindrical):
    """vandg2 / vandg3 (Van der Grinten II and III; mproj pj_vandg2 —
    forward only): circular-arc constructions on the vandg frame,
        b = |2 phi / pi|, c = sqrt(1 - b^2), A = |pi/lam - lam/pi| / 2;
    II: x1 = (c sqrt(1+A^2) - A c^2)/(1 + A^2 b^2), y = sqrt(1 - x1(x1+2A));
    III: x1 = b/(1+c), x = sqrt(A^2 + 1 - x1^2) - A, y = pi x1."""

    has_inverse = False

    def __init__(self, a, vdg3=False, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0=lon0, x0=x0, y0=y0)
        self.vdg3 = vdg3

    def _fwd(self, lam, phi):
        TOL = 1e-10
        bt = np.abs((2.0 / math.pi) * phi)
        ct = np.sqrt(np.clip(1.0 - bt * bt, 0.0, None))
        small_lam = np.abs(lam) < TOL
        safe_lam = np.where(small_lam, 1.0, lam)
        at = 0.5 * np.abs(math.pi / safe_lam - safe_lam / math.pi)
        if self.vdg3:
            x1 = bt / (1.0 + ct)
            x = math.pi * (np.sqrt(np.clip(at * at + 1.0 - x1 * x1,
                                           0.0, None)) - at)
            y = math.pi * x1
        else:
            x1 = (ct * np.sqrt(1.0 + at * at) - at * ct * ct) / \
                (1.0 + at * at * bt * bt)
            x = math.pi * x1
            y = math.pi * np.sqrt(np.clip(1.0 - x1 * (x1 + 2.0 * at),
                                          0.0, None) + TOL)
        # the lam ~ 0 central-meridian limit
        x = np.where(small_lam, 0.0, x)
        y = np.where(small_lam,
                     math.pi * np.where(phi < 0, -bt, bt) / (1.0 + ct), y)
        x = np.where(lam < 0, -np.abs(x), np.abs(x))
        y = np.where(phi < 0, -np.abs(y), np.abs(y))
        return x, y


class VanDerGrinten4(_SimplePseudoCylindrical):
    """vandg4 (Van der Grinten IV; mproj pj_vandg4 — forward only):
    the two-circle-arc construction (Snyder Album p. 205)."""

    has_inverse = False

    def _fwd(self, lam, phi):
        TOL = 1e-10
        lam = np.asarray(lam, dtype=np.float64)
        phi = np.asarray(phi, dtype=np.float64)
        x = np.zeros_like(lam)
        y = np.zeros_like(lam)
        eq = np.abs(phi) < TOL
        cm = (~eq) & ((np.abs(lam) < TOL) |
                      (np.abs(np.abs(phi) - HALFPI) < TOL))
        gen = ~(eq | cm)
        x[eq] = lam[eq]
        y[cm] = phi[cm]
        if np.any(gen):
            lm, ph = lam[gen], phi[gen]
            bt = np.abs((2.0 / math.pi) * ph)
            bt2 = bt * bt
            ct = 0.5 * (bt * (8.0 - bt * (2.0 + bt2)) - 5.0) / \
                (bt2 * (bt - 1.0))
            ct2 = ct * ct
            dt = (2.0 / math.pi) * lm
            dt = dt + 1.0 / dt
            dt = np.sqrt(np.clip(dt * dt - 4.0, 0.0, None))
            dt = np.where(np.abs(lm) - HALFPI < 0, -dt, dt)
            dt2 = dt * dt
            x1 = (bt + ct) ** 2
            t = bt + 3.0 * ct
            ft = x1 * (bt2 + ct2 * dt2 - 1.0) + (1.0 - bt2) * (
                bt2 * (t * t + 4.0 * ct2) + ct2 * (12.0 * bt * ct +
                                                   4.0 * ct2))
            x1 = (dt * (x1 + ct2 - 1.0) +
                  2.0 * np.sqrt(np.clip(ft, 0.0, None))) / \
                (4.0 * x1 + dt2)
            xg = HALFPI * x1
            yg = HALFPI * np.sqrt(np.clip(
                1.0 + dt * np.abs(x1) - x1 * x1, 0.0, None))
            xg = np.where(lm < 0, -xg, xg)
            yg = np.where(ph < 0, -yg, yg)
            x[gen], y[gen] = xg, yg
        return x, y


class ObliqueCylindricalEqualArea(Projection):
    """ocea (Oblique Cylindrical Equal Area; mproj pj_ocea, Snyder
    pp. 76-80): pole of rotation from two points (lat_1,lon_1),
    (lat_2,lon_2) (eqs. 9-1, 9-2) or one point + azimuth (+lonc +alpha,
    eqs. 9-7, 9-8); then x = k0 atan2-like arc, y = (1/k0)(sin-distance
    from the oblique equator). Spherical, closed inverse."""

    def __init__(self, a, k0=1.0, lat1=None, lat2=None, lon1=None,
                 lon2=None, lonc=None, alpha=None, lon0=0.0,
                 x0=0.0, y0=0.0):
        self.a, self.x0, self.y0 = a, x0, y0
        self.rok, self.rtk = 1.0 / k0, k0
        phi_0 = 0.0
        if alpha is not None:
            al, lz = alpha * D2R, (lonc or 0.0) * D2R
            num = -math.cos(al)
            den = -math.sin(phi_0) * math.sin(al)
            if den == 0.0:
                # phi_0 is pinned to 0 (like the reference), so this is
                # the usual branch: IEEE x/±0 = ±inf, atan(±inf) = ±pi/2
                # (the reference's JS evaluates exactly this way)
                singam = math.copysign(HALFPI,
                                       num * math.copysign(1.0, den)) + lz
            else:
                singam = math.atan(num / den) + lz
            sinphi = math.asin(math.cos(phi_0) * math.sin(al))
        else:
            p1, p2 = lat1 * D2R, lat2 * D2R
            l1, l2 = lon1 * D2R, lon2 * D2R
            singam = math.atan2(
                math.cos(p1) * math.sin(p2) * math.cos(l1) -
                math.sin(p1) * math.cos(p2) * math.cos(l2),
                math.sin(p1) * math.cos(p2) * math.sin(l2) -
                math.cos(p1) * math.sin(p2) * math.sin(l1))
            if l1 == -HALFPI:
                singam = -singam
            sinphi = math.atan(-math.cos(singam - l1) / math.tan(p1))
        self.lam0 = singam + HALFPI
        self.cosphi, self.sinphi = math.cos(sinphi), math.sin(sinphi)

    def fwd(self, lng, lat):
        lam = np.asarray(lng, dtype=np.float64) * D2R - self.lam0
        phi = np.asarray(lat, dtype=np.float64) * D2R
        s = np.sin(lam)
        t = np.cos(lam)
        x = np.arctan((np.tan(phi) * self.cosphi + self.sinphi * s) / t)
        x = np.where(t < 0, x + math.pi, x) * self.rtk
        y = self.rok * (self.sinphi * np.sin(phi) -
                        self.cosphi * np.cos(phi) * s)
        return self.a * x + self.x0, self.a * y + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a / \
            self.rtk
        yr = (np.asarray(y, dtype=np.float64) - self.y0) / self.a / \
            self.rok
        t = np.sqrt(np.clip(1.0 - yr * yr, 0.0, None))
        s = np.sin(xr)
        phi = np.arcsin(np.clip(yr * self.sinphi + t * self.cosphi * s,
                                -1.0, 1.0))
        lam = np.arctan2(t * self.sinphi * s - yr * self.cosphi,
                         t * np.cos(xr))
        lng = (lam + self.lam0) / D2R
        # normalize into [-180, 180) — lam0 = gamma + pi/2 routinely
        # pushes the sum past the antimeridian
        return (lng + 180.0) % 360.0 - 180.0, phi / D2R


class ModifiedStereographic(Projection):
    """mil_os / lee_os / gs48 / alsk / gs50 (mproj pj_mod_ster family):
    oblique stereographic of the conformal sphere followed by the complex
    polynomial w = z (C0 + C1 z + ... + Cn z^n) whose published
    coefficients minimize regional distortion (Miller Oblated, Lee
    Oblated, and the USGS 48-/Alaska-/50-state variants). Forward is a
    closed complex Horner; inverse is complex Newton on f(z) = w then the
    inverse conformal-latitude iteration — both Arrow-vectorizable as
    numpy complex kernels."""

    def __init__(self, a, es, coefs, lam0_deg, phi0_deg, x0=0.0, y0=0.0):
        self.a, self.es, self.e = a, es, math.sqrt(es)
        self.lam0, self.phi0 = lam0_deg * D2R, phi0_deg * D2R
        self.x0, self.y0 = x0, y0
        self.C = np.array([complex(r, i) for r, i in coefs])
        chio = self._chi(np.float64(self.phi0)) if es != 0.0 else self.phi0
        self.schio, self.cchio = math.sin(float(chio)), math.cos(float(chio))

    def _chi(self, phi):
        # conformal latitude
        if self.es == 0.0:
            return phi
        esphi = self.e * np.sin(phi)
        return 2.0 * np.arctan(
            np.tan((HALFPI + phi) * 0.5) *
            ((1.0 - esphi) / (1.0 + esphi)) ** (self.e * 0.5)) - HALFPI

    def _poly(self, z):
        # P(z) and P'(z) by complex Horner
        p = np.full_like(z, self.C[-1])
        dp = np.zeros_like(z)
        for c in self.C[-2::-1]:
            dp = dp * z + p
            p = p * z + c
        return p, dp

    def _f(self, z):
        # f(z) = z P(z); f'(z) = P(z) + z P'(z)
        p, dp = self._poly(z)
        return z * p, p + z * dp

    def fwd(self, lng, lat):
        lam = np.asarray(lng, dtype=np.float64) * D2R - self.lam0
        phi = np.asarray(lat, dtype=np.float64) * D2R
        chi = self._chi(phi)
        schi, cchi = np.sin(chi), np.cos(chi)
        coslon, sinlon = np.cos(lam), np.sin(lam)
        s = 2.0 / (1.0 + self.schio * schi + self.cchio * cchi * coslon)
        z = (s * cchi * sinlon +
             1j * s * (self.cchio * schi - self.schio * cchi * coslon))
        w, _ = self._f(z)
        return self.a * w.real + self.x0, self.a * w.imag + self.y0

    def inv(self, x, y):
        w = ((np.asarray(x, dtype=np.float64) - self.x0) +
             1j * (np.asarray(y, dtype=np.float64) - self.y0)) / self.a
        z = w.copy()
        for _ in range(20):
            f, fp = self._f(z)
            dz = (f - w) / fp
            z = z - dz
            if np.all(np.abs(dz.real) + np.abs(dz.imag) <= 1e-12):
                break
        rh = np.abs(z)
        zz = 2.0 * np.arctan(0.5 * rh)
        sinz, cosz = np.sin(zz), np.cos(zz)
        rh_safe = np.where(rh <= 1e-12, 1.0, rh)
        chi = np.arcsin(np.clip(
            cosz * self.schio + z.imag * sinz * self.cchio / rh_safe,
            -1.0, 1.0))
        phi = chi.copy()
        if self.es != 0.0:
            for _ in range(20):
                esphi = self.e * np.sin(phi)
                dphi = (2.0 * np.arctan(
                    np.tan((HALFPI + chi) * 0.5) *
                    ((1.0 + esphi) / (1.0 - esphi)) ** (self.e * 0.5))
                    - HALFPI - phi)
                phi = phi + dphi
                if np.all(np.abs(dphi) <= 1e-12):
                    break
        lam = np.arctan2(z.real * sinz,
                         rh_safe * self.cchio * cosz -
                         z.imag * self.schio * sinz)
        # the (0,0) center maps back to the projection origin exactly
        lam = np.where(rh <= 1e-12, 0.0, lam)
        phi = np.where(rh <= 1e-12, self.phi0, phi)
        return (lam + self.lam0) / D2R, phi / D2R


# published pj_mod_ster coefficient tables (PROJ / mproj):
#   (coefs, lam0 deg, phi0 deg, spherical-only?)
_MOD_STER = {
    "mil_os": ([(0.924500, 0.0), (0.0, 0.0), (0.019430, 0.0)], 20.0, 18.0),
    "lee_os": ([(0.721316, 0.0), (0.0, 0.0),
                (-0.0088162, -0.00617325)], -165.0, -10.0),
    "gs48": ([(0.98879, 0.0), (0.0, 0.0), (-0.050909, 0.0), (0.0, 0.0),
              (0.075528, 0.0)], -96.0, 39.0),
}
_ALSK_ELL = [(0.9945303, 0.0), (0.0052083, -0.0027404),
             (0.0072721, 0.0048181), (-0.0151089, -0.1932526),
             (0.0642675, -0.1381226), (0.3582802, -0.2884586)]
_ALSK_SPH = [(0.9972523, 0.0), (0.0052513, -0.0041175),
             (0.0074606, 0.0048125), (-0.0153783, -0.1968253),
             (0.0636871, -0.1408027), (0.3660976, -0.2937382)]
_GS50_ELL = [(0.9827497, 0.0), (0.0210669, 0.0053804),
             (-0.1031415, -0.0571664), (-0.0323337, -0.0322847),
             (0.0502303, 0.1211983), (0.0251805, 0.0895678),
             (-0.0012315, -0.1416121), (0.0072202, -0.1317091),
             (-0.0194029, 0.0759677), (-0.0210072, 0.0834037)]
_GS50_SPH = [(0.9842990, 0.0), (0.0211642, 0.0037608),
             (-0.1036018, -0.0575102), (-0.0329095, -0.0320119),
             (0.0499471, 0.1223335), (0.0260460, 0.0899805),
             (0.0007388, -0.1435792), (0.0075848, -0.1334108),
             (-0.0216473, 0.0776645), (-0.0225161, 0.0853673)]


class Ginsburg8(_SimplePseudoCylindrical):
    """gins8 (Ginsburg VIII / TsNIIGAiK 1944; mproj pj_gins8 — forward
    only): x = lam (1 - 0.162388 phi^2)(0.87 - 0.000952426 lam^4),
    y = phi (1 + phi^2/12)."""

    has_inverse = False

    def _fwd(self, lam, phi):
        t = phi * phi
        y = phi * (1.0 + t / 12.0)
        x = lam * (1.0 - 0.162388 * t)
        x = x * (0.87 - 0.000952426 * lam ** 4)
        return x, y


def _authset(es):
    # PROJ pj_authset: series coefficients for the inverse authalic lat
    P00, P01, P02 = 1.0 / 3.0, 31.0 / 180.0, 517.0 / 5040.0
    P10, P11 = 23.0 / 360.0, 251.0 / 3780.0
    P20 = 761.0 / 45360.0
    t = es * es
    return (es * P00 + t * P01 + t * es * P02,
            t * P10 + t * es * P11,
            t * es * P20)


class Healpix(Projection):
    """healpix / rhealpix (mproj pj_healpix, after Calabretta & Roukema
    2007 and Gibb et al.): equatorial Lambert-cylindrical band with four
    polar triangles (interrupted Collignon); rHEALPix reassembles the
    polar caps into two squares selected by +north_square/+south_square.
    Ellipsoids go through the authalic latitude (equal-area exact)."""

    FORTPI = math.pi / 4.0

    def __init__(self, a, es, rhealpix=False, north_square=0,
                 south_square=0, lon0=0.0, x0=0.0, y0=0.0):
        self.es, self.e = es, math.sqrt(es)
        self.rhealpix = rhealpix
        self.ns, self.ss = north_square, south_square
        if rhealpix and not (0 <= north_square <= 3 and
                             0 <= south_square <= 3):
            raise ValueError("rhealpix: north_square/south_square in 0..3")
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        if es != 0.0:
            self.apa = _authset(es)
            self.qp = float(_qsfn(np.float64(1.0), self.e, es))
            self.a = a * math.sqrt(0.5 * self.qp)  # authalic radius
        else:
            self.a = a

    # --- authalic latitude ---------------------------------------------
    def _auth_fwd(self, phi):
        q = _qsfn(np.sin(phi), self.e, self.es)
        return np.arcsin(np.clip(q / self.qp, -1.0, 1.0))

    def _auth_inv(self, beta):
        a0, a1, a2 = self.apa
        return (beta + a0 * np.sin(2.0 * beta) + a1 * np.sin(4.0 * beta) +
                a2 * np.sin(6.0 * beta))

    # --- spherical HEALPix kernel --------------------------------------
    def _sphere_fwd(self, lam, phi):
        phi0 = math.asin(2.0 / 3.0)
        sig = np.sqrt(3.0 * (1.0 - np.abs(np.sin(phi))))
        cn = np.clip(np.floor(2.0 * lam / math.pi + 2.0), None, 3.0)
        lamc = -3.0 * self.FORTPI + HALFPI * cn
        xp = lamc + (lam - lamc) * sig
        yp = np.sign(phi) * self.FORTPI * (2.0 - sig)
        eq = np.abs(phi) <= phi0
        x = np.where(eq, lam, xp)
        y = np.where(eq, 3.0 * math.pi / 8.0 * np.sin(phi), yp)
        return x, y

    def _sphere_inv(self, x, y):
        y0 = self.FORTPI
        cn = np.clip(np.floor(2.0 * x / math.pi + 2.0), None, 3.0)
        xc = -3.0 * self.FORTPI + HALFPI * cn
        tau = 2.0 - 4.0 * np.abs(y) / math.pi
        tau_safe = np.where(tau == 0.0, 1.0, tau)
        lam_p = xc + (x - xc) / tau_safe
        phi_p = np.sign(y) * np.arcsin(np.clip(1.0 - tau * tau / 3.0,
                                               -1.0, 1.0))
        eq = np.abs(y) <= y0
        pole = np.abs(y) >= HALFPI
        lam = np.where(eq, x, np.where(pole, -math.pi, lam_p))
        phi = np.where(eq, np.arcsin(np.clip(8.0 * y / (3.0 * math.pi),
                                             -1.0, 1.0)),
                       np.where(pole, np.sign(y) * HALFPI, phi_p))
        return lam, phi

    # --- rHEALPix cap reassembly ----------------------------------------
    _ROT = [np.array([[1.0, 0.0], [0.0, 1.0]]),    # 0
            np.array([[0.0, -1.0], [1.0, 0.0]]),   # 1  (R1)
            np.array([[-1.0, 0.0], [0.0, -1.0]]),  # 2  (R2)
            np.array([[0.0, 1.0], [-1.0, 0.0]])]   # 3  (R3); -k uses [4-k]

    def _combine_caps(self, x, y, inverse):
        # PROJ-correct cap reassembly: out = R (v - c) + a with
        # a = (-3pi/4 + (pole if fwd else cn) pi/2, +-pi/2 by region).
        # DEVIATION from the bundled mproj, whose transcription drops the
        # `pole` term and the south sign (modules.js:17270 adds
        # +M_HALFPI unconditionally, sending south caps to the north
        # square) — an upstream bug, not semantics worth reproducing.
        FP, HP = self.FORTPI, HALFPI
        EPS = 1e-15
        x = np.asarray(x, dtype=np.float64).copy()
        y = np.asarray(y, dtype=np.float64).copy()
        north = y > FP
        south = y < -FP
        for region, mask, square in (("north", north, self.ns),
                                     ("south", south, self.ss)):
            if not np.any(mask):
                continue
            xs, ys = x[mask], y[mask]
            c_pole = HP if region == "north" else -HP
            if not inverse:
                cn = np.select([xs < -HP, xs < 0.0, xs < HP],
                               [0.0, 1.0, 2.0], default=3.0)
                cx = -3.0 * FP + cn * HP
                k = (cn - square) if region == "north" else -(cn - square)
                ax = np.full_like(xs, -3.0 * FP + square * HP)
            else:
                cx = np.full_like(xs, -3.0 * FP + square * HP)
                xs_sh = xs - square * HP
                if region == "north":
                    cn = np.select(
                        [(ys >= -xs_sh - FP - EPS) &
                         (ys < xs_sh + 5 * FP - EPS),
                         (ys > -xs_sh - FP + EPS) &
                         (ys >= xs_sh + 5 * FP - EPS),
                         (ys <= -xs_sh - FP + EPS) &
                         (ys > xs_sh + 5 * FP + EPS)],
                        [(square + 1) % 4, (square + 2) % 4,
                         (square + 3) % 4],
                        default=square).astype(np.float64)
                    k = -(cn - square)
                else:
                    cn = np.select(
                        [(ys <= xs_sh + FP + EPS) &
                         (ys > -xs_sh - 5 * FP + EPS),
                         (ys < xs_sh + FP - EPS) &
                         (ys <= -xs_sh - 5 * FP + EPS),
                         (ys >= xs_sh + FP - EPS) &
                         (ys < -xs_sh - 5 * FP - EPS)],
                        [(square + 1) % 4, (square + 2) % 4,
                         (square + 3) % 4],
                        default=square).astype(np.float64)
                    k = cn - square
                ax = -3.0 * FP + cn * HP
            vx, vy = xs - cx, ys - c_pole
            rx = np.empty_like(vx)
            ry = np.empty_like(vy)
            kmod = np.mod(k, 4).astype(int) if not isinstance(k, float) \
                else np.full_like(vx, k % 4, dtype=int)
            for kk in range(4):
                m = kmod == kk
                if not np.any(m):
                    continue
                R = self._ROT[kk]
                rx[m] = R[0, 0] * vx[m] + R[0, 1] * vy[m]
                ry[m] = R[1, 0] * vx[m] + R[1, 1] * vy[m]
            x[mask] = rx + ax
            y[mask] = ry + c_pole
        return x, y

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        # adjlon: the piecewise polar form indexes facets by
        # floor(2*lam/pi + 2), which goes negative for un-wrapped lam
        # (e.g. +lon_0=170 with lon=-170 -> lam=-340 deg); every other
        # lon_0-shifting entry wraps, healpix must too
        lam = np.where((lam < -math.pi) | (lam >= math.pi),
                       ((lam + math.pi) % (2.0 * math.pi)) - math.pi, lam)
        phi = np.asarray(lat, dtype=np.float64) * D2R
        if self.es != 0.0:
            phi = self._auth_fwd(phi)
        x, y = self._sphere_fwd(lam, phi)
        if self.rhealpix:
            x, y = self._combine_caps(x, y, inverse=False)
        return self.a * x + self.x0, self.a * y + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        yr = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        if self.rhealpix:
            xr, yr = self._combine_caps(xr, yr, inverse=True)
        lam, phi = self._sphere_inv(xr, yr)
        if self.es != 0.0:
            phi = self._auth_inv(phi)
        return lam / D2R + self.lon0, phi / D2R


class QuadrilateralizedSphericalCube(Projection):
    """qsc (Quadrilateralized Spherical Cube; mproj pj_qsc after O'Neill &
    Laubscher 1976, ellipsoid shift per Lambers & Kolb 2012): one cube
    face per projection instance, chosen from (lat_0, lon_0); each face
    splits into four areas handled with vectorized selects."""

    FORTPI = math.pi / 4.0
    (FRONT, RIGHT, BACK, LEFT, TOP, BOTTOM) = range(6)

    def __init__(self, a, es, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.es = a, es
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        phi0, lam0 = lat0 * D2R, lon0 * D2R
        if phi0 >= HALFPI - self.FORTPI / 2.0:
            self.face = self.TOP
        elif phi0 <= -(HALFPI - self.FORTPI / 2.0):
            self.face = self.BOTTOM
        elif abs(lam0) <= self.FORTPI:
            self.face = self.FRONT
        elif abs(lam0) <= HALFPI + self.FORTPI:
            self.face = self.RIGHT if lam0 > 0.0 else self.LEFT
        else:
            self.face = self.BACK
        if es != 0.0:
            b = a * math.sqrt(1.0 - es)
            self.one_minus_f = 1.0 - (a - b) / a
            self.one_minus_f_sq = self.one_minus_f ** 2
            self.b = b

    @staticmethod
    def _shift_lon(lon, offset):
        s = lon + offset
        return np.where(s < -math.pi, s + 2.0 * math.pi,
                        np.where(s > math.pi, s - 2.0 * math.pi, s))

    def _equat_theta_area(self, phi_c, yy, xx):
        # qsc_fwd_equat_face_theta, vectorized
        FP = self.FORTPI
        th = np.arctan2(yy, xx)
        area = np.select(
            [np.abs(th) <= FP,
             (th > FP) & (th <= HALFPI + FP),
             (th > HALFPI + FP) | (th <= -(HALFPI + FP))],
            [0, 1, 2], default=3)
        th = np.select(
            [area == 0, area == 1, area == 2],
            [th, th - HALFPI,
             np.where(th >= 0.0, th - math.pi, th + math.pi)],
            default=th + HALFPI)
        zero = phi_c < 1e-10
        return np.where(zero, 0.0, th), np.where(zero, 0, area)

    def fwd(self, lng, lat):
        FP = self.FORTPI
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        lam = (lam + math.pi) % (2.0 * math.pi) - math.pi
        phi = np.asarray(lat, dtype=np.float64) * D2R
        if self.es != 0.0:
            phi = np.arctan(self.one_minus_f_sq * np.tan(phi))
        if self.face == self.TOP:
            phi_c = HALFPI - phi
            area = np.select(
                [(lam >= FP) & (lam <= HALFPI + FP),
                 (lam > HALFPI + FP) | (lam <= -(HALFPI + FP)),
                 (lam > -(HALFPI + FP)) & (lam <= -FP)],
                [0, 1, 2], default=3)
            theta = np.select(
                [area == 0, area == 1, area == 2],
                [lam - HALFPI,
                 np.where(lam > 0.0, lam - math.pi, lam + math.pi),
                 lam + HALFPI], default=lam)
        elif self.face == self.BOTTOM:
            phi_c = HALFPI + phi
            area = np.select(
                [(lam >= FP) & (lam <= HALFPI + FP),
                 (lam < FP) & (lam >= -FP),
                 (lam < -FP) & (lam >= -(HALFPI + FP))],
                [0, 1, 2], default=3)
            theta = np.select(
                [area == 0, area == 1, area == 2],
                [-lam + HALFPI, -lam, -lam - HALFPI],
                default=np.where(lam > 0.0, -lam + math.pi,
                                 -lam - math.pi))
        else:
            if self.face == self.RIGHT:
                lam = self._shift_lon(lam, HALFPI)
            elif self.face == self.BACK:
                lam = self._shift_lon(lam, math.pi)
            elif self.face == self.LEFT:
                lam = self._shift_lon(lam, -HALFPI)
            sinlat, coslat = np.sin(phi), np.cos(phi)
            sinlon, coslon = np.sin(lam), np.cos(lam)
            q = coslat * coslon
            r = coslat * sinlon
            s = sinlat
            if self.face == self.FRONT:
                phi_c = np.arccos(np.clip(q, -1.0, 1.0))
                theta, area = self._equat_theta_area(phi_c, s, r)
            elif self.face == self.RIGHT:
                phi_c = np.arccos(np.clip(r, -1.0, 1.0))
                theta, area = self._equat_theta_area(phi_c, s, -q)
            elif self.face == self.BACK:
                phi_c = np.arccos(np.clip(-q, -1.0, 1.0))
                theta, area = self._equat_theta_area(phi_c, s, -r)
            else:  # LEFT
                phi_c = np.arccos(np.clip(-r, -1.0, 1.0))
                theta, area = self._equat_theta_area(phi_c, s, q)
        # O'Neill-Laubscher eq. 3-21 / 3-38
        mu = np.arctan((12.0 / math.pi) *
                       (theta + np.arccos(np.clip(
                           np.sin(theta) * math.cos(FP), -1.0, 1.0))
                        - HALFPI))
        denom = (np.cos(mu) ** 2 *
                 (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))))
        t = np.sqrt(np.clip((1.0 - np.cos(phi_c)) /
                            np.where(denom == 0.0, 1.0, denom), 0.0, None))
        mu = mu + np.select([area == 1, area == 2, area == 3],
                            [HALFPI, math.pi, 3.0 * HALFPI], default=0.0)
        return (self.a * t * np.cos(mu) + self.x0,
                self.a * t * np.sin(mu) + self.y0)

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        yr = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        nu = np.arctan(np.hypot(xr, yr))
        mu = np.arctan2(yr, xr)
        area = np.select(
            [(xr >= 0.0) & (xr >= np.abs(yr)),
             (yr >= 0.0) & (yr >= np.abs(xr)),
             (xr < 0.0) & (-xr >= np.abs(yr))],
            [0, 1, 2], default=3)
        mu = np.select(
            [area == 0, area == 1, area == 2],
            [mu, mu - HALFPI,
             np.where(mu < 0.0, mu + math.pi, mu - math.pi)],
            default=mu + HALFPI)
        t = (math.pi / 12.0) * np.tan(mu)
        theta = np.arctan(np.sin(t) / (np.cos(t) - 1.0 / math.sqrt(2.0)))
        cosphi = 1.0 - (np.cos(mu) ** 2 * np.tan(nu) ** 2 *
                        (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))))
        cosphi = np.clip(cosphi, -1.0, 1.0)
        if self.face == self.TOP:
            phi_c = np.arccos(cosphi)
            phi = HALFPI - phi_c
            lam = np.select(
                [area == 0, area == 1, area == 2],
                [theta + HALFPI,
                 np.where(theta < 0.0, theta + math.pi, theta - math.pi),
                 theta - HALFPI], default=theta)
        elif self.face == self.BOTTOM:
            phi_c = np.arccos(cosphi)
            phi = phi_c - HALFPI
            lam = np.select(
                [area == 0, area == 1, area == 2],
                [-theta + HALFPI, -theta, -theta - HALFPI],
                default=np.where(theta < 0.0, -theta - math.pi,
                                 -theta + math.pi))
        else:
            q = cosphi
            tt = q * q
            s = np.where(tt >= 1.0, 0.0,
                         np.sqrt(np.clip(1.0 - tt, 0.0, None)) *
                         np.sin(theta))
            tt = tt + s * s
            r = np.where(tt >= 1.0, 0.0,
                         np.sqrt(np.clip(1.0 - tt, 0.0, None)))
            # rotate (q, r, s) into the correct area
            r, s = (np.select([area == 1, area == 2, area == 3],
                              [-s, -r, s], default=r),
                    np.select([area == 1, area == 2, area == 3],
                              [r, -s, -r], default=s))
            # rotate into the correct cube face
            if self.face == self.RIGHT:
                q, r = -r, q
            elif self.face == self.BACK:
                q, r = -q, -r
            elif self.face == self.LEFT:
                q, r = r, -q
            phi = np.arccos(np.clip(-s, -1.0, 1.0)) - HALFPI
            lam = np.arctan2(r, q)
            if self.face == self.RIGHT:
                lam = self._shift_lon(lam, -HALFPI)
            elif self.face == self.BACK:
                lam = self._shift_lon(lam, -math.pi)
            elif self.face == self.LEFT:
                lam = self._shift_lon(lam, HALFPI)
        if self.es != 0.0:
            neg = phi < 0.0
            tanphi = np.tan(phi)
            xa = self.b / np.sqrt(tanphi * tanphi + self.one_minus_f_sq)
            phi = np.arctan(np.sqrt(np.clip(self.a * self.a - xa * xa,
                                            0.0, None)) /
                            (self.one_minus_f * xa))
            phi = np.where(neg, -phi, phi)
        return lam / D2R + self.lon0, phi / D2R


class NewZealandMapGrid(Projection):
    """nzmg (New Zealand Map Grid; mproj pj_nzmg after Reilly 1973):
    dpsi = series(tpsi) in units of 1e-5 arcsec of (phi - phi0), then the
    complex sixth-order polynomial z = bf(dpsi + i lam); fixed
    International 1924 ellipsoid, lam0 173E, phi0 41S, false origin
    (2510000, 6023150). Inverse by complex Newton + the tphi series."""

    SEC5_TO_RAD = 0.4848136811095359935899141023e0
    RAD_TO_SEC5 = 2.062648062470963551564733573e0
    BF = [(0.7557853228, 0.0), (0.249204646, 0.003371507),
          (-0.001541739, 0.041058560), (-0.10162907, 0.01727609),
          (-0.26623489, -0.36249218), (-0.6870983, -1.1651967)]
    TPHI = [1.5627014243, 0.5185406398, -0.03333098, -0.1052906,
            -0.0368594, 0.007317, 0.01220, 0.00394, -0.0013]
    TPSI = [0.6399175073, -0.1358797613, 0.063294409, -0.02526853,
            0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067,
            -0.00034]

    def __init__(self, x0=None, y0=None):
        # the reference forces every parameter; only x_0/y_0 may override
        self.a = 6378388.0
        self.lam0 = 173.0 * D2R
        self.phi0 = -41.0 * D2R
        self.x0 = 2510000.0 if x0 is None else x0
        self.y0 = 6023150.0 if y0 is None else y0
        self.C = np.array([complex(r, i) for r, i in self.BF])

    def _poly(self, z):
        p = np.full_like(z, self.C[-1])
        dp = np.zeros_like(z)
        for c in self.C[-2::-1]:
            dp = dp * z + p
            p = p * z + c
        return p, dp

    def _f(self, z):
        p, dp = self._poly(z)
        return z * p, p + z * dp

    def fwd(self, lng, lat):
        lam = np.asarray(lng, dtype=np.float64) * D2R - self.lam0
        phi = (np.asarray(lat, dtype=np.float64) * D2R - self.phi0) * \
            self.RAD_TO_SEC5
        psi = np.full_like(phi, self.TPSI[-1])
        for c in self.TPSI[-2::-1]:
            psi = c + phi * psi
        psi = psi * phi
        w, _ = self._f(psi + 1j * lam)
        # the reference swaps components: x <- imag, y <- real
        return self.a * w.imag + self.x0, self.a * w.real + self.y0

    def inv(self, x, y):
        w = ((np.asarray(y, dtype=np.float64) - self.y0) +
             1j * (np.asarray(x, dtype=np.float64) - self.x0)) / self.a
        z = w.copy()
        for _ in range(20):
            f, fp = self._f(z)
            dz = (f - w) / fp
            z = z - dz
            if np.all(np.abs(dz.real) + np.abs(dz.imag) <= 1e-10):
                break
        psi = z.real
        lam = z.imag
        phi = np.full_like(psi, self.TPHI[-1])
        for c in self.TPHI[-2::-1]:
            phi = c + psi * phi
        phi = self.phi0 + psi * phi * self.SEC5_TO_RAD
        return (lam + self.lam0) / D2R, phi / D2R


class ChamberlinTrimetric(Projection):
    """chamb (Chamberlin Trimetric; mproj pj_chamb — forward only,
    spherical): requires three control points +lat_1/+lon_1 ...
    +lat_3/+lon_3; a point maps to the mean of the three circle-arc
    intercepts from the control triangle."""

    has_inverse = False
    TOL = 1e-9

    def __init__(self, a, pts, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0
        c = []
        for lat_d, lon_d in pts:
            phi = lat_d * D2R
            lam = (lon_d - lon0) * D2R
            lam = (lam + math.pi) % (2.0 * math.pi) - math.pi
            c.append({"phi": phi, "lam": lam, "cosphi": math.cos(phi),
                      "sinphi": math.sin(phi)})
        for i in range(3):
            j = (i + 1) % 3
            r, az = self._vect(c[j]["phi"] - c[i]["phi"], c[i]["cosphi"],
                               c[i]["sinphi"], c[j]["cosphi"],
                               c[j]["sinphi"], c[j]["lam"] - c[i]["lam"])
            if r == 0.0:
                raise ValueError("chamb: coincident control points")
            c[i]["vr"], c[i]["vaz"] = r, az
        self.beta0 = self._lc(c[0]["vr"], c[2]["vr"], c[1]["vr"])
        self.beta1 = self._lc(c[0]["vr"], c[1]["vr"], c[2]["vr"])
        self.beta2 = math.pi - self.beta0
        py01 = c[2]["vr"] * math.sin(self.beta0)
        self.p_y0 = 2.0 * py01
        c[0]["px"], c[1]["px"] = -0.5 * c[0]["vr"], 0.5 * c[0]["vr"]
        c[0]["py"] = c[1]["py"] = py01
        c[2]["px"] = c[0]["px"] + c[2]["vr"] * math.cos(self.beta0)
        c[2]["py"] = 0.0
        self.p_x0 = c[2]["px"]
        self.c = c

    @staticmethod
    def _vect(dphi, c1, s1, c2, s2, dlam):
        cdl = np.cos(dlam)
        big = (np.abs(dphi) > 1.0) | (np.abs(dlam) > 1.0)
        # (the bundle's large-distance branch reads cs1*s2 — an obvious
        # typo for s1*s2; the correct spherical law of cosines is used)
        r_big = np.arccos(np.clip(s1 * s2 + c1 * c2 * cdl, -1.0, 1.0))
        dp = np.sin(0.5 * dphi)
        dl = np.sin(0.5 * dlam)
        r_small = 2.0 * np.arcsin(np.clip(
            np.sqrt(dp * dp + c1 * c2 * dl * dl), -1.0, 1.0))
        r = np.where(big, r_big, r_small)
        az = np.where(np.abs(r) > ChamberlinTrimetric.TOL,
                      np.arctan2(c2 * np.sin(dlam),
                                 c1 * s2 - s1 * c2 * cdl), 0.0)
        r = np.where(np.abs(r) > ChamberlinTrimetric.TOL, r, 0.0)
        if np.isscalar(dphi) or r.ndim == 0:
            return float(r), float(az)
        return r, az

    @staticmethod
    def _lc(b, c, a):
        den = b * c
        den = np.where(den == 0.0, 1.0, den)  # guarded; r==0 rows are
        return np.arccos(np.clip(                 # overwritten below
            0.5 * (b * b + c * c - a * a) / den, -1.0, 1.0))

    @staticmethod
    def _adjlon(lam):
        return (lam + math.pi) % (2.0 * math.pi) - math.pi

    def fwd(self, lng, lat):
        lam = self._adjlon((np.asarray(lng, dtype=np.float64) - self.lon0)
                           * D2R)
        phi = np.asarray(lat, dtype=np.float64) * D2R
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        vr, vaz = [], []
        at_ctl = None
        for i in range(3):
            ci = self.c[i]
            r, az = self._vect(phi - ci["phi"], ci["cosphi"], ci["sinphi"],
                               cosphi, sinphi, lam - ci["lam"])
            r = np.asarray(r, dtype=np.float64)
            az = self._adjlon(np.asarray(az, dtype=np.float64) - ci["vaz"])
            vr.append(r)
            vaz.append(az)
            hit = r == 0.0
            at_ctl = hit if at_ctl is None else (at_ctl | hit)
        x = np.full_like(vr[0], self.p_x0)
        y = np.full_like(vr[0], self.p_y0)
        for i in range(3):
            j = (i + 1) % 3
            aa = self._lc(self.c[i]["vr"], vr[i], vr[j])
            aa = np.where(vaz[i] < 0.0, -aa, aa)
            if i == 0:
                x = x + vr[i] * np.cos(aa)
                y = y - vr[i] * np.sin(aa)
            elif i == 1:
                aa = self.beta1 - aa
                x = x - vr[i] * np.cos(aa)
                y = y - vr[i] * np.sin(aa)
            else:
                aa = self.beta2 - aa
                x = x + vr[i] * np.cos(aa)
                y = y + vr[i] * np.sin(aa)
        x = x / 3.0
        y = y / 3.0
        # points exactly on a control point take that control's position
        for i in range(3):
            hit = vr[i] == 0.0
            if np.any(hit):
                x = np.where(hit, self.c[i]["px"], x)
                y = np.where(hit, self.c[i]["py"], y)
        return self.a * x + self.x0, self.a * y + self.y0


class Geocentric(Projection):
    """geocent (mproj pj_geocent): in the reference's 2D pipeline the
    forward/inverse are the identity on (lam, phi) radians — the
    is_geocent flag only matters for 3D datum shifts it never performs —
    so projected coordinates come out as a*lam, a*phi."""

    def __init__(self, a=6378137.0, x0=0.0, y0=0.0):
        self.a, self.x0, self.y0 = a, x0, y0

    def fwd(self, lng, lat):
        return (np.asarray(lng, dtype=np.float64) * D2R * self.a + self.x0,
                np.asarray(lat, dtype=np.float64) * D2R * self.a + self.y0)

    def inv(self, x, y):
        return ((np.asarray(x, dtype=np.float64) - self.x0) / self.a / D2R,
                (np.asarray(y, dtype=np.float64) - self.y0) / self.a / D2R)


class ObliqueTransform(Projection):
    """ob_tran (general oblique transformation): project through a
    rotated sphere — the new north pole sits at (+o_lat_p, +o_lon_p) and
    the inner +o_proj= runs in the rotated frame. Rotation (spherical
    triangle about the new pole P):
        sin phi' = sin latp sin phi + cos latp cos phi cos(lam - lonp)
        lam'     = atan2(cos phi sin(lam - lonp),
                         sin latp cos phi cos(lam - lonp) - cos latp sin phi)
    and the exact inverse with (phi', lam') swapped in. Frame convention:
    +o_lat_p=90 +o_lon_p=0 reduces to the inner projection EXACTLY (the
    rotation is then the identity); for an oblique pole the original
    north pole sits at lam' = +-180. Verified by the identity test, the
    distance-preservation property of the rotation, and the
    transverse-eqc == cassini identity."""

    def __init__(self, inner: Projection, a, lat_p=90.0, lon_p=0.0,
                 lon0=0.0, x0=0.0, y0=0.0):
        self.inner = inner
        self.a, self.lon0, self.x0, self.y0 = a, lon0, x0, y0
        self.sp = math.sin(lat_p * D2R)
        self.cp = math.cos(lat_p * D2R)
        self.lonp = lon_p * D2R

    def _rot_fwd(self, lam, phi):
        dl = lam - self.lonp
        sphi = np.clip(self.sp * np.sin(phi) +
                       self.cp * np.cos(phi) * np.cos(dl), -1.0, 1.0)
        lam2 = np.arctan2(np.cos(phi) * np.sin(dl),
                          self.sp * np.cos(phi) * np.cos(dl) -
                          self.cp * np.sin(phi))
        return lam2, np.arcsin(sphi)

    def _rot_inv(self, lam2, phi2):
        # the transpose of the forward rotation matrix
        # [[sp, 0, -cp], [0, 1, 0], [cp, 0, sp]]
        sphi = np.clip(self.sp * np.sin(phi2) -
                       self.cp * np.cos(phi2) * np.cos(lam2), -1.0, 1.0)
        lam = np.arctan2(np.cos(phi2) * np.sin(lam2),
                         self.sp * np.cos(phi2) * np.cos(lam2) +
                         self.cp * np.sin(phi2))
        return lam + self.lonp, np.arcsin(sphi)

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        lam = lam - 2.0 * math.pi * np.round(lam / (2.0 * math.pi))
        phi = np.asarray(lat, dtype=np.float64) * D2R
        lam2, phi2 = self._rot_fwd(lam, phi)
        x, y = self.inner.fwd(lam2 / D2R, phi2 / D2R)
        return x + self.x0, y + self.y0

    def inv(self, x, y):
        lng2, lat2 = self.inner.inv(
            np.asarray(x, dtype=np.float64) - self.x0,
            np.asarray(y, dtype=np.float64) - self.y0)
        lam, phi = self._rot_inv(np.asarray(lng2) * D2R,
                                 np.asarray(lat2) * D2R)
        return lam / D2R + self.lon0, phi / D2R


class TwoPointEquidistant(Projection):
    """tpeqd (two-point equidistant, spherical; Snyder WM pp. 192-194):
    distances from BOTH foci (lat_1, lon_1) and (lat_2, lon_2) are true.
    Derived from the defining property rather than transcribed: the foci
    map to (-d, 0) and (+d, 0) where 2d is their angular distance, and a
    point with focal distances zA, zB lands at
        x = (zA^2 - zB^2) / (4 d),   y = +-sqrt(zA^2 - (x + d)^2)
    with y's sign from the side of the oriented great circle A->B
    (sign((A x B) . P)). Inverse: recover (zA, zB) from the plane, open
    the angle at A with the spherical law of cosines, and shoot the
    direct geodesic from A at bearing (bearing(A->B) - sign(y) alpha).
    The true-distance property and exact global round-trip are tested."""

    def __init__(self, a, lat1, lon1, lat2, lon2, x0=0.0, y0=0.0):
        self.a, self.x0, self.y0 = a, x0, y0
        p1, l1 = lat1 * D2R, lon1 * D2R
        p2, l2 = lat2 * D2R, lon2 * D2R
        self.l1 = l1
        self.sp1, self.cp1 = math.sin(p1), math.cos(p1)
        sp2, cp2 = math.sin(p2), math.cos(p2)
        cos2d = self.sp1 * sp2 + self.cp1 * cp2 * math.cos(l2 - l1)
        self.d2 = math.acos(max(-1.0, min(1.0, cos2d)))
        if self.d2 < 1e-9 or self.d2 > math.pi - 1e-6:
            raise ValueError("tpeqd: the two points must be distinct and "
                             "not antipodal")
        self.d = 0.5 * self.d2
        self.thAB = math.atan2(cp2 * math.sin(l2 - l1),
                               self.cp1 * sp2 -
                               self.sp1 * cp2 * math.cos(l2 - l1))
        self.A = np.array([self.cp1 * math.cos(l1),
                           self.cp1 * math.sin(l1), self.sp1])
        self.B = np.array([cp2 * math.cos(l2), cp2 * math.sin(l2), sp2])
        self.N = np.cross(self.A, self.B)

    def fwd(self, lng, lat):
        lam = np.asarray(lng, dtype=np.float64) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        sp, cp = np.sin(phi), np.cos(phi)
        px, py, pz = cp * np.cos(lam), cp * np.sin(lam), sp
        zA = np.arccos(np.clip(
            px * self.A[0] + py * self.A[1] + pz * self.A[2], -1.0, 1.0))
        zB = np.arccos(np.clip(
            px * self.B[0] + py * self.B[1] + pz * self.B[2], -1.0, 1.0))
        x = (zA * zA - zB * zB) / (4.0 * self.d)
        y2 = np.maximum(zA * zA - (x + self.d) ** 2, 0.0)
        side = np.sign(px * self.N[0] + py * self.N[1] + pz * self.N[2])
        y = np.where(side == 0, 1.0, side) * np.sqrt(y2)
        return self.a * x + self.x0, self.a * y + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        yr = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        zA = np.hypot(xr + self.d, yr)
        zB = np.hypot(xr - self.d, yr)
        szA = np.maximum(np.sin(zA), 1e-12)
        ca = (np.cos(zB) - math.cos(self.d2) * np.cos(zA)) / \
            (math.sin(self.d2) * szA)
        alpha = np.arccos(np.clip(ca, -1.0, 1.0))
        th = self.thAB - np.sign(yr) * alpha
        sp = self.sp1 * np.cos(zA) + self.cp1 * np.sin(zA) * np.cos(th)
        phi = np.arcsin(np.clip(sp, -1.0, 1.0))
        dl = np.arctan2(np.sin(th) * np.sin(zA),
                        self.cp1 * np.cos(zA) -
                        self.sp1 * np.sin(zA) * np.cos(th))
        at_A = zA < 1e-9
        phi = np.where(at_A, math.asin(self.sp1), phi)
        dl = np.where(at_A, 0.0, dl)
        return (self.l1 + dl) / D2R, phi / D2R


class TiltedPerspective(_SphericalAzimuthal):
    """tpers (tilted near-side perspective; Snyder WM pp. 173-178, the
    generalization mproj exposes as +proj=tpers +h= +tilt= +azi=): a
    camera at height h above (lat_0, lon_0) looking at the nadir, with
    the image plane tilted omega from the vertical toward azimuth gamma
    (east of north) and the image frame rotated by gamma.

    Derived from the 3D pinhole model rather than transcribed: camera
    C = (0, 0, P) in the local east/north/up frame (P = 1 + h/a), image
    plane through the principal point O = C - (P-1) n with unit normal
    n = (sin w sin g, sin w cos g, cos w) and in-plane axes
    u = (cos g, -sin g, 0), v = (cos w sin g, cos w cos g, -sin w);
    a sphere point S projects to ((R(t*)-O).u, (R(t*)-O).v) where
    R(t) = C + t (S - C) and t* = (P-1)/(n.(C-S)). tilt = azi = 0
    reduces EXACTLY to nsper (tested). Inverse = ray-sphere
    intersection, near root."""

    def __init__(self, a, h, tilt=0.0, azi=0.0, lat0=0.0, lon0=0.0,
                 x0=0.0, y0=0.0):
        super().__init__(a, lat0=lat0, lon0=lon0, x0=x0, y0=y0)
        self.P = 1.0 + h / a
        w, g = tilt * D2R, azi * D2R
        sw, cw, sg, cg = math.sin(w), math.cos(w), math.sin(g), math.cos(g)
        self.n = np.array([sw * sg, sw * cg, cw])
        self.u = np.array([cg, -sg, 0.0])
        self.v = np.array([cw * sg, cw * cg, -sw])

    def _local(self, lam, phi):
        sp, cp = np.sin(phi), np.cos(phi)
        X = cp * np.sin(lam)
        Y = self.c0 * sp - self.s0 * cp * np.cos(lam)
        Z = self.s0 * sp + self.c0 * cp * np.cos(lam)
        return X, Y, Z

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        X, Y, Z = self._local(lam, phi)
        P = self.P
        # n.(C - S) with C = (0, 0, P)
        denom = (self.n[2] * P - (self.n[0] * X + self.n[1] * Y +
                                  self.n[2] * Z))
        t = (P - 1.0) / np.where(np.abs(denom) < 1e-15, 1e-15, denom)
        # R(t) - O where O = C - (P-1) n
        px = t * X + (P - 1.0) * self.n[0]
        py = t * Y + (P - 1.0) * self.n[1]
        pz = t * (Z - P) + (P - 1.0) * self.n[2]
        xi = px * self.u[0] + py * self.u[1] + pz * self.u[2]
        yi = px * self.v[0] + py * self.v[1] + pz * self.v[2]
        return self.a * xi + self.x0, self.a * yi + self.y0

    def inv(self, x, y):
        xi = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        yi = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        P = self.P
        # plane point O + xi u + yi v, then the ray from C through it
        ox = xi * self.u[0] + yi * self.v[0] - (P - 1.0) * self.n[0]
        oy = xi * self.u[1] + yi * self.v[1] - (P - 1.0) * self.n[1]
        oz = P + xi * self.u[2] + yi * self.v[2] - (P - 1.0) * self.n[2]
        dx, dy, dz = ox, oy, oz - P
        dn = np.sqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx / dn, dy / dn, dz / dn
        # |C + s d| = 1: s^2 + 2 P dz s + P^2 - 1 = 0, near root
        b = P * dz
        disc = np.sqrt(np.maximum(b * b - (P * P - 1.0), 0.0))
        s = -b - disc
        X, Y, Z = s * dx, s * dy, P + s * dz
        phi = np.arcsin(np.clip(self.s0 * Z + self.c0 * Y, -1.0, 1.0))
        lam = np.arctan2(X, self.c0 * Z - self.s0 * Y)
        return lam / D2R + self.lon0, phi / D2R


class Geostationary(Projection):
    """geos (geostationary satellite view, spherical; the CGMS LRIT/HRIT
    normalized geostationary projection): satellite at distance
    rg = 1 + h/a over (0, lon_0); coordinates are scan angles times h.
    With V the unit sphere point and tmp = rg - Vx:
      sweep=y (default): x = h atan(Vy / tmp), y = h atan(Vz / hypot(Vy, tmp))
      sweep=x:           x = h atan(Vy / hypot(Vz, tmp)), y = h atan(Vz / tmp)
    Inverse reconstructs the scan ray and takes the near ray-sphere root.
    Like ortho/nsper, no horizon clipping — the caller owns visibility."""

    def __init__(self, a, h, lon0=0.0, sweep="y", x0=0.0, y0=0.0):
        if sweep not in ("x", "y"):
            raise ValueError("geos: +sweep= must be x or y")
        self.a, self.h, self.lon0 = a, h, lon0
        self.sweep, self.x0, self.y0 = sweep, x0, y0
        self.rg = 1.0 + h / a

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        cp = np.cos(phi)
        Vx, Vy, Vz = cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)
        tmp = self.rg - Vx
        if self.sweep == "y":
            xa = np.arctan2(Vy, tmp)
            ya = np.arctan2(Vz, np.hypot(Vy, tmp))
        else:
            xa = np.arctan2(Vy, np.hypot(Vz, tmp))
            ya = np.arctan2(Vz, tmp)
        return self.h * xa + self.x0, self.h * ya + self.y0

    def inv(self, x, y):
        xa = (np.asarray(x, dtype=np.float64) - self.x0) / self.h
        ya = (np.asarray(y, dtype=np.float64) - self.y0) / self.h
        if self.sweep == "y":
            dx = -np.cos(ya) * np.cos(xa)
            dy = np.cos(ya) * np.sin(xa)
            dz = np.sin(ya)
        else:
            dx = -np.cos(xa) * np.cos(ya)
            dz = np.sin(ya) * np.cos(xa)
            dy = np.sin(xa)
        # |(rg, 0, 0) + t d| = 1, d unit: t^2 + 2 rg dx t + rg^2 - 1 = 0
        b = self.rg * dx
        disc = np.sqrt(np.maximum(b * b - (self.rg ** 2 - 1.0), 0.0))
        t = -b - disc
        Px, Py, Pz = self.rg + t * dx, t * dy, t * dz
        phi = np.arcsin(np.clip(Pz, -1.0, 1.0))
        lam = np.arctan2(Py, Px)
        return lam / D2R + self.lon0, phi / D2R


class RectangularPolyconic(Projection):
    """rpoly (rectangular polyconic / War Office projection; fwd-only in
    PROJ, Newton inverse here): each parallel is the polyconic circle of
    radius cot(phi), with the meridian crossing chosen so meridians cut
    parallels at right angles: E = 2 atan(fa sin phi) where fa = lam/2,
    or with +lat_ts the true-scale form fa = tan(lam fxb) fxa using
    fxb = sin(lat_ts)/2 and fxa = 1/(2 fxb);
    x = cot phi sin E, y = phi - phi0 + cot phi (1 - cos E)."""

    def __init__(self, a, lat_ts=0.0, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.a, self.lat0, self.lon0 = a, lat0, lon0
        self.x0, self.y0 = x0, y0
        self.phi0 = lat0 * D2R
        if abs(lat_ts) > 1e-12:
            self.fxb = 0.5 * math.sin(lat_ts * D2R)
            self.fxa = 0.5 / self.fxb
        else:
            self.fxb = self.fxa = 0.0

    def _fwd_rad(self, lam, phi):
        if self.fxb:
            fa = np.tan(lam * self.fxb) * self.fxa
        else:
            fa = 0.5 * lam
        flat = np.abs(phi) < 1e-9
        phis = np.where(flat, 0.5, phi)
        cot = 1.0 / np.tan(phis)
        e = 2.0 * np.arctan(fa * np.sin(phis))
        x = np.where(flat, 2.0 * fa, cot * np.sin(e))
        y = np.where(flat, -self.phi0,
                     phis - self.phi0 + cot * (1.0 - np.cos(e)))
        return x, y

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        x, y = self._fwd_rad(lam, phi)
        return self.a * x + self.x0, self.a * y + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        yr = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        lam = np.clip(xr, -math.pi, math.pi)
        phi = np.clip(yr + self.phi0, -HALFPI + 1e-9, HALFPI - 1e-9)
        h = 1e-7
        for it in range(50):
            fx, fy = self._fwd_rad(lam, phi)
            fxl, fyl = self._fwd_rad(lam + h, phi)
            fxp, fyp = self._fwd_rad(lam, phi + h)
            j11, j12 = (fxl - fx) / h, (fxp - fx) / h
            j21, j22 = (fyl - fy) / h, (fyp - fy) / h
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-15, 1e-15, det)
            ex, ey = fx - xr, fy - yr
            dl = (ex * j22 - ey * j12) / det
            dp = (ey * j11 - ex * j21) / det
            # damp early steps; full Newton once the iterate is close
            cap = 0.3 if it < 10 else 1.5
            step = np.maximum(np.hypot(dl, dp) / cap, 1.0)
            lam = lam - dl / step
            phi = np.clip(phi - dp / step, -HALFPI + 1e-9, HALFPI - 1e-9)
        return lam / D2R + self.lon0, phi / D2R


class Globular(_SimplePseudoCylindrical):
    """apian / ortel / bacon / nicol — the classical globulars, built from
    their geometric definitions (the construction mproj's pj_list members
    encode in closed form; Snyder & Voxland Album pp. 14-15, 234):

    Every meridian lam is the circular arc through both poles (0, +-pi/2)
    and the equally-divided equator point (lam, 0): center (lam - f, 0),
    radius f = (HLFPI2/|lam| + |lam|) / 2 with HLFPI2 = (pi/2)^2.
      apian  parallels are horizontal lines y = phi
      bacon  parallels are horizontal lines y = (pi/2) sin phi
      ortel  apian inside |lam| <= pi/2; outside, meridians translate the
             lam = pi/2 semicircle: x = sqrt(HLFPI2 - phi^2) + |lam| - pi/2
      nicol  parallels are ALSO circular arcs, through (0, phi) and the
             boundary-circle points (+-(pi/2) cos phi, (pi/2) sin phi):
             center (0, yc), yc = (HLFPI2 - phi^2)/(pi sin phi - 2 phi);
             the projected point is the meridian-arc x parallel-arc
             intersection (the root on the map side).

    Inverses are closed for apian/bacon/ortel (the meridian circle through
    (x, y) and the poles has center x_c = (x^2 + y^2 - HLFPI2)/(2x), so
    |lam| = x_c + sqrt(x_c^2 + HLFPI2)); nicol bisects phi from the
    parallel-circle relation then Newton-polishes on the closed form.

    nicol inverse contract: the closed-form continuation past |lam| =
    pi/2 FOLDS back over the hemisphere (e.g. (170E, 85N) and (64E, 83N)
    project to the same point — the classical construction is a
    hemisphere map, and mproj/PROJ ship no nicol inverse at all), so a
    two-sided inverse cannot exist there. inv() returns the hemisphere
    preimage: inv(fwd) == id for |lam| <= 90 and fwd(inv) == id
    everywhere; unreachable coordinates come back NaN."""

    HLFPI2 = (math.pi / 2.0) ** 2

    def __init__(self, kind, a, lon0=0.0, x0=0.0, y0=0.0):
        super().__init__(a, lon0, x0, y0)
        self.kind = kind

    # --- shared circle helpers (all on |lam|, |phi| >= 0, signs restored
    # at the end: both families are symmetric about both axes) ---

    @classmethod
    def _meridian_x(cls, ax, y):
        """x >= 0 on the meridian arc for |lam| = ax at height y."""
        f = 0.5 * (cls.HLFPI2 / np.maximum(ax, 1e-12) + ax)
        return ax - f + np.sqrt(np.maximum(f * f - y * y, 0.0))

    @classmethod
    def _meridian_lam(cls, x, y):
        """|lam| of the meridian arc through (x > 0, y)."""
        xc = (x * x + y * y - cls.HLFPI2) / (2.0 * np.maximum(x, 1e-12))
        return xc + np.sqrt(xc * xc + cls.HLFPI2)

    @classmethod
    def _parallel_yc(cls, aphi):
        den = math.pi * np.sin(aphi) - 2.0 * aphi
        return (cls.HLFPI2 - aphi * aphi) / np.where(np.abs(den) < 1e-12,
                                                     1e-12, den)

    def _fwd(self, lam, phi):
        sx, sy = np.sign(lam), np.sign(phi)
        ax, aphi = np.abs(lam), np.abs(phi)
        if self.kind == "bacon":
            y = HALFPI * np.sin(aphi)
        else:
            y = aphi
        if self.kind == "nicol":
            x, y = self._nicol_xy(ax, aphi)
        elif self.kind == "ortel":
            inner = self._meridian_x(ax, y)
            outer = np.sqrt(np.maximum(self.HLFPI2 - aphi * aphi, 0.0)) \
                + ax - HALFPI
            x = np.where(ax <= HALFPI, inner, outer)
        else:
            x = self._meridian_x(ax, y)
        x = np.where(ax < 1e-12, 0.0, x)
        return sx * x, sy * y

    def _nicol_xy(self, ax, aphi):
        """Closed Nicolosi form on the first quadrant. Inside the
        hemisphere (ax <= pi/2) it equals the meridian-arc x parallel-arc
        circle intersection exactly (the test asserts this); past pi/2 it
        continues the same algebra smoothly where the finite parallel
        arcs no longer reach the meridian circle."""
        on_cm = ax < 1e-9
        on_eq = aphi < 1e-9
        on_edge = np.abs(ax - HALFPI) < 1e-9
        at_pole = np.abs(aphi - HALFPI) < 1e-9
        special = on_cm | on_eq | on_edge | at_pole
        axs = np.where(on_cm | on_edge, 0.7, ax)
        aps = np.where(on_eq | at_pole, 0.7, aphi)
        sp = np.sin(aps)
        tb = HALFPI / axs - axs / HALFPI
        c = aps / HALFPI
        d = (1.0 - c * c) / (sp - c)
        r2 = (tb / d) ** 2
        m = (tb * sp / d - 0.5 * tb) / (1.0 + r2)
        n = (sp / r2 + 0.5 * d) / (1.0 + 1.0 / r2)
        xr = np.sqrt(np.maximum(
            m * m + np.cos(aps) ** 2 / (1.0 + r2), 0.0))
        x = HALFPI * (m + xr)
        yr = np.sqrt(np.maximum(
            n * n - (sp * sp / r2 + d * sp - 1.0) / (1.0 + 1.0 / r2), 0.0))
        y = HALFPI * (n - yr)
        x = np.where(special, 0.0, x)
        y = np.where(special, 0.0, y)
        x = np.where(on_eq & ~on_cm, ax, x)
        y = np.where(on_cm | at_pole, aphi, y)
        edge = on_edge & ~on_eq & ~on_cm & ~at_pole
        x = np.where(edge, ax * np.cos(aphi), x)
        y = np.where(edge, HALFPI * np.sin(aphi), y)
        return x, y

    def _inv(self, x, y):
        sx, sy = np.sign(x), np.sign(y)
        axx, ay = np.abs(x), np.abs(y)
        if self.kind == "nicol":
            ax, aphi = self._nicol_inv(axx, ay)
            return sx * ax, sy * aphi
        if self.kind == "bacon":
            aphi = np.arcsin(np.clip(ay / HALFPI, -1.0, 1.0))
        else:
            aphi = ay
        lam_in = self._meridian_lam(np.maximum(axx, 1e-12), ay)
        if self.kind == "ortel":
            lam_out = axx - np.sqrt(np.maximum(
                self.HLFPI2 - aphi * aphi, 0.0)) + HALFPI
            lam = np.where(lam_in <= HALFPI + 1e-9, lam_in, lam_out)
        else:
            lam = lam_in
        lam = np.where(axx < 1e-12, 0.0, lam)
        return sx * lam, sy * aphi

    def _nicol_inv(self, axx, ay):
        # seed from the hemisphere circle construction: |phi| bisected
        # from the parallel-circle relation x^2 + (y-yc)^2 = (yc-phi)^2
        # (resid rises with phi), |lam| from the meridian circle through
        # (x, y) and the poles; then Newton-polish on the closed forward
        # so points past the hemisphere converge too
        lo = np.zeros_like(ay)
        hi = np.full_like(ay, HALFPI - 1e-12)

        def resid(aphi):
            yc = self._parallel_yc(np.maximum(aphi, 1e-9))
            return (axx * axx + (ay - yc) ** 2) - (yc - aphi) ** 2

        for _ in range(50):
            mid = 0.5 * (lo + hi)
            r = resid(mid)
            hi = np.where(r > 0, mid, hi)
            lo = np.where(r > 0, lo, mid)
        aphi0 = np.clip(0.5 * (lo + hi), 1e-9, HALFPI - 1e-9)
        lam0 = np.clip(self._meridian_lam(np.maximum(axx, 1e-12), ay),
                       1e-9, math.pi)

        def polish(lam, aphi):
            h = 1e-7
            for _ in range(18):
                fx, fy = self._nicol_xy(lam, aphi)
                fxl, fyl = self._nicol_xy(lam + h, aphi)
                fxp, fyp = self._nicol_xy(lam, aphi + h)
                j11, j12 = (fxl - fx) / h, (fxp - fx) / h
                j21, j22 = (fyl - fy) / h, (fyp - fy) / h
                det = j11 * j22 - j12 * j21
                det = np.where(np.abs(det) < 1e-15, 1e-15, det)
                ex, ey = fx - axx, fy - ay
                dl = (ex * j22 - ey * j12) / det
                dp = (ey * j11 - ex * j21) / det
                # damp: the Jacobian degenerates near the pole fold
                step = np.maximum(np.hypot(dl, dp) / 0.5, 1.0)
                lam = np.clip(lam - dl / step, 1e-9, math.pi)
                aphi = np.clip(aphi - dp / step, 1e-9, HALFPI - 1e-9)
            fx, fy = self._nicol_xy(lam, aphi)
            return lam, aphi, np.hypot(fx - axx, fy - ay)

        lam, aphi, err = polish(lam0, aphi0)
        # re-seed non-converged points (beyond-hemisphere region where the
        # circle seed is out of range) from outer-longitude starts
        for lseed in (0.75 * math.pi, 0.95 * math.pi, 0.6 * math.pi):
            bad = err > 1e-9
            if not bad.any():
                break
            l2, p2, e2 = polish(np.where(bad, lseed, lam),
                                np.where(bad, aphi0, aphi))
            take = bad & (e2 < err)
            lam = np.where(take, l2, lam)
            aphi = np.where(take, p2, aphi)
            err = np.where(take, e2, err)
        # the classical construction is a hemisphere map; where even the
        # continuation's Newton cannot reproduce (x, y) there is no
        # preimage — return NaN rather than a silently wrong coordinate
        nanbad = err > 1e-6
        lam = np.where(nanbad, np.nan, lam)
        aphi = np.where(nanbad, np.nan, aphi)
        aphi = np.where(ay < 1e-12, 0.0, aphi)
        aphi = np.where(axx < 1e-12, ay, aphi)
        lam = np.where(axx < 1e-12, 0.0, lam)
        return lam, aphi


class August(_SimplePseudoCylindrical):
    """august (August epicycloidal, conformal world in a two-cusped
    epicycloid; Snyder & Voxland Album p. 74): with the conformal disk
    point s = (c1 sin(lam/2) + i tan(phi/2)) / (1 + c1 cos(lam/2)),
    c1 = sqrt(1 - tan^2(phi/2)), the map is the complex cubic
        w = (4/3)(3 s + s^3).
    CLOSED inverse: s^3 + 3 s = 3 w / 4 = 2 sinh(3 theta) at s = 2 sinh
    theta, so s = 2 sinh(asinh(3 w / 8) / 3); the disk map itself is
    s = tan(Z/2) with Z = lam/2 + i asinh(tan(phi/2) / c1), so
    Z = 2 atan(s), lam = 2 Re Z, phi = 2 atan(tanh(Im Z))."""

    M = 4.0 / 3.0

    def _fwd(self, lam, phi):
        # the epicycloid cubic is NOT 2pi-periodic in lam: normalize to
        # [-pi, pi] like pj_fwd's adjlon so +lon_0 shifts stay on-branch
        lam = lam - 2.0 * math.pi * np.round(lam / (2.0 * math.pi))
        t = np.tan(0.5 * phi)
        c1 = np.sqrt(np.maximum(1.0 - t * t, 0.0))
        u = 0.5 * lam
        c = 1.0 + c1 * np.cos(u)
        x1 = c1 * np.sin(u) / c
        y1 = t / c
        x12, y12 = x1 * x1, y1 * y1
        return (self.M * x1 * (3.0 + x12 - 3.0 * y12),
                self.M * y1 * (3.0 + 3.0 * x12 - y12))

    def _inv(self, x, y):
        w = np.asarray(x, dtype=np.complex128) + 1j * y
        s = 2.0 * np.sinh(np.arcsinh(0.375 * w) / 3.0)
        z = 2.0 * np.arctan(s)
        lam = 2.0 * np.real(z)
        phi = 2.0 * np.arctan(np.tanh(np.imag(z)))
        return lam, phi


class Lagrange(_SimplePseudoCylindrical):
    """lagrng (Lagrange conformal circular, +W= lobe divisor default 2,
    +lat_1= the parallel mapped to the x axis): with v = a1 ((1 + sin phi)
    / (1 - sin phi))^(1/(2W)), a1 the same power at -lat_1, and
    u = lam / W:
        c = (v + 1/v)/2 + cos u,  x = 2 sin u / c,  y = (v - 1/v) / c.
    Conformal except at the poles. CLOSED inverse: (x + i y)/2 =
    tan(Z/2) with Z = u + i log v, so Z = 2 atan((x + i y)/2)."""

    def __init__(self, a, W=2.0, lat1=0.0, lon0=0.0, x0=0.0, y0=0.0):
        if W <= 0:
            raise ValueError("lagrng: +W= must be positive")
        super().__init__(a, lon0, x0, y0)
        self.W = W
        self.hrw = 0.5 / W
        s1 = math.sin(lat1 * D2R)
        self.a1 = ((1.0 - s1) / (1.0 + s1)) ** self.hrw

    def _fwd(self, lam, phi):
        at_pole = np.abs(phi) >= HALFPI - 1e-12
        sp = np.clip(np.sin(phi), -1.0 + 1e-15, 1.0 - 1e-15)
        v = self.a1 * ((1.0 + sp) / (1.0 - sp)) ** self.hrw
        u = lam / self.W
        c = 0.5 * (v + 1.0 / v) + np.cos(u)
        return (np.where(at_pole, 0.0, 2.0 * np.sin(u) / c),
                np.where(at_pole, 2.0 * np.sign(phi), (v - 1.0 / v) / c))

    def _inv(self, x, y):
        w = 0.5 * (np.asarray(x, dtype=np.complex128) + 1j * y)
        z = 2.0 * np.arctan(w)
        u = np.real(z)
        v = np.exp(np.imag(z))
        g = (v / self.a1) ** (1.0 / self.hrw)
        phi = np.arcsin(np.clip((g - 1.0) / (g + 1.0), -1.0, 1.0))
        return u * self.W, phi


class SimpleConic(Projection):
    """tissot / murd1 / murd2 / murd3 / euler / pconic / vitk1 — the
    one-cone 'simple conics' family mproj exposes through pj_list (the
    reference reaches them via mapshaper-projections.js:4-66). Spherical,
    from the classical defining conditions (Snyder & Voxland, "An Album of
    Map Projections" pp. 92-97; Maling, "Coordinate Systems and Map
    Projections" ch. 8):

    all share x = rho sin(n lam), y = rho0 - rho cos(n lam) with
    sig = (lat1+lat2)/2, del = (lat2-lat1)/2 and

      murd1  (equidistant) rho = rho_c - phi,
             n = sin sig, rho_c = sin del / (del tan sig) + sig
      murd2  rho = rho_c + tan(sig - phi),
             n = sin sig sqrt(cos del), rho_c = sqrt(cos del)/tan sig
      murd3  (equidistant) rho = rho_c - phi,
             n = sin sig sin del tan del / del^2,
             rho_c = del / (tan sig tan del) + sig
      euler  (equidistant) rho = rho_c - phi, n = sin sig sin del / del,
             rho_c = (del/2) / (tan(del/2) tan sig) + sig
      vitk1  (equidistant) rho = rho_c - phi, n = sin sig tan del / del,
             rho_c = del / (tan del tan sig) + sig
      tissot (equal-area)  rho = sqrt((rho_c - 2 sin phi) / n),
             n = sin sig, rho_c = n / cos del + cos del / n
      pconic (perspective) rho = cos del (cot sig - tan(phi - sig)),
             n = sin sig

    The self-verifying members pin the constants: tissot holds a unit
    area Jacobian AND equal parallel scale k(lat1) = k(lat2); murd3 and
    vitk1 hold k(lat1) = k(lat2) with unit meridian scale; pconic holds
    k(lat1) = k(lat2) = 1 exactly (true perspective standard parallels).
    rho0 evaluates rho at +lat_0 (default 0)."""

    _EQUIDISTANT = {"murd1", "murd3", "euler", "vitk1"}

    def __init__(self, kind, a, lat1, lat2, lat0=0.0, lon0=0.0,
                 x0=0.0, y0=0.0):
        self.kind, self.a = kind, a
        self.lon0, self.x0, self.y0 = lon0, x0, y0
        # a southern cone is the equatorial mirror of the northern one:
        # build with |lat| and flip phi / y at the fwd/inv boundary
        self.south = (lat1 + lat2) < 0
        if self.south:
            lat1, lat2, lat0 = -lat1, -lat2, -lat0
        p1, p2 = lat1 * D2R, lat2 * D2R
        if p2 < p1:
            p1, p2 = p2, p1
        sig, dl = 0.5 * (p1 + p2), 0.5 * (p2 - p1)
        if sig <= 0 or sig >= HALFPI:
            raise ValueError(f"{kind}: standard parallels must mean a "
                             "non-degenerate cone (0 < |lat_1+lat_2|/2 < 90)")
        dl = max(dl, 1e-10)
        self.sig = sig
        if kind == "murd1":
            self.n = math.sin(sig)
            self.rho_c = math.sin(dl) / (dl * math.tan(sig)) + sig
        elif kind == "murd2":
            cs = math.sqrt(math.cos(dl))
            self.n = math.sin(sig) * cs
            self.rho_c = cs / math.tan(sig)
        elif kind == "murd3":
            self.n = math.sin(sig) * math.sin(dl) * math.tan(dl) / (dl * dl)
            self.rho_c = dl / (math.tan(sig) * math.tan(dl)) + sig
        elif kind == "euler":
            self.n = math.sin(sig) * math.sin(dl) / dl
            self.rho_c = (0.5 * dl) / (math.tan(0.5 * dl) *
                                       math.tan(sig)) + sig
        elif kind == "vitk1":
            self.n = math.sin(sig) * math.tan(dl) / dl
            self.rho_c = dl / (math.tan(dl) * math.tan(sig)) + sig
        elif kind == "tissot":
            self.n = math.sin(sig)
            cs = math.cos(dl)
            self.rho_c = self.n / cs + cs / self.n
        elif kind == "pconic":
            self.n = math.sin(sig)
            self.c1 = 1.0 / math.tan(sig)
            self.c2 = math.cos(dl)
        else:
            raise ValueError(f"unknown simple conic: {kind}")
        self.rho_0 = float(self._rho(np.float64(lat0 * D2R)))

    def _rho(self, phi):
        if self.kind in self._EQUIDISTANT:
            return self.rho_c - phi
        if self.kind == "murd2":
            return self.rho_c + np.tan(self.sig - phi)
        if self.kind == "tissot":
            return np.sqrt(np.clip((self.rho_c - 2.0 * np.sin(phi)) /
                                   self.n, 0.0, None))
        return self.c2 * (self.c1 - np.tan(phi - self.sig))

    def fwd(self, lng, lat):
        lam = (np.asarray(lng, dtype=np.float64) - self.lon0) * D2R
        phi = np.asarray(lat, dtype=np.float64) * D2R
        if self.south:
            phi = -phi
        rho = self._rho(phi)
        e = self.n * lam
        yr = self.rho_0 - rho * np.cos(e)
        if self.south:
            yr = -yr
        return self.a * rho * np.sin(e) + self.x0, self.a * yr + self.y0

    def inv(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.x0) / self.a
        yr = (np.asarray(y, dtype=np.float64) - self.y0) / self.a
        if self.south:
            yr = -yr
        yr = self.rho_0 - yr
        rho = np.hypot(xr, yr)
        lam = np.arctan2(xr, yr) / self.n
        if self.kind in self._EQUIDISTANT:
            phi = self.rho_c - rho
        elif self.kind == "murd2":
            phi = self.sig - np.arctan(rho - self.rho_c)
        elif self.kind == "tissot":
            phi = np.arcsin(np.clip(0.5 * (self.rho_c - self.n * rho * rho),
                                    -1.0, 1.0))
        else:
            phi = self.sig + np.arctan(self.c1 - rho / self.c2)
        if self.south:
            phi = -phi
        return lam / D2R + self.lon0, phi / D2R


SQRT_PI = math.sqrt(math.pi)


ALIASES = {
    # mapshaper-projections.js:163-168
    "webmercator": "+proj=merc +a=6378137 +b=6378137",
    "wgs84": "+proj=longlat +datum=WGS84",
    "robinson": "+proj=robin +datum=WGS84",
    "EPSG:3857": "+proj=merc +a=6378137 +b=6378137",
    "EPSG:4326": "+proj=longlat +datum=WGS84",
}


# every `+proj=` family get_projection() dispatches — the engine's pj_list
# for -projections (the reference prints mproj's table,
# geom/mapshaper-projections.js:104-110); kept in dispatch order
PROJ_NAMES = ("longlat", "merc", "lcc", "aea", "tmerc", "utm", "robin",
              "eqc", "laea", "stere", "sinu", "moll", "aeqd", "ortho",
              "gnom", "cea", "mill", "eqdc", "hammer", "wintri", "eck4",
              "natearth", "eqearth", "vandg", "gall", "cass", "bonne",
              "poly", "goode", "eck1", "eck2", "eck3", "eck5", "eck6",
              "somerc", "sterea", "omerc", "aitoff", "nsper", "krovak",
              "kav7", "wag6", "collg", "crast", "qua_aut", "wink1",
              "loxim", "tcea", "cc", "nell_h",
              "wag2", "wag3", "wag4", "wag5", "kav5", "mbt_s", "fouc",
              "times", "fahey",
              "wag1", "urmfps", "boggs", "nell", "putp2", "hatano",
              "gn_sinu", "wag7",
              "tissot", "murd1", "murd2", "murd3", "euler", "pconic",
              "vitk1", "mbtfps", "mbtfpq", "mbtfpp",
              "apian", "ortel", "bacon", "nicol", "august", "lagrng",
              "ups", "tpers", "geos", "rpoly", "etmerc", "tpeqd", "igh",
              "ob_tran",
              "latlon", "latlong", "lonlat", "geocent",
              "putp1", "putp3", "putp3p", "putp4p", "weren", "putp5",
              "putp5p", "putp6", "putp6p", "urm5", "wink2", "denoy",
              "natearth2", "mbt_fps", "mbt_fpq", "mbt_fpp",
              "airy", "gilbert", "vandg2", "vandg3", "vandg4", "leac",
              "ocea",
              "mil_os", "lee_os", "gs48", "alsk", "gs50", "gins8",
              "healpix", "rhealpix", "qsc", "nzmg", "chamb")


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
        if "b" in p:
            b = float(p["b"])
            es = 1.0 - (b * b) / (a * a)  # b == a -> 0.0 (sphere)
        elif "rf" in p:  # inverse flattening (the .prj SPHEROID spelling)
            f = 1.0 / float(p["rf"])
            es = 2.0 * f - f * f
        elif "ellps" not in p and "datum" not in p:
            # PROJ pj_ell_set: +a with no shape parameter (+b/+rf) and no
            # +ellps/+datum defines a SPHERE of radius a, not a hybrid
            # ellipsoid with WGS84 eccentricity
            es = 0.0
    lon0 = float(p.get("lon_0", 0.0))
    lat0 = float(p.get("lat_0", 0.0))
    x0 = float(p.get("x_0", 0.0))
    y0 = float(p.get("y_0", 0.0))
    k0 = float(p.get("k_0", p.get("k", 1.0)))
    if name in ("longlat", "latlong", "lonlat", "latlon"):
        return LongLat()
    if name == "merc":
        if "lat_ts" in p and "k_0" not in p and "k" not in p:
            # standard-parallel spelling (the .prj standard_parallel_1):
            # k0 = m(lat_ts) = cos(phi_ts) / sqrt(1 - es sin^2 phi_ts)
            pts = float(p["lat_ts"]) * D2R
            k0 = math.cos(pts) / math.sqrt(1.0 - es * math.sin(pts) ** 2)
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
        # mproj's pj_utm delegates to pj_etmerc — exact series (r5)
        zone = int(p["zone"])
        lon0 = zone * 6 - 183
        return ExtendedTransverseMercator(
            a, es, 0.0, lon0, 0.9996, 500000.0,
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
    if name == "hammer":
        return Hammer(a, lon0=lon0, x0=x0, y0=y0)
    if name == "wintri":
        lat1 = float(p["lat_1"]) if "lat_1" in p else None
        return WinkelTripel(a, lat1=lat1, lon0=lon0, x0=x0, y0=y0)
    if name == "eck4":
        return EckertIV(a, lon0=lon0, x0=x0, y0=y0)
    if name == "natearth":
        return NaturalEarth(a, lon0=lon0, x0=x0, y0=y0)
    if name == "eqearth":
        return EqualEarth(a, lon0=lon0, x0=x0, y0=y0)
    if name == "vandg":
        return VanDerGrinten(a, lon0=lon0, x0=x0, y0=y0)
    if name == "gall":
        return GallStereographic(a, lon0=lon0, x0=x0, y0=y0)
    if name == "cass":
        return Cassini(a, lat0=lat0, lon0=lon0, x0=x0, y0=y0)
    if name == "bonne":
        return Bonne(a, float(p.get("lat_1", 45.0)), lon0=lon0, x0=x0, y0=y0)
    if name == "poly":
        return Polyconic(a, es, lat0=lat0, lon0=lon0, x0=x0, y0=y0)
    if name == "goode":
        return Goode(a, lon0=lon0, x0=x0, y0=y0)
    if name in ("eck1", "eck2", "eck3", "eck5", "eck6"):
        return Eckert(int(name[3]), a, lon0=lon0, x0=x0, y0=y0)
    if name == "somerc":
        return SwissObliqueMercator(a, es, lat0=lat0, lon0=lon0, k0=k0,
                                    x0=x0, y0=y0)
    if name == "sterea":
        return ObliqueStereographic(a, es, lat0=lat0, lon0=lon0, k0=k0,
                                    x0=x0, y0=y0)
    if name == "omerc":
        return HotineObliqueMercator(
            a, es, lat0=lat0, lonc=float(p.get("lonc", lon0)),
            alpha=float(p.get("alpha", 0.0)), k0=k0, x0=x0, y0=y0,
            no_off="no_off" in p)
    if name == "aitoff":
        return Aitoff(a, lon0=lon0, x0=x0, y0=y0)
    if name == "krovak":
        # S-JTSK defaults like proj's pj_krovak (Bessel unless overridden)
        if "datum" not in p and "ellps" not in p and "a" not in p:
            a, es = ELLIPSOIDS["bessel"]
        return Krovak(a, es,
                      lat0=float(p.get("lat_0", 49.5)),
                      lon0=float(p.get("lon_0", 24.833333333333332)),
                      alpha=float(p.get("alpha", 30.288139752777778)),
                      k0=float(p.get("k", p.get("k_0", 0.9999))),
                      x0=x0, y0=y0)
    if name == "nsper":
        return NearSidedPerspective(a, h=float(p.get("h", 35785831.0)),
                                    lat0=lat0, lon0=lon0, x0=x0, y0=y0)
    # the round-4 pseudocylindrical tail (spherical closed forms)
    if name == "kav7":
        return KavrayskiyVII(a, lon0=lon0, x0=x0, y0=y0)
    if name == "wag6":
        return WagnerVI(a, lon0=lon0, x0=x0, y0=y0)
    if name == "collg":
        return Collignon(a, lon0=lon0, x0=x0, y0=y0)
    if name == "crast":
        return CrasterParabolic(a, lon0=lon0, x0=x0, y0=y0)
    if name == "qua_aut":
        return QuarticAuthalic(a, lon0=lon0, x0=x0, y0=y0)
    if name == "wink1":
        return WinkelI(a, lat_ts=float(p.get("lat_ts", 0.0)),
                       lon0=lon0, x0=x0, y0=y0)
    if name == "loxim":
        return Loximuthal(a, lat1=float(p.get("lat_1", 0.0)),
                          lon0=lon0, x0=x0, y0=y0)
    if name == "tcea":
        return TransverseCylindricalEqualArea(a, lat0=lat0, lon0=lon0,
                                              k0=k0, x0=x0, y0=y0)
    if name == "cc":
        return CentralCylindrical(a, lon0=lon0, x0=x0, y0=y0)
    if name == "nell_h":
        return NellHammer(a, lon0=lon0, x0=x0, y0=y0)
    if name == "wag2":
        return WagnerII(a, lon0=lon0, x0=x0, y0=y0)
    if name == "wag3":
        return WagnerIII(a, lat_ts=float(p.get("lat_ts", 0.0)),
                         lon0=lon0, x0=x0, y0=y0)
    if name == "wag4":
        return WagnerIV(a, lon0=lon0, x0=x0, y0=y0)
    if name == "wag5":
        return WagnerV(a, lon0=lon0, x0=x0, y0=y0)
    if name == "kav5":
        return KavrayskiyV(a, lon0=lon0, x0=x0, y0=y0)
    if name == "mbt_s":
        return McBrydeThomasSine(a, lon0=lon0, x0=x0, y0=y0)
    if name == "fouc":
        return Foucaut(a, lon0=lon0, x0=x0, y0=y0)
    if name == "times":
        return Times(a, lon0=lon0, x0=x0, y0=y0)
    if name == "fahey":
        return Fahey(a, lon0=lon0, x0=x0, y0=y0)
    if name == "urmfps":
        if "n" not in p:
            raise ValueError("urmfps requires +n=")
        return URMFPS(a, n=float(p["n"]), lon0=lon0, x0=x0, y0=y0)
    if name == "wag1":
        return URMFPS(a, n=math.sqrt(3.0) / 2.0, lon0=lon0, x0=x0, y0=y0)
    if name == "boggs":
        return Boggs(a, lon0=lon0, x0=x0, y0=y0)
    if name == "nell":
        return Nell(a, lon0=lon0, x0=x0, y0=y0)
    if name == "putp2":
        return PutninsP2(a, lon0=lon0, x0=x0, y0=y0)
    if name == "hatano":
        return Hatano(a, lon0=lon0, x0=x0, y0=y0)
    if name == "gn_sinu":
        if "m" not in p or "n" not in p:
            raise ValueError("gn_sinu requires +m= and +n=")
        return GeneralSinusoidal(a, m=float(p["m"]), n=float(p["n"]),
                                 lon0=lon0, x0=x0, y0=y0)
    if name == "wag7":
        return WagnerVII(a, lon0=lon0, x0=x0, y0=y0)
    if name == "ob_tran":
        if "o_proj" not in p:
            raise ValueError("ob_tran requires +o_proj=")
        skip = {"proj", "o_proj", "o_lat_p", "o_lon_p", "lon_0",
                "x_0", "y_0", "datum", "ellps", "a", "b", "rf"}
        fwd_params = " ".join(
            f"+{k}" if v is True else f"+{k}={v}"
            for k, v in p.items() if k not in skip)
        inner = get_projection(
            f"+proj={p['o_proj']} +a={a} +b={a} {fwd_params}".strip())
        return ObliqueTransform(inner, a,
                                lat_p=float(p.get("o_lat_p", 90.0)),
                                lon_p=float(p.get("o_lon_p", 0.0)),
                                lon0=lon0, x0=x0, y0=y0)
    if name == "tpeqd":
        for req in ("lat_1", "lon_1", "lat_2", "lon_2"):
            if req not in p:
                raise ValueError("tpeqd requires +lat_1/+lon_1/+lat_2/+lon_2")
        return TwoPointEquidistant(a, float(p["lat_1"]), float(p["lon_1"]),
                                   float(p["lat_2"]), float(p["lon_2"]),
                                   x0=x0, y0=y0)
    if name == "igh":
        return InterruptedGoode(a, lon0=lon0, x0=x0, y0=y0)
    if name == "ups":
        # universal polar stereographic: polar stere whose DEFAULTS are
        # k0 = 0.994 and a 2,000 km false easting/northing — explicit
        # +k_0/+x_0/+y_0 still win, as in PROJ (they are defaults, not
        # constants)
        return Stereographic(a, es, lat0=-90.0 if "south" in p else 90.0,
                             lon0=lon0,
                             k0=k0 if ("k_0" in p or "k" in p) else 0.994,
                             x0=x0 if "x_0" in p else 2000000.0,
                             y0=y0 if "y_0" in p else 2000000.0)
    if name == "tpers":
        return TiltedPerspective(a, h=float(p.get("h", 35785831.0)),
                                 tilt=float(p.get("tilt", 0.0)),
                                 azi=float(p.get("azi", 0.0)),
                                 lat0=lat0, lon0=lon0, x0=x0, y0=y0)
    if name == "geos":
        return Geostationary(a, h=float(p.get("h", 35785831.0)),
                             lon0=lon0, sweep=str(p.get("sweep", "y")),
                             x0=x0, y0=y0)
    if name == "rpoly":
        return RectangularPolyconic(a, lat_ts=float(p.get("lat_ts", 0.0)),
                                    lat0=lat0, lon0=lon0, x0=x0, y0=y0)
    if name == "etmerc":
        # exact Poder/Engsager series (r5 — closes the former
        # Snyder-series approximation deviation)
        return ExtendedTransverseMercator(
            a, es, lat0, lon0,
            k0 if ("k_0" in p or "k" in p) else 1.0, x0, y0)
    if name in ("apian", "ortel", "bacon", "nicol"):
        return Globular(name, a, lon0=lon0, x0=x0, y0=y0)
    if name == "august":
        return August(a, lon0=lon0, x0=x0, y0=y0)
    if name == "lagrng":
        return Lagrange(a, W=float(p.get("W", 2.0)),
                        lat1=float(p.get("lat_1", 0.0)),
                        lon0=lon0, x0=x0, y0=y0)
    if name in ("mbtfps", "mbt_fps"):
        # the reference's bundled mproj registers this family under the
        # underscore spellings (pj_add 'mbt_fps' etc.); same constants
        return McBrydeThomasFlatPolarSine2(a, lon0=lon0, x0=x0, y0=y0)
    if name in ("mbtfpq", "mbt_fpq"):
        return McBrydeThomasFlatPolarQuartic(a, lon0=lon0, x0=x0, y0=y0)
    if name in ("mbtfpp", "mbt_fpp"):
        return McBrydeThomasFlatPolarParabolic(a, lon0=lon0, x0=x0, y0=y0)
    if name == "putp1":
        return PutninsP1(a, lon0=lon0, x0=x0, y0=y0)
    if name in ("putp3", "putp3p"):
        return PutninsP3(a, prime=name.endswith("p"), lon0=lon0,
                         x0=x0, y0=y0)
    if name == "putp4p":
        return PutninsP4P(a, 0.874038744, 3.883251825, lon0=lon0,
                          x0=x0, y0=y0)
    if name == "weren":
        return PutninsP4P(a, 1.0, 4.442882938, lon0=lon0, x0=x0, y0=y0)
    if name in ("putp5", "putp5p"):
        return PutninsP5(a, prime=name.endswith("p"), lon0=lon0,
                         x0=x0, y0=y0)
    if name in ("putp6", "putp6p"):
        return PutninsP6(a, prime=name.endswith("p"), lon0=lon0,
                         x0=x0, y0=y0)
    if name == "urm5":
        if "n" not in p:
            raise ValueError("urm5 requires +n=")
        return UrmaevV(a, n=float(p["n"]), q=float(p.get("q", 0.0)),
                       alpha=float(p.get("alpha", 0.0)) * D2R,
                       lon0=lon0, x0=x0, y0=y0)
    if name == "wink2":
        return WinkelII(a, lat1=float(p.get("lat_1", 0.0)), lon0=lon0,
                        x0=x0, y0=y0)
    if name == "denoy":
        return Denoyer(a, lon0=lon0, x0=x0, y0=y0)
    if name == "natearth2":
        return NaturalEarth2(a, lon0=lon0, x0=x0, y0=y0)
    if name == "geocent":
        return Geocentric(a, x0=x0, y0=y0)
    if name == "airy":
        return Airy(a, lat0=lat0, lat_b=float(p.get("lat_b", 90.0)),
                    no_cut="no_cut" in p, lon0=lon0, x0=x0, y0=y0)
    if name == "gilbert":
        return Gilbert(a, lat1=float(p.get("lat_1", 0.0)), lon0=lon0,
                       x0=x0, y0=y0)
    if name in ("vandg2", "vandg3"):
        return VanDerGrinten2(a, vdg3=(name == "vandg3"), lon0=lon0,
                              x0=x0, y0=y0)
    if name == "vandg4":
        return VanDerGrinten4(a, lon0=lon0, x0=x0, y0=y0)
    if name == "leac":
        # Lambert Equal Area Conic = aea with the second standard
        # parallel at the pole (mproj pj_leac)
        lat1 = float(p.get("lat_1", 45.0))
        lat2 = -90.0 if "south" in p else 90.0
        return AlbersEqualArea(a, es, lat1, lat2, lat0, lon0, x0, y0)
    if name in ("mil_os", "lee_os"):
        # spherical-only variants (the reference forces es = 0)
        coefs, lm0, ph0 = _MOD_STER[name]
        return ModifiedStereographic(a, 0.0, coefs, lm0, ph0, x0=x0, y0=y0)
    if name == "gs48":
        coefs, lm0, ph0 = _MOD_STER[name]
        # fixed sphere radius, like the reference (P.a = 6370997)
        return ModifiedStereographic(6370997.0, 0.0, coefs, lm0, ph0,
                                     x0=x0, y0=y0)
    if name in ("alsk", "gs50"):
        ell = _ALSK_ELL if name == "alsk" else _GS50_ELL
        sph = _ALSK_SPH if name == "alsk" else _GS50_SPH
        lm0, ph0 = (-152.0, 64.0) if name == "alsk" else (-120.0, 45.0)
        if es != 0.0:  # fixed Clarke 1866, like the reference
            return ModifiedStereographic(6378206.4, 0.00676866, ell,
                                         lm0, ph0, x0=x0, y0=y0)
        return ModifiedStereographic(6370997.0, 0.0, sph, lm0, ph0,
                                     x0=x0, y0=y0)
    if name == "gins8":
        return Ginsburg8(a, lon0=lon0, x0=x0, y0=y0)
    if name == "nzmg":
        return NewZealandMapGrid(x0=float(p["x_0"]) if "x_0" in p else None,
                                 y0=float(p["y_0"]) if "y_0" in p else None)
    if name == "chamb":
        if not all(f"lat_{i}" in p and f"lon_{i}" in p for i in (1, 2, 3)):
            raise ValueError("chamb requires +lat_1/+lon_1 .. "
                             "+lat_3/+lon_3")
        pts = [(float(p[f"lat_{i}"]), float(p[f"lon_{i}"]))
               for i in (1, 2, 3)]
        return ChamberlinTrimetric(a, pts, lon0=lon0, x0=x0, y0=y0)
    if name == "qsc":
        return QuadrilateralizedSphericalCube(a, es, lat0=lat0, lon0=lon0,
                                              x0=x0, y0=y0)
    if name in ("healpix", "rhealpix"):
        return Healpix(a, es, rhealpix=(name == "rhealpix"),
                       north_square=int(p.get("north_square", 0)),
                       south_square=int(p.get("south_square", 0)),
                       lon0=lon0, x0=x0, y0=y0)
    if name == "ocea":
        if "alpha" in p:
            return ObliqueCylindricalEqualArea(
                a, k0=k0, alpha=float(p["alpha"]),
                lonc=float(p.get("lonc", 0.0)), x0=x0, y0=y0)
        if not all(k in p for k in ("lat_1", "lat_2", "lon_1", "lon_2")):
            raise ValueError("ocea requires +alpha= (+lonc=) or "
                             "+lat_1/+lat_2/+lon_1/+lon_2")
        return ObliqueCylindricalEqualArea(
            a, k0=k0, lat1=float(p["lat_1"]), lat2=float(p["lat_2"]),
            lon1=float(p["lon_1"]), lon2=float(p["lon_2"]), x0=x0, y0=y0)
    if name in ("tissot", "murd1", "murd2", "murd3", "euler", "pconic",
                "vitk1"):
        if "lat_1" not in p or "lat_2" not in p:
            raise ValueError(f"{name} requires +lat_1= and +lat_2=")
        return SimpleConic(name, a, float(p["lat_1"]), float(p["lat_2"]),
                           lat0=lat0, lon0=lon0, x0=x0, y0=y0)
    raise ValueError(f"unknown projection definition: {defn}")


def get_transform(src: str | Projection, dest: str | Projection):
    """(lng/lat or x/y arrays) -> arrays transform through src.inv -> dest.fwd
    (internal.getProjTransform, mapshaper-proj.js:111-126, incl. the
    latlong clamp of source longitudes)."""
    sp = get_projection(src) if isinstance(src, str) else src
    dp = get_projection(dest) if isinstance(dest, str) else dest
    if not sp.is_latlong and not sp.has_inverse:
        # mproj raises the same way for its inverse-less pj_list members
        raise ValueError(
            "source projection has no inverse (forward-only, like the "
            "reference's mproj entry) — cannot reproject FROM it")

    def tf(x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if sp.is_latlong:
            # clampSrc: only LAT-LONG source longitudes snap to bounds
            # (mapshaper-proj.js:113-120)
            x = np.clip(x, -180.0, 180.0)
        else:
            x, y = sp.inv(x, y)
            # adjlon: PROJ WRAPS inverted longitudes into [-180, 180)
            # (lon -200 from a +lon_0=-96 source is +160, not -180 — the
            # old clamp corrupted antimeridian crossings by 20 degrees)
            x = np.where((x < -180.0) | (x >= 180.0),
                         ((x + 180.0) % 360.0) - 180.0, x)
        if dp.is_latlong:
            return x, y
        return dp.fwd(x, y)

    return tf
