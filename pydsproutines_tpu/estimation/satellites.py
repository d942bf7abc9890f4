"""Satellite ephemeris: TLE parsing, mean-element propagation, TEME->ITRS.

Reference semantics: /root/reference/satelliteRoutines.py (Satellite :28 — an
EarthSatellite with selectable gravity constants,
sf_propagate_satellite_to_gpstime :72, sf_geocentric_to_itrs :104). The
reference delegates the orbital mechanics to the third-party skyfield/sgp4
packages; those are optional here. When they are importable the same wrapper
surface routes to them. When they are not, a native backend keeps the module
fully executable:

* exact TLE field parsing (with checksum verification),
* a FULL near-earth SGP4 propagator (SGP4Propagator: secular J2/J2^2/J4,
  B* drag series, long/short-periodic corrections — the published Vallado
  algorithm, validated against the classic verification vectors to
  sub-metre agreement in tests/test_satellites.py),
* a Brouwer-style secular J2 propagator (J2Propagator) kept as the
  deep-space (period >= 225 min) fallback, where SGP4's near-earth series
  do not apply and full SDP4 is out of scope — km-level accuracy near
  epoch, tens of km over a day,
* IAU-1982 GMST rotation TEME -> ITRS (ECEF), position and velocity.

LEO satellites — the TDOA/FDOA geometry domain this framework feeds — get
true SGP4 fidelity natively. GPS times follow the reference convention:
UTC-locked unix seconds (satelliteRoutines.py:91-95).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

import numpy as np

try:  # pragma: no cover - exercised only where skyfield is installed
    from sgp4.api import Satrec, WGS72 as _SGP4_WGS72
    from skyfield.api import EarthSatellite, load
    from skyfield.framelib import itrs as _itrs

    _HAVE_SKYFIELD = True
except ImportError:  # pragma: no cover
    _HAVE_SKYFIELD = False


# -- gravity models ----------------------------------------------------------

@dataclass(frozen=True)
class GravityConstants:
    """Earth gravity model constants (km, s)."""
    mu: float      # km^3/s^2
    re: float      # equatorial radius, km
    j2: float
    j3: float = 0.0
    j4: float = 0.0

    @property
    def ke(self) -> float:
        """sqrt(mu) in earth-radii^1.5 per minute (classic SGP4 units)."""
        return 60.0 / np.sqrt(self.re ** 3 / self.mu)


# TLEs are fitted against WGS72 — the reference defaults to it for the same
# reason (satelliteRoutines.py:14).
WGS72 = GravityConstants(mu=398600.8, re=6378.135, j2=0.001082616,
                         j3=-0.00000253881, j4=-0.00000165597)
WGS84 = GravityConstants(mu=398600.5, re=6378.137, j2=0.00108262998905,
                         j3=-0.00000253215306, j4=-0.00000161098761)


# -- TLE parsing -------------------------------------------------------------

def _tle_checksum(line: str) -> int:
    total = 0
    for ch in line[:68]:
        if ch.isdigit():
            total += int(ch)
        elif ch == "-":
            total += 1
    return total % 10


def _parse_implied_decimal(field: str) -> float:
    """TLE ``+NNNNN-E`` fields: mantissa with implied leading decimal point
    and a signed one-digit power-of-ten exponent."""
    field = field.strip()
    sign = -1.0 if field.startswith("-") else 1.0
    body = field.lstrip("+-")
    mantissa = body[:-2]
    exp = int(body[-2:].replace(" ", "0"))
    if not mantissa:
        return 0.0
    return sign * float("0." + mantissa) * 10.0 ** exp


@dataclass(frozen=True)
class TLE:
    """Parsed two-line element set (angles in radians, mean motion in
    rad/min, epoch as UTC-locked unix seconds)."""
    satnum: int
    epoch_unix: float
    bstar: float
    inclo: float       # inclination
    nodeo: float       # RAAN
    ecco: float        # eccentricity
    argpo: float       # argument of perigee
    mo: float          # mean anomaly
    no_kozai: float    # mean motion, rad/min (Kozai convention, as fitted)
    revnum: int
    line1: str = ""
    line2: str = ""


def parse_tle(line1: str, line2: str, validate_checksum: bool = True) -> TLE:
    """Parse a TLE pair into numeric elements.

    Field layout per the public TLE format specification; checksums are
    verified unless ``validate_checksum=False``.
    """
    line1 = line1.rstrip()
    line2 = line2.rstrip()
    if len(line1) < 69 or len(line2) < 69:
        raise ValueError("TLE lines must be at least 69 characters")
    if line1[0] != "1" or line2[0] != "2":
        raise ValueError("TLE line numbers must be '1' and '2'")
    if validate_checksum:
        for ln in (line1, line2):
            if _tle_checksum(ln) != int(ln[68]):
                raise ValueError(f"TLE checksum mismatch on line: {ln!r}")

    satnum = int(line1[2:7])
    if satnum != int(line2[2:7]):
        raise ValueError("TLE line1/line2 satellite numbers differ")

    # epoch: 2-digit year + fractional day-of-year
    yy = int(line1[18:20])
    year = 2000 + yy if yy < 57 else 1900 + yy
    doy = float(line1[20:32])
    epoch = (_dt.datetime(year, 1, 1, tzinfo=_dt.timezone.utc)
             + _dt.timedelta(days=doy - 1.0))
    epoch_unix = epoch.timestamp()

    bstar = _parse_implied_decimal(line1[53:61])
    inclo = np.deg2rad(float(line2[8:16]))
    nodeo = np.deg2rad(float(line2[17:25]))
    ecco = float("0." + line2[26:33].strip())
    argpo = np.deg2rad(float(line2[34:42]))
    mo = np.deg2rad(float(line2[43:51]))
    no_kozai = float(line2[52:63]) * 2.0 * np.pi / 1440.0  # rev/day -> rad/min
    revnum = int(line2[63:68])
    return TLE(satnum, epoch_unix, bstar, inclo, nodeo, ecco, argpo, mo,
               no_kozai, revnum, line1, line2)


# -- native J2 secular propagator -------------------------------------------

class J2Propagator:
    """Brouwer-style secular J2 mean-element propagator over a TLE.

    Carries the dominant secular terms SGP4 carries (RAAN regression, argp
    advance, mean-anomaly rate correction, Kozai->Brouwer mean-motion
    recovery) without the short/long-periodic or drag series. See module
    docstring for the accuracy statement.
    """

    def __init__(self, tle: TLE, const: GravityConstants = WGS72):
        self.tle = tle
        self.const = const
        k2 = const.j2 / 2.0  # earth radii^2
        cosi = np.cos(tle.inclo)
        cosi2 = cosi * cosi
        e2 = tle.ecco ** 2
        beta = np.sqrt(1.0 - e2)

        # Kozai -> Brouwer mean motion (standard element-recovery step of the
        # published SGP4 initialization; units: earth radii / minute).
        no = tle.no_kozai
        a1 = (const.ke / no) ** (2.0 / 3.0)
        d1 = 1.5 * k2 * (3.0 * cosi2 - 1.0) / (a1 ** 2 * beta ** 3)
        a0 = a1 * (1.0 - d1 / 3.0 - d1 ** 2 - 134.0 / 81.0 * d1 ** 3)
        d0 = 1.5 * k2 * (3.0 * cosi2 - 1.0) / (a0 ** 2 * beta ** 3)
        self.n_rad_min = no / (1.0 + d0)           # Brouwer mean motion
        self.a_er = (const.ke / self.n_rad_min) ** (2.0 / 3.0)
        self.a_km = self.a_er * const.re

        # secular rates (rad/min)
        p = self.a_er * beta ** 2                  # semilatus rectum, er
        fac = 1.5 * const.j2 * (1.0 / p) ** 2 * self.n_rad_min
        self.node_dot = -fac * cosi
        self.argp_dot = fac * (2.0 - 2.5 * np.sin(tle.inclo) ** 2)
        self.m_dot = self.n_rad_min * (
            1.0 + 1.5 * const.j2 * (1.0 / p) ** 2 * beta
            * (1.0 - 1.5 * np.sin(tle.inclo) ** 2))

    @staticmethod
    def _kepler(mean_anom: np.ndarray, ecc: float, iters: int = 12):
        """Newton solve E - e sin E = M (vectorized)."""
        e_anom = np.where(ecc < 0.8, mean_anom, np.pi * np.ones_like(mean_anom))
        for _ in range(iters):
            f = e_anom - ecc * np.sin(e_anom) - mean_anom
            fp = 1.0 - ecc * np.cos(e_anom)
            e_anom = e_anom - f / fp
        return e_anom

    def teme_posvel(self, t_unix) -> tuple[np.ndarray, np.ndarray]:
        """TEME position (km) and velocity (km/s), shapes (N, 3)."""
        t_unix = np.atleast_1d(np.asarray(t_unix, dtype=np.float64))
        tsince = (t_unix - self.tle.epoch_unix) / 60.0  # minutes

        ecc = self.tle.ecco
        m = self.tle.mo + self.m_dot * tsince
        node = self.tle.nodeo + self.node_dot * tsince
        argp = self.tle.argpo + self.argp_dot * tsince

        e_anom = self._kepler(np.mod(m, 2.0 * np.pi), ecc)
        cos_e, sin_e = np.cos(e_anom), np.sin(e_anom)
        beta = np.sqrt(1.0 - ecc ** 2)
        # perifocal coordinates (km, km/s)
        r_mag = self.a_km * (1.0 - ecc * cos_e)
        xp = self.a_km * (cos_e - ecc)
        yp = self.a_km * beta * sin_e
        # dE/dt from Kepler's equation; n in rad/s
        n_rad_s = self.n_rad_min / 60.0
        e_dot = n_rad_s * self.a_km / r_mag
        vxp = -self.a_km * sin_e * e_dot
        vyp = self.a_km * beta * cos_e * e_dot

        # perifocal -> TEME: Rz(-node) Rx(-i) Rz(-argp)
        ci, si = np.cos(self.tle.inclo), np.sin(self.tle.inclo)
        cn, sn = np.cos(node), np.sin(node)
        cw, sw = np.cos(argp), np.sin(argp)
        # row vectors of the combined rotation applied to (xp, yp, 0)
        px = cn * cw - sn * sw * ci
        py = -cn * sw - sn * cw * ci
        qx = sn * cw + cn * sw * ci
        qy = -sn * sw + cn * cw * ci
        wx = sw * si
        wy = cw * si
        r = np.stack([px * xp + py * yp,
                      qx * xp + qy * yp,
                      wx * xp + wy * yp], axis=-1)
        v = np.stack([px * vxp + py * vyp,
                      qx * vxp + qy * vyp,
                      wx * vxp + wy * vyp], axis=-1)
        return r, v


# -- native full SGP4 (near-earth) propagator --------------------------------

_TWOPI = 2.0 * np.pi


class DeepSpaceTLE(ValueError):
    """TLE orbital period >= 225 min: needs SDP4 (deep-space) terms."""


class SGP4Propagator:
    """Full near-earth SGP4 mean-element propagator (Vallado revision).

    Implements the complete published near-earth SGP4 algorithm ("Revisiting
    Spacetrack Report #3", Vallado et al. 2006): Kozai->Brouwer element
    recovery, J2/J2^2/J4 secular rates, B* atmospheric-drag series
    (CC1..CC5, D2..D4 with the low-perigee s/q profile adjustments and the
    <220 km "simple" truncation), long-periodic axN/ayN/xL terms, the
    modified-Kepler solve, and the J2 short-periodic corrections — i.e. the
    same model the reference gets from the third-party sgp4 package
    (/root/reference/satelliteRoutines.py:28,72). Validated against the
    classic published verification vectors (tests/test_satellites.py).

    Deep-space orbits (period >= 225 min) need SDP4's resonance + lunisolar
    terms, which are out of scope for the LEO TDOA/FDOA workflows this
    framework targets; constructing one raises DeepSpaceTLE (callers may
    fall back to J2Propagator, as Satellite does, with km-grade accuracy).
    """

    def __init__(self, tle: TLE, const: GravityConstants = WGS72):
        if const.j3 == 0.0 or const.j4 == 0.0:
            raise ValueError("SGP4 needs j3/j4 (use WGS72/WGS84 constants)")
        self.tle = tle
        self.const = const
        c = {}
        j2, j3, j4 = const.j2, const.j3, const.j4
        re_km = const.re
        xke = const.ke
        j3oj2 = j3 / j2
        x2o3 = 2.0 / 3.0

        ecco, inclo = tle.ecco, tle.inclo
        no_kozai = tle.no_kozai
        eccsq = ecco * ecco
        omeosq = 1.0 - eccsq
        rteosq = np.sqrt(omeosq)
        cosio = np.cos(inclo)
        cosio2 = cosio * cosio
        sinio = np.sin(inclo)

        # Kozai -> Brouwer ("un-kozai") mean-motion recovery
        ak = (xke / no_kozai) ** x2o3
        d1 = 0.75 * j2 * (3.0 * cosio2 - 1.0) / (rteosq * omeosq)
        del_ = d1 / (ak * ak)
        adel = ak * (1.0 - del_ * del_
                     - del_ * (1.0 / 3.0 + 134.0 * del_ * del_ / 81.0))
        del_ = d1 / (adel * adel)
        no_unkozai = no_kozai / (1.0 + del_)
        if _TWOPI / no_unkozai >= 225.0:
            raise DeepSpaceTLE(
                f"orbital period {_TWOPI / no_unkozai:.1f} min >= 225 min: "
                "deep-space SDP4 terms required")

        ao = (xke / no_unkozai) ** x2o3
        po = ao * omeosq
        con42 = 1.0 - 5.0 * cosio2
        con41 = -con42 - 2.0 * cosio2          # 3cos^2(i) - 1
        posq = po * po
        rp = ao * (1.0 - ecco)                 # perigee radius, earth radii

        # drag profile: s4 / (q0 - s)^4 with low-perigee adjustment
        sfour = 78.0 / re_km + 1.0
        qzms24 = ((120.0 - 78.0) / re_km) ** 4
        perige = (rp - 1.0) * re_km
        if perige < 156.0:
            sfour = perige - 78.0
            if perige < 98.0:
                sfour = 20.0
            qzms24 = ((120.0 - sfour) / re_km) ** 4
            sfour = sfour / re_km + 1.0
        pinvsq = 1.0 / posq

        tsi = 1.0 / (ao - sfour)
        eta = ao * ecco * tsi
        etasq = eta * eta
        eeta = ecco * eta
        psisq = abs(1.0 - etasq)
        coef = qzms24 * tsi ** 4
        coef1 = coef / psisq ** 3.5
        cc2 = coef1 * no_unkozai * (
            ao * (1.0 + 1.5 * etasq + eeta * (4.0 + etasq))
            + 0.375 * j2 * tsi / psisq * con41
            * (8.0 + 3.0 * etasq * (8.0 + etasq)))
        cc1 = tle.bstar * cc2
        cc3 = 0.0
        if ecco > 1.0e-4:
            cc3 = -2.0 * coef * tsi * j3oj2 * no_unkozai * sinio / ecco
        x1mth2 = 1.0 - cosio2
        cc4 = 2.0 * no_unkozai * coef1 * ao * omeosq * (
            eta * (2.0 + 0.5 * etasq) + ecco * (0.5 + 2.0 * etasq)
            - j2 * tsi / (ao * psisq)
            * (-3.0 * con41 * (1.0 - 2.0 * eeta + etasq * (1.5 - 0.5 * eeta))
               + 0.75 * x1mth2 * (2.0 * etasq - eeta * (1.0 + etasq))
               * np.cos(2.0 * tle.argpo)))
        cc5 = 2.0 * coef1 * ao * omeosq * (
            1.0 + 2.75 * (etasq + eeta) + eeta * etasq)

        cosio4 = cosio2 * cosio2
        temp1 = 1.5 * j2 * pinvsq * no_unkozai
        temp2 = 0.5 * temp1 * j2 * pinvsq
        temp3 = -0.46875 * j4 * pinvsq * pinvsq * no_unkozai
        c["mdot"] = no_unkozai + 0.5 * temp1 * rteosq * con41 \
            + 0.0625 * temp2 * rteosq * (13.0 - 78.0 * cosio2 + 137.0 * cosio4)
        c["argpdot"] = (-0.5 * temp1 * con42
                        + 0.0625 * temp2
                        * (7.0 - 114.0 * cosio2 + 395.0 * cosio4)
                        + temp3 * (3.0 - 36.0 * cosio2 + 49.0 * cosio4))
        xhdot1 = -temp1 * cosio
        c["nodedot"] = xhdot1 + (0.5 * temp2 * (4.0 - 19.0 * cosio2)
                                 + 2.0 * temp3 * (3.0 - 7.0 * cosio2)) * cosio
        c["omgcof"] = tle.bstar * cc3 * np.cos(tle.argpo)
        c["xmcof"] = 0.0
        if ecco > 1.0e-4:
            c["xmcof"] = -x2o3 * coef * tle.bstar / eeta
        c["nodecf"] = 3.5 * omeosq * xhdot1 * cc1
        c["t2cof"] = 1.5 * cc1
        # xlcof: guarded against the i ~ 180 deg singularity
        denom = 1.0 + cosio if abs(1.0 + cosio) > 1.5e-12 else 1.5e-12
        c["xlcof"] = -0.25 * j3oj2 * sinio * (3.0 + 5.0 * cosio) / denom
        c["aycof"] = -0.5 * j3oj2 * sinio
        c["delmo"] = (1.0 + eta * np.cos(tle.mo)) ** 3
        c["sinmao"] = np.sin(tle.mo)
        c["x7thm1"] = 7.0 * cosio2 - 1.0

        c["isimp"] = rp < (220.0 / re_km + 1.0)
        c["d2"] = c["d3"] = c["d4"] = 0.0
        c["t3cof"] = c["t4cof"] = c["t5cof"] = 0.0
        if not c["isimp"]:
            cc1sq = cc1 * cc1
            c["d2"] = 4.0 * ao * tsi * cc1sq
            temp = c["d2"] * tsi * cc1 / 3.0
            c["d3"] = (17.0 * ao + sfour) * temp
            c["d4"] = 0.5 * temp * ao * tsi * (221.0 * ao + 31.0 * sfour) * cc1
            c["t3cof"] = c["d2"] + 2.0 * cc1sq
            c["t4cof"] = 0.25 * (3.0 * c["d3"]
                                 + cc1 * (12.0 * c["d2"] + 10.0 * cc1sq))
            c["t5cof"] = 0.2 * (3.0 * c["d4"] + 12.0 * cc1 * c["d3"]
                                + 6.0 * c["d2"] ** 2
                                + 15.0 * cc1sq * (2.0 * c["d2"] + cc1sq))
        c.update(no_unkozai=no_unkozai, ao=ao, cc1=cc1, cc4=cc4, cc5=cc5,
                 eta=eta, con41=con41, x1mth2=x1mth2, xke=xke, re_km=re_km)
        self.c = c
        self.n_rad_min = no_unkozai
        self.a_km = ao * re_km

    def teme_posvel_tsince(self, tsince_min):
        """TEME position (km) and velocity (km/s) at minutes since epoch;
        vectorized over ``tsince_min``, shapes (N, 3)."""
        c = self.c
        tle = self.tle
        t = np.atleast_1d(np.asarray(tsince_min, dtype=np.float64))

        # secular gravity + atmospheric drag
        xmdf = tle.mo + c["mdot"] * t
        argpdf = tle.argpo + c["argpdot"] * t
        nodedf = tle.nodeo + c["nodedot"] * t
        argpm = argpdf
        mm = xmdf
        t2 = t * t
        nodem = nodedf + c["nodecf"] * t2
        tempa = 1.0 - c["cc1"] * t
        tempe = tle.bstar * c["cc4"] * t
        templ = c["t2cof"] * t2
        if not c["isimp"]:
            delomg = c["omgcof"] * t
            delmtemp = 1.0 + c["eta"] * np.cos(xmdf)
            delm = c["xmcof"] * (delmtemp ** 3 - c["delmo"])
            temp = delomg + delm
            mm = xmdf + temp
            argpm = argpdf - temp
            t3 = t2 * t
            t4 = t3 * t
            tempa = tempa - c["d2"] * t2 - c["d3"] * t3 - c["d4"] * t4
            tempe = tempe + tle.bstar * c["cc5"] * (np.sin(mm) - c["sinmao"])
            templ = templ + c["t3cof"] * t3 \
                + t4 * (c["t4cof"] + t * c["t5cof"])
        am = c["ao"] * tempa ** 2
        nm = c["xke"] / am ** 1.5
        em_raw = tle.ecco - tempe
        # reference error semantics (sgp4 package, as wrapped by
        # /root/reference/satelliteRoutines.py:28): mean motion <= 0 or
        # eccentricity >= 1 is a propagation error — flag the sample
        # instead of silently returning garbage (samples NaN-masked below)
        bad = (nm <= 0.0) | (em_raw >= 1.0) | (em_raw < -0.001)
        em = np.maximum(em_raw, 1.0e-6)
        mm = mm + c["no_unkozai"] * templ
        xlm = mm + argpm + nodem
        nodem = np.mod(nodem, _TWOPI)
        argpm = np.mod(argpm, _TWOPI)
        xlm = np.mod(xlm, _TWOPI)
        mm = np.mod(xlm - argpm - nodem, _TWOPI)

        sinip = np.sin(tle.inclo)
        cosip = np.cos(tle.inclo)

        # long-periodic terms
        ep, argpp, nodep, mp = em, argpm, nodem, mm
        axnl = ep * np.cos(argpp)
        temp = 1.0 / (am * (1.0 - ep * ep))
        aynl = ep * np.sin(argpp) + temp * c["aycof"]
        xl = mp + argpp + nodep + temp * c["xlcof"] * axnl

        # modified-Kepler solve for E + omega
        u = np.mod(xl - nodep, _TWOPI)
        eo1 = u.copy()
        for _ in range(12):
            sineo1 = np.sin(eo1)
            coseo1 = np.cos(eo1)
            tem5 = 1.0 - coseo1 * axnl - sineo1 * aynl
            tem5 = (u - aynl * coseo1 + axnl * sineo1 - eo1) / tem5
            eo1 = eo1 + np.clip(tem5, -0.95, 0.95)
        sineo1 = np.sin(eo1)
        coseo1 = np.cos(eo1)

        # short-periodic corrections
        ecose = axnl * coseo1 + aynl * sineo1
        esine = axnl * sineo1 - aynl * coseo1
        el2 = axnl * axnl + aynl * aynl
        pl = am * (1.0 - el2)
        rl = am * (1.0 - ecose)
        rdotl = np.sqrt(am) * esine / rl
        rvdotl = np.sqrt(pl) / rl
        betal = np.sqrt(1.0 - el2)
        temp = esine / (1.0 + betal)
        sinu = am / rl * (sineo1 - aynl - axnl * temp)
        cosu = am / rl * (coseo1 - axnl + aynl * temp)
        su = np.arctan2(sinu, cosu)
        sin2u = 2.0 * cosu * sinu
        cos2u = 1.0 - 2.0 * sinu * sinu
        temp = 1.0 / pl
        temp1 = 0.5 * self.const.j2 * temp
        temp2 = temp1 * temp

        mrt = rl * (1.0 - 1.5 * temp2 * betal * c["con41"]) \
            + 0.5 * temp1 * c["x1mth2"] * cos2u
        su = su - 0.25 * temp2 * c["x7thm1"] * sin2u
        xnode = nodep + 1.5 * temp2 * cosip * sin2u
        xinc = tle.inclo + 1.5 * temp2 * cosip * sinip * cos2u
        mvt = rdotl - nm * temp1 * c["x1mth2"] * sin2u / c["xke"]
        rvdot = rvdotl + nm * temp1 * (c["x1mth2"] * cos2u
                                       + 1.5 * c["con41"]) / c["xke"]

        # orientation vectors -> TEME
        sinsu = np.sin(su)
        cossu = np.cos(su)
        snod = np.sin(xnode)
        cnod = np.cos(xnode)
        sini = np.sin(xinc)
        cosi = np.cos(xinc)
        xmx = -snod * cosi
        xmy = cnod * cosi
        ux = xmx * sinsu + cnod * cossu
        uy = xmy * sinsu + snod * cossu
        uz = sini * sinsu
        vx = xmx * cossu - cnod * sinsu
        vy = xmy * cossu - snod * sinsu
        vz = sini * cossu

        re_km = c["re_km"]
        vkmps = re_km * c["xke"] / 60.0
        r = np.stack([mrt * ux, mrt * uy, mrt * uz], axis=-1) * re_km
        v = np.stack([mvt * ux + rvdot * vx,
                      mvt * uy + rvdot * vy,
                      mvt * uz + rvdot * vz], axis=-1) * vkmps
        # decayed-satellite check (reference sgp4 error code 6: mrt < 1.0
        # means the propagated radius is below the Earth's surface): NaN
        # the affected samples rather than returning subterranean states
        bad = bad | (mrt < 1.0)
        if np.any(bad):
            r = np.where(bad[..., None], np.nan, r)
            v = np.where(bad[..., None], np.nan, v)
        return r, v

    def teme_posvel(self, t_unix) -> tuple[np.ndarray, np.ndarray]:
        """TEME position (km) and velocity (km/s), shapes (N, 3) — same
        surface as J2Propagator.teme_posvel."""
        t_unix = np.atleast_1d(np.asarray(t_unix, dtype=np.float64))
        return self.teme_posvel_tsince((t_unix - self.tle.epoch_unix) / 60.0)


# -- earth rotation: TEME -> ITRS --------------------------------------------

_OMEGA_EARTH = 7.29211514670698e-05  # rad/s, IAU-82


def gmst_rad(t_unix) -> np.ndarray:
    """Greenwich mean sidereal time (IAU 1982), radians, UT1 ~= UTC."""
    t_unix = np.atleast_1d(np.asarray(t_unix, dtype=np.float64))
    jd = t_unix / 86400.0 + 2440587.5
    t = (jd - 2451545.0) / 36525.0
    gmst_sec = (67310.54841
                + (876600.0 * 3600.0 + 8640184.812866) * t
                + 0.093104 * t ** 2
                - 6.2e-6 * t ** 3)
    return np.mod(gmst_sec, 86400.0) * (2.0 * np.pi / 86400.0)


def teme_to_itrs(r_teme: np.ndarray, t_unix,
                 v_teme: np.ndarray | None = None):
    """Rotate TEME vectors into ITRS (ECEF) by GMST about +z.

    ``r_teme``: (N, 3) km (any length unit). Velocity, when given, picks up
    the -omega x r earth-rotation term. Polar motion (<1 arcsec) is ignored.
    """
    r_teme = np.atleast_2d(np.asarray(r_teme, dtype=np.float64))
    theta = gmst_rad(t_unix)
    c, s = np.cos(theta), np.sin(theta)
    x = c * r_teme[:, 0] + s * r_teme[:, 1]
    y = -s * r_teme[:, 0] + c * r_teme[:, 1]
    r_itrs = np.stack([x, y, r_teme[:, 2]], axis=-1)
    if v_teme is None:
        return r_itrs
    v_teme = np.atleast_2d(np.asarray(v_teme, dtype=np.float64))
    vx = c * v_teme[:, 0] + s * v_teme[:, 1]
    vy = -s * v_teme[:, 0] + c * v_teme[:, 1]
    v_rot = np.stack([vx, vy, v_teme[:, 2]], axis=-1)
    omega = np.array([0.0, 0.0, _OMEGA_EARTH])
    v_itrs = v_rot - np.cross(np.broadcast_to(omega, r_itrs.shape), r_itrs)
    return r_itrs, v_itrs


# -- reference-parity wrapper surface ----------------------------------------

class NativeGeocentric:
    """Propagated TEME state + times; the native stand-in for skyfield's
    ``Geocentric`` as far as the reference wrapper surface uses it."""

    def __init__(self, r_teme_km: np.ndarray, v_teme_kms: np.ndarray,
                 t_unix: np.ndarray):
        self.r_teme_km = r_teme_km
        self.v_teme_kms = v_teme_kms
        self.t_unix = t_unix

    def itrs_m(self, return_velocity: bool = False):
        if return_velocity:
            r, v = teme_to_itrs(self.r_teme_km, self.t_unix, self.v_teme_kms)
            return r.T * 1e3, v.T * 1e3
        return teme_to_itrs(self.r_teme_km, self.t_unix).T * 1e3


class Satellite:
    """TLE-backed satellite with selectable gravity constants (reference
    Satellite, satelliteRoutines.py:28).

    Uses skyfield/sgp4 when importable (drop-in reference behavior),
    otherwise the native J2 backend. ``backend`` reports which one.
    """

    def __init__(self, line1: str, line2: str, name: str | None = None,
                 ts=None, const: GravityConstants = WGS72):
        self.name = name
        self.tle = parse_tle(line1, line2)
        self.const = const
        if _HAVE_SKYFIELD:  # pragma: no cover
            self.backend = "skyfield"
            sf_const = _SGP4_WGS72  # closest published mapping
            self._sf = EarthSatellite(line1, line2, name=name, ts=ts)
            self._sf.model = Satrec.twoline2rv(line1, line2, sf_const)
            self._sf._setup(self._sf.model)
        else:
            try:
                self._prop = SGP4Propagator(self.tle, const)
                self.backend = "native-sgp4"
            except DeepSpaceTLE:
                # period >= 225 min needs SDP4 (resonance + lunisolar);
                # fall back to the J2-secular backend, km-grade accuracy
                self._prop = J2Propagator(self.tle, const)
                self.backend = "native-j2"

    def at_gpstime(self, gpstime):
        """Propagate to UTC-locked unix second(s); returns a Geocentric
        (skyfield) or NativeGeocentric state."""
        if self.backend == "skyfield":  # pragma: no cover
            return _sf_propagate(self._sf, gpstime)
        t = np.atleast_1d(np.asarray(gpstime, dtype=np.float64))
        r, v = self._prop.teme_posvel(t)
        return NativeGeocentric(r, v, t)


def _sf_propagate(satellite, gpstime):  # pragma: no cover
    ts = load.timescale()
    if isinstance(gpstime, float):
        dd = [_dt.datetime.fromtimestamp(gpstime, tz=_dt.timezone.utc)]
    elif hasattr(gpstime, "__iter__") and not isinstance(gpstime, str):
        dd = [_dt.datetime.fromtimestamp(t, tz=_dt.timezone.utc)
              for t in gpstime]
    else:
        raise TypeError("gpstime must be float or iterable")
    return satellite.at(ts.from_datetimes(dd))


def sf_propagate_satellite_to_gpstime(satellite, gpstime):
    """Propagate a satellite to UTC-locked GPS time(s) (reference
    satelliteRoutines.py:72). Accepts this module's Satellite (either
    backend) or a raw skyfield EarthSatellite."""
    if isinstance(satellite, Satellite):
        return satellite.at_gpstime(gpstime)
    if _HAVE_SKYFIELD:  # pragma: no cover
        return _sf_propagate(satellite, gpstime)
    raise TypeError("expected pydsproutines_tpu Satellite (skyfield absent)")


def sf_geocentric_to_itrs(geocentric, return_velocity: bool = False):
    """Geocentric -> ITRS (ECEF) positions in metres, shaped (3, N)
    (reference satelliteRoutines.py:104)."""
    if isinstance(geocentric, NativeGeocentric):
        return geocentric.itrs_m(return_velocity)
    if _HAVE_SKYFIELD:  # pragma: no cover
        if return_velocity:
            r, v = geocentric.frame_xyz_and_velocity(_itrs)
            return r.m, v.m_per_s
        return geocentric.frame_xyz(_itrs).m
    raise TypeError("expected NativeGeocentric (skyfield absent)")
