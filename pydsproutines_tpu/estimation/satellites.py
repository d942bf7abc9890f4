"""Satellite ephemeris: TLE parsing, mean-element propagation, TEME->ITRS.

Reference semantics: /root/reference/satelliteRoutines.py (Satellite :28 — an
EarthSatellite with selectable gravity constants,
sf_propagate_satellite_to_gpstime :72, sf_geocentric_to_itrs :104). The
reference delegates the orbital mechanics to the third-party skyfield/sgp4
packages; those are optional here. When they are importable the same wrapper
surface routes to them. When they are not, a native backend keeps the module
fully executable:

* exact TLE field parsing (with checksum verification),
* a Brouwer-style secular J2 propagator (Kozai -> Brouwer mean-motion
  recovery, secular RAAN/argp/mean-anomaly rates, Kepler solve,
  perifocal -> TEME rotation),
* IAU-1982 GMST rotation TEME -> ITRS (ECEF), position and velocity.

The native propagator carries the dominant secular J2 terms but not SGP4's
periodic or drag terms: expect km-level accuracy near epoch and tens of km
over a day in LEO — adequate for the geometry workflows this framework feeds
(TDOA hyperboloids, look angles), and stated honestly rather than pretending
to be SGP4. GPS times follow the reference convention: UTC-locked unix
seconds (satelliteRoutines.py:91-95).
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

    @property
    def ke(self) -> float:
        """sqrt(mu) in earth-radii^1.5 per minute (classic SGP4 units)."""
        return 60.0 / np.sqrt(self.re ** 3 / self.mu)


# TLEs are fitted against WGS72 — the reference defaults to it for the same
# reason (satelliteRoutines.py:14).
WGS72 = GravityConstants(mu=398600.8, re=6378.135, j2=0.001082616)
WGS84 = GravityConstants(mu=398600.5, re=6378.137, j2=0.00108262998905)


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
            self.backend = "native-j2"
            self._prop = J2Propagator(self.tle, const)

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
