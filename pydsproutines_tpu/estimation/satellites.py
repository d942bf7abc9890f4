"""Satellite ephemeris wrappers (SGP4/skyfield).

Reference semantics: /root/reference/satelliteRoutines.py (Satellite :28 — an
EarthSatellite with selectable gravity constants, sf_propagate_satellite_to_
gpstime :72, sf_geocentric_to_itrs :104).

skyfield/sgp4 are optional third-party dependencies (not available in every
deployment); this module mirrors the reference's thin wrapper surface and
raises a clear ImportError with guidance when they are absent. The rest of the
framework (TDOA/FDOA geometry, ECEF conversions) is independent of them —
pydsproutines_tpu.estimation.coords supplies the LLA<->ECEF math natively.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np

try:  # pragma: no cover - exercised only where skyfield is installed
    from sgp4.api import Satrec, WGS72
    from skyfield.api import EarthSatellite, load
    from skyfield.framelib import itrs as _itrs

    _HAVE_SKYFIELD = True
except ImportError:  # pragma: no cover
    _HAVE_SKYFIELD = False


def _require_skyfield():
    if not _HAVE_SKYFIELD:
        raise ImportError(
            "satellite routines require the optional 'skyfield' and 'sgp4' "
            "packages; install them to use pydsproutines_tpu.estimation."
            "satellites. All other estimation/geometry functionality is "
            "independent of them.")


if _HAVE_SKYFIELD:  # pragma: no cover

    class Satellite(EarthSatellite):
        """EarthSatellite with selectable gravity constants (reference
        Satellite, satelliteRoutines.py:28; TLEs are WGS72-generated so WGS72
        propagation is more accurate)."""

        def __init__(self, line1, line2, name=None, ts=None, const=WGS72):
            super().__init__(line1, line2, name=name, ts=ts)
            self.model = Satrec.twoline2rv(line1, line2, const)
            self._setup(self.model)

else:

    class Satellite:  # type: ignore[no-redef]
        def __init__(self, *args, **kwargs):
            _require_skyfield()


def sf_propagate_satellite_to_gpstime(satellite, gpstime):
    """Propagate a satellite to UTC-locked GPS time(s); returns the skyfield
    Geocentric position/velocity (reference satelliteRoutines.py:72)."""
    _require_skyfield()
    ts = load.timescale()
    if isinstance(gpstime, float):
        dd = [_dt.datetime.fromtimestamp(gpstime, tz=_dt.timezone.utc)]
    elif hasattr(gpstime, "__iter__") and not isinstance(gpstime, str):
        dd = [_dt.datetime.fromtimestamp(t, tz=_dt.timezone.utc)
              for t in gpstime]
    else:
        raise TypeError("gpstime must be float or iterable")
    t = ts.from_datetimes(dd)
    return satellite.at(t)


def sf_geocentric_to_itrs(geocentric, return_velocity: bool = False):
    """Geocentric -> ITRS (ECEF) positions in metres (reference
    satelliteRoutines.py:104)."""
    _require_skyfield()
    if return_velocity:
        r, v = geocentric.frame_xyz_and_velocity(_itrs)
        return r.m, v.m_per_s
    return geocentric.frame_xyz(_itrs).m
