#!/usr/bin/env python
"""LEO satellite TDOA geolocation walkthrough: native SGP4 ephemeris ->
TDOA hyperboloid -> WGS84 ground curve.

The scenario the reference's satellite + hyperboloid modules exist for
(/root/reference/satelliteRoutines.py + hyperboloidRoutines.py): a ground
emitter is heard by two LEO relay satellites; the measured time-difference
of arrival constrains the emitter to a hyperboloid whose foci are the
satellite positions, and intersecting that sheet with the WGS84 spheroid
yields the ground location curve. Round 4 makes this fully native: the
ephemeris comes from the built-in SGP4 propagator (no third-party sgp4 /
skyfield), validated against the published check states to sub-metre.

Usage: python examples/satellite_tdoa_geolocation.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from pydsproutines_tpu.estimation.geometry import Hyperboloid
from pydsproutines_tpu.estimation.satellites import (
    Satellite, sf_geocentric_to_itrs, sf_propagate_satellite_to_gpstime)

C_LIGHT = 299792458.0

# Two LEO TLEs (public orbital data; epochs December 2019)
ISS_L1 = "1 25544U 98067A   19343.69339541  .00001764  00000-0  38792-4 0  9991"
ISS_L2 = "2 25544  51.6439 211.2001 0007417  17.6667  85.6398 15.50103472202482"
# A second nearby LEO: reuse the ISS elements with a shifted mean anomaly /
# RAAN to stand in for a trailing relay (keeps the example self-contained)
REL_L1 = ISS_L1
REL_L2 = "2 25544  51.6439 212.9001 0007417  17.6667  95.6398 15.50103472202481"


def main():
    t_gps = 1575806000.0   # UTC-locked unix seconds (reference convention)

    sats = []
    for l1, l2 in ((ISS_L1, ISS_L2), (REL_L1, REL_L2)):
        s = Satellite(l1, l2)
        assert s.backend == "native-sgp4", s.backend
        gc = sf_propagate_satellite_to_gpstime(s, t_gps)
        ecef_m = sf_geocentric_to_itrs(gc)[:, 0]
        sats.append(ecef_m)
        lat = np.rad2deg(np.arcsin(ecef_m[2] / np.linalg.norm(ecef_m)))
        lon = np.rad2deg(np.arctan2(ecef_m[1], ecef_m[0]))
        alt = np.linalg.norm(ecef_m) / 1e3 - 6378.137
        print(f"sat @ lat {lat:7.2f}  lon {lon:8.2f}  alt {alt:7.1f} km "
              f"(backend {s.backend})")
    s1, s2 = sats

    # ground-truth emitter: the sub-satellite point of the midpoint,
    # projected to the WGS84 surface
    mid = 0.5 * (s1 + s2)
    a, b = 6378137.0, 6356752.314245
    scale = 1.0 / np.sqrt((mid[0] ** 2 + mid[1] ** 2) / a ** 2
                          + mid[2] ** 2 / b ** 2)
    emitter = mid * scale
    tdoa_true = (np.linalg.norm(s2 - emitter)
                 - np.linalg.norm(s1 - emitter)) / C_LIGHT
    print(f"truth emitter ECEF (km): {np.round(emitter / 1e3, 1)}")
    print(f"true TDOA: {tdoa_true * 1e6:.3f} us")

    # invert: hyperboloid from the measured TDOA, intersect with WGS84
    hyp = Hyperboloid.from_foci(s1, s2, tdoa_true * C_LIGHT)
    pts, _ = hyp.intersect_oblate_spheroid(num_pts=400)
    # the truth must sit on the recovered ground curve
    dmin = np.min(np.linalg.norm(pts.T - emitter, axis=1))
    print(f"ground curve: {pts.shape[1]} points; "
          f"closest approach to truth {dmin / 1e3:.3f} km")
    # curve points must lie on the spheroid and honor the TDOA
    on_spheroid = np.abs((pts[0] ** 2 + pts[1] ** 2) / a ** 2
                         + pts[2] ** 2 / b ** 2 - 1.0).max()
    td_err = np.abs((np.linalg.norm(s2 - pts.T, axis=1)
                     - np.linalg.norm(s1 - pts.T, axis=1)) / C_LIGHT
                    - tdoa_true).max()
    print(f"max spheroid residual {on_spheroid:.2e}, "
          f"max TDOA residual {td_err * 1e9:.3f} ns")
    assert dmin < 5e3 and on_spheroid < 1e-6 and td_err < 1e-9
    print("OK")


if __name__ == "__main__":
    main()
