"""Satellite ephemeris tests (native backend).

Validation anchors are independent physical truths, not the implementation:
GMST at J2000.0 is a published constant; geostationary satellites must hover
over their published station longitudes at GEO altitude with near-zero ITRS
velocity (TLEs from /root/reference/hyperboloidRoutines.py:546-561 and
satelliteRoutines.py:130-131 __main__ fixtures — public orbital data).
"""

import numpy as np
import pytest

from pydsproutines_tpu.estimation.satellites import (
    J2Propagator, Satellite, WGS72, gmst_rad, parse_tle,
    sf_geocentric_to_itrs, sf_propagate_satellite_to_gpstime, teme_to_itrs)

ISS_L1 = "1 25544U 98067A   19343.69339541  .00001764  00000-0  38792-4 0  9991"
ISS_L2 = "2 25544  51.6439 211.2001 0007417  17.6667  85.6398 15.50103472202482"
K7_L1 = "1 42691U 17023A   23217.40909002 -.00000373  00000+0  00000+0 0  9996"
K7_L2 = "2 42691   0.0264  36.5306 0000462  83.0552  97.2787  1.00273009 22943"
K5_L1 = "1 29349U 06034A   23217.40856704 -.00000369  00000+0  00000+0 0  9996"
K5_L2 = "2 29349   0.0242 184.9282 0001623 321.2519  67.6247  1.00273151 62130"


def test_parse_tle_fields():
    t = parse_tle(ISS_L1, ISS_L2)
    assert t.satnum == 25544
    assert np.isclose(np.rad2deg(t.inclo), 51.6439)
    assert np.isclose(np.rad2deg(t.nodeo), 211.2001)
    assert np.isclose(t.ecco, 0.0007417)
    assert np.isclose(np.rad2deg(t.argpo), 17.6667)
    assert np.isclose(np.rad2deg(t.mo), 85.6398)
    assert np.isclose(t.no_kozai * 1440 / (2 * np.pi), 15.50103472)
    assert t.revnum == 20248
    assert np.isclose(t.bstar, 3.8792e-5)
    # epoch: 2019 day 343.69339541 = Dec 9 2019 ~16:38:29 UTC
    import datetime as dt
    epoch = dt.datetime.fromtimestamp(t.epoch_unix, tz=dt.timezone.utc)
    assert (epoch.year, epoch.month, epoch.day, epoch.hour) == (2019, 12, 9, 16)


def test_parse_tle_checksum_rejected():
    bad = ISS_L1[:68] + "5"
    with pytest.raises(ValueError, match="checksum"):
        parse_tle(bad, ISS_L2)


def test_gmst_j2000():
    # JD 2451545.0 (J2000.0) = unix 946728000; GMST = 280.46061837 deg
    g = np.rad2deg(gmst_rad(946728000.0))[0]
    assert abs(g - 280.46061837) < 1e-6
    # earth rotates ~360.9856 deg per 86400 s UT1
    g2 = np.rad2deg(gmst_rad(946728000.0 + 86400.0))[0]
    assert abs((g2 - g) % 360.0 - 0.9856473) < 1e-4


def test_j2_propagator_leo_orbit_shape():
    t = parse_tle(ISS_L1, ISS_L2)
    p = J2Propagator(t, WGS72)
    # ISS: a ~ 6795 km, v ~ 7.66 km/s, period ~ 92.9 min
    assert abs(p.a_km - 6795.0) < 5.0
    r, v = p.teme_posvel(t.epoch_unix)
    assert abs(np.linalg.norm(r[0]) - p.a_km) < 10.0
    assert abs(np.linalg.norm(v[0]) - 7.66) < 0.05
    period_s = 2 * np.pi / p.n_rad_min * 60.0
    assert abs(period_s / 60.0 - 92.9) < 0.2
    # one orbital period later the TEME position nearly repeats
    r2, _ = p.teme_posvel(t.epoch_unix + period_s)
    assert np.linalg.norm(r2[0] - r[0]) < 50.0  # km; J2 precession residual


def test_geo_satellites_hover_over_station_longitude():
    """KOREASAT 7/5 are stationed at 116E / 113E: the full chain
    (parse -> J2 propagate -> TEME -> GMST -> ITRS) must put them there."""
    for l1, l2, nominal_lon in ((K7_L1, K7_L2, 116.0), (K5_L1, K5_L2, 113.0)):
        sat = Satellite(l1, l2)
        gc = sf_propagate_satellite_to_gpstime(sat, 1691227819.0)
        ecef = sf_geocentric_to_itrs(gc)
        lon = np.rad2deg(np.arctan2(ecef[1, 0], ecef[0, 0]))
        lat = np.rad2deg(np.arcsin(ecef[2, 0] / np.linalg.norm(ecef[:, 0])))
        alt_km = np.linalg.norm(ecef[:, 0]) / 1e3 - 6378.137
        assert abs(lon - nominal_lon) < 0.5
        assert abs(lat) < 0.2
        assert abs(alt_km - 35786.0) < 50.0
        # geostationary: ITRS velocity ~ 0
        _, v = sf_geocentric_to_itrs(gc, return_velocity=True)
        assert np.linalg.norm(v[:, 0]) < 10.0  # m/s


def test_geo_itrs_longitude_stable_over_time():
    sat = Satellite(K7_L1, K7_L2)
    times = 1691227819.0 + np.arange(0, 6 * 3600.0, 1800.0)
    gc = sf_propagate_satellite_to_gpstime(sat, times)
    ecef = sf_geocentric_to_itrs(gc)
    lons = np.rad2deg(np.arctan2(ecef[1], ecef[0]))
    assert np.ptp(lons) < 0.3  # hovers: < 0.3 deg drift over 6 h


def test_teme_to_itrs_velocity_term():
    # a point fixed in TEME acquires -omega x r in ITRS
    t0 = 1691227819.0
    r = np.array([[7000.0, 0.0, 0.0]])
    v = np.zeros((1, 3))
    r_i, v_i = teme_to_itrs(r, t0, v)
    # speed = omega * |r| for equatorial position
    assert np.isclose(np.linalg.norm(v_i), 7.29211514670698e-5 * 7000.0,
                      rtol=1e-6)
    assert np.isclose(np.linalg.norm(r_i), 7000.0)
