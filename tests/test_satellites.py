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


# -- full SGP4 (near-earth) ---------------------------------------------------

# The classic verification TLE from the published SGP4 test suite
# ("Revisiting Spacetrack Report #3", Vallado et al. 2006, sat 00005 /
# 1958-002B) with its published WGS72 TEME check states.
SAT5_L1 = "1 00005U 58002B   00179.78495062  .00000023  00000-0  28098-4 0  4753"
SAT5_L2 = "2 00005  34.2682 348.7242 1859667 331.7664  19.3264 10.82419157413667"
SAT5_VECTORS = [
    # tsince_min, r_teme (km), v_teme (km/s)
    (0.0, (7022.46529266, -1400.08296755, 0.03995155),
     (1.893841015, 6.405893759, 4.534807250)),
    (360.0, (-7154.03120202, -3783.17682504, -3536.19412294),
     (4.741887409, -4.151817765, -2.093935425)),
    (720.0, (-7134.59340119, 6531.68641334, 3260.27186483),
     (-4.113793027, -2.911922039, -2.557327851)),
    (1080.0, (5568.53901181, 4492.06992591, 3863.87641983),
     (-4.209106476, 5.159719888, 2.744852980)),
    (1440.0, (-938.55923943, -6268.18748831, -4294.02924751),
     (7.536105209, -0.427127707, 0.989878080)),
]


def test_sgp4_published_verification_vectors():
    """Full 24 h against the published SGP4 check states: < 1 m position
    error (the round-4 'done' criterion is < 1 km; a correct SGP4 hits
    floating-point agreement)."""
    from pydsproutines_tpu.estimation.satellites import SGP4Propagator
    prop = SGP4Propagator(parse_tle(SAT5_L1, SAT5_L2), WGS72)
    ts = np.array([row[0] for row in SAT5_VECTORS])
    r, v = prop.teme_posvel_tsince(ts)
    for i, (_, r_exp, v_exp) in enumerate(SAT5_VECTORS):
        assert np.linalg.norm(r[i] - np.asarray(r_exp)) < 1e-3   # km
        assert np.linalg.norm(v[i] - np.asarray(v_exp)) < 1e-6   # km/s


def test_sgp4_drag_term_active():
    """B* drag must produce a quadratically-growing along-track offset vs a
    zero-B* clone of the same TLE (decay lowers the orbit, which advances
    the satellite along track ~ t^2). ISS bstar 3.9e-5 gives ~1 km at
    1 day, ~100 km at 10 days."""
    import dataclasses
    from pydsproutines_tpu.estimation.satellites import SGP4Propagator
    tle = parse_tle(ISS_L1, ISS_L2)
    p = SGP4Propagator(tle, WGS72)
    p0 = SGP4Propagator(dataclasses.replace(tle, bstar=0.0), WGS72)
    offs = []
    for d in (1.0, 10.0):
        t = np.array([d * 1440.0])
        r, _ = p.teme_posvel_tsince(t)
        r0, _ = p0.teme_posvel_tsince(t)
        offs.append(np.linalg.norm(r - r0))
    assert 0.1 < offs[0] < 10.0                       # ~1 km at 1 day
    assert 50.0 < offs[1] < 500.0                     # ~100 km at 10 days
    assert offs[1] > 20 * offs[0]                     # superlinear growth


def test_satellite_routes_leo_to_sgp4_and_geo_to_sdp4():
    leo = Satellite(ISS_L1, ISS_L2)
    assert leo.backend == "native-sgp4"
    geo = Satellite(K7_L1, K7_L2)
    assert geo.backend == "native-sdp4"               # round 5: real SDP4
    # full wrapper chain still works through the SGP4 backend
    gc = sf_propagate_satellite_to_gpstime(leo, 1575806000.0)
    ecef = sf_geocentric_to_itrs(gc)
    alt_km = np.linalg.norm(ecef[:, 0]) / 1e3 - 6378.137
    assert 300.0 < alt_km < 500.0                     # ISS altitude band


def test_sgp4_vs_j2_agree_near_epoch():
    """The two native backends describe the same orbit: within a few km of
    each other near epoch (J2 lacks periodics, ~ km-scale), diverging
    slowly after."""
    from pydsproutines_tpu.estimation.satellites import SGP4Propagator
    tle = parse_tle(ISS_L1, ISS_L2)
    sg = SGP4Propagator(tle, WGS72)
    j2 = J2Propagator(tle, WGS72)
    t = np.array([0.0, 10.0, 30.0])
    r_s, _ = sg.teme_posvel_tsince(t)
    r_j, _ = j2.teme_posvel(tle.epoch_unix + t * 60.0)
    err = np.linalg.norm(r_s - r_j, axis=1)
    assert err.max() < 30.0                           # same orbit
    assert err.max() > 1e-3                           # but not same model


# classic Spacetrack Report #3 deep-space (SDP4) test satellite: highly
# eccentric 10.5 h orbit exercising the lunisolar secular + periodic terms
SDP_L1 = "1 11801U          80230.29629788  .01431103  00000-0  14311-3      13"
SDP_L2 = "2 11801  46.7916 230.4354 7318036  47.4722  10.4117  2.28537848    13"


def test_sdp4_epoch_matches_published_check_state():
    """SDP4 at epoch vs the published deep-space verification state for
    satellite 11801 (r = [7473.371, 428.947, 5828.748] km): the full
    lunisolar periodic machinery (dscom + dpper) feeds this value — a
    sub-10 m agreement pins every coefficient."""
    from pydsproutines_tpu.estimation.satellites import SGP4Propagator
    p = SGP4Propagator(parse_tle(SDP_L1, SDP_L2, validate_checksum=False),
                       WGS72)
    assert p.deep
    r, v = p.teme_posvel_tsince(np.array([0.0]))
    assert np.linalg.norm(
        r[0] - np.array([7473.371, 428.947, 5828.748])) < 0.01   # km
    assert np.linalg.norm(
        v[0] - np.array([5.107155, 6.444680, -0.186133])) < 1e-4


def test_sdp4_geo_resonance_stays_bounded():
    """24 h geosynchronous resonance (irez=1): the integrated mean motion
    must keep the orbit at GEO radius (~42164 km) for a month, with the
    resonance libration bounded (a free-running error integrator diverges
    visibly at this horizon)."""
    from pydsproutines_tpu.estimation.satellites import SGP4Propagator
    p = SGP4Propagator(parse_tle(K7_L1, K7_L2), WGS72)
    assert p.deep and p.ds["irez"] == 1
    t = np.linspace(0.0, 30 * 1440.0, 200)
    r, v = p.teme_posvel_tsince(t)
    rad = np.linalg.norm(r, axis=1)
    assert np.all(np.isfinite(rad))
    assert np.all(np.abs(rad - 42164.0) < 100.0)
    speed = np.linalg.norm(v, axis=1)
    assert np.all(np.abs(speed - 3.0747) < 0.02)      # km/s circular GEO


def test_sdp4_molniya_resonance_band():
    """12 h eccentric resonance (irez=2): a Molniya TLE must engage the
    d-coefficient integrator and keep apogee/perigee physical over a
    week."""
    from pydsproutines_tpu.estimation.satellites import SGP4Propagator
    # real Molniya 1-91 geometry: i=63.2 deg, e=0.72, 2.006 rev/day
    l1 = "1 25485U 98054A   23217.00000000  .00000000  00000-0  00000-0 0  9990"
    l2 = "2 25485  63.2000 280.0000 7200000 270.0000  20.0000  2.00600000    10"
    p = SGP4Propagator(parse_tle(l1, l2, validate_checksum=False), WGS72)
    assert p.deep and p.ds["irez"] == 2
    t = np.linspace(0.0, 7 * 1440.0, 300)
    r, _ = p.teme_posvel_tsince(t)
    rad = np.linalg.norm(r, axis=1)
    assert np.all(np.isfinite(rad))
    assert rad.min() > 6378.0 + 400.0                 # perigee above ground
    assert 38000.0 < rad.max() < 48000.0              # Molniya apogee band


def test_sdp4_lunisolar_secular_differs_from_j2():
    """The deep-space secular terms must actually act: over 10 days a GEO
    orbit's SDP4 path deviates km-scale from the J2-only propagation (and
    the deviation is smooth, not integrator noise)."""
    from pydsproutines_tpu.estimation.satellites import (J2Propagator,
                                                         SGP4Propagator)
    tle = parse_tle(K7_L1, K7_L2)
    ps = SGP4Propagator(tle, WGS72)
    pj = J2Propagator(tle, WGS72)
    t_unix = tle.epoch_unix + np.linspace(0, 10 * 86400.0, 50)
    rs, _ = ps.teme_posvel(t_unix)
    rj, _ = pj.teme_posvel(t_unix)
    d = np.linalg.norm(rs - rj, axis=1)
    assert d[-1] > 1.0                                # lunisolar terms act
    assert d.max() < 2000.0                           # but stay physical
