import numpy as np
import pytest

from pydsproutines_tpu.estimation import (
    geodetic_lla_to_ecef,
    ecef_to_geodetic_lla,
    get_wgs84_tangent_plane_normal,
    get_wgs84_tangent_plane_north_east,
    calculate_range_rate,
    calculate_doppler,
    grid_search_tdoa_direct,
    grid_search_tdfd_direct,
    grid_search_rtt,
    latlongrid_to_ecef,
    calc_crb_td,
    calc_crb_tdfd,
    project_crb_to_ellipse,
    CRB,
    TDOACRBComponent,
    TOACRBComponent,
    AOA3DCRBComponent,
    average_ellipses_davis,
    average_ellipses_berkeley,
    point_in_ellipse,
)
from pydsproutines_tpu.estimation.geometry import (
    WGS84Spheroid, Sphere, Hyperboloid)
from pydsproutines_tpu.estimation.trajectory import (
    StationaryTrajectory, ConstantVelocityTrajectory, calc_foa,
    create_linear_trajectory, create_circular_trajectory)
from pydsproutines_tpu.estimation.ellipses import ellipse_params_from_cov

C = 299792458.0


def test_lla_ecef_roundtrip():
    lat = np.radians([1.3, 45.0, -33.9])
    lon = np.radians([103.8, -75.0, 18.4])
    h = np.array([15.0, 200.0, 0.0])
    ecef = geodetic_lla_to_ecef(lat, lon, h)
    # equator point sanity: |r| ~ a for h=0 low lat
    lla = ecef_to_geodetic_lla(ecef)
    assert np.allclose(lla[0], np.degrees(lat), atol=1e-9)
    assert np.allclose(lla[1], np.degrees(lon), atol=1e-9)
    assert np.allclose(lla[2], h, atol=1e-4)


def test_tangent_plane_vectors():
    p = geodetic_lla_to_ecef(np.radians(10.0), np.radians(20.0), 0.0)[:, 0]
    n = get_wgs84_tangent_plane_normal(p)
    north, east = get_wgs84_tangent_plane_north_east(n)
    assert abs(np.dot(north, east)) < 1e-12
    assert abs(np.dot(north, n) / np.linalg.norm(n)) < 1e-12
    assert north[2] > 0  # northern hemisphere: north points up-ish
    assert abs(east[2]) < 1e-12  # east has no z component


def test_range_rate_and_doppler():
    tx = np.array([0.0, 0.0, 0.0])
    rx = np.array([1000.0, 0.0, 0.0])
    rxdot = np.array([100.0, 0.0, 0.0])  # receding
    rdot = np.asarray(calculate_range_rate(tx, rx, rx_xdot=rxdot))
    assert np.isclose(float(rdot[0]), 100.0)
    dopp = np.asarray(calculate_doppler(1e9, tx, rx, rx_xdot=rxdot))
    assert np.isclose(float(dopp[0]), -100.0 / C * 1e9)


def _tdoa_scene():
    """Two sensor pairs, target at a known position; tdoa computed exactly."""
    target = np.array([300.0, 400.0, 0.0])
    s1 = np.array([[0.0, 0.0, 0.0], [1000.0, 0.0, 0.0]])
    s2 = np.array([[0.0, 1000.0, 0.0], [1000.0, 1000.0, 0.0]])
    tdoa = (np.linalg.norm(s2 - target, axis=1)
            - np.linalg.norm(s1 - target, axis=1)) / C
    sigma = np.full(2, 1e-9)
    return target, s1, s2, tdoa, sigma


def test_grid_search_tdoa_direct_finds_target():
    target, s1, s2, tdoa, sigma = _tdoa_scene()
    xs = np.arange(0, 1000, 10.0)
    ys = np.arange(0, 1000, 10.0)
    xm, ym = np.meshgrid(xs, ys)
    grid = np.stack([xm.flatten(), ym.flatten(), np.zeros(xm.size)], axis=1)
    cost = np.asarray(grid_search_tdoa_direct(s1, s2, tdoa, sigma, grid))
    best = grid[np.argmin(cost)]
    assert np.linalg.norm(best - target) <= 15.0


def test_grid_search_tdfd_direct():
    target, s1, s2, tdoa, sigma = _tdoa_scene()
    # moving sensors produce FDOA
    s1v = np.tile(np.array([50.0, 0.0, 0.0]), (2, 1))
    s2v = np.tile(np.array([0.0, 50.0, 0.0]), (2, 1))
    fc = 1e9
    d1 = (target - s1) / np.linalg.norm(target - s1, axis=1, keepdims=True)
    d2 = (target - s2) / np.linalg.norm(target - s2, axis=1, keepdims=True)
    vmdiff = np.sum(d2 * s2v, axis=1) - np.sum(d1 * s1v, axis=1)
    fdoa = vmdiff / C * fc
    fd_sigma = np.full(2, 0.01)
    # offset the grid so no grid point coincides with a sensor (zero direction
    # vector -> NaN cost, as in the reference formulation)
    xs = np.arange(5.0, 1000, 10.0)
    xm, ym = np.meshgrid(xs, xs)
    grid = np.stack([xm.flatten(), ym.flatten(), np.zeros(xm.size)], axis=1)
    cost = np.asarray(grid_search_tdfd_direct(
        s1, s2, tdoa, sigma, s1v, s2v, fdoa, fd_sigma, fc, grid))
    best = grid[np.argmin(cost)]
    assert np.linalg.norm(best - target) <= 16.0


def test_grid_search_rtt():
    target = np.array([500.0, 300.0, 0.0])
    tx = np.array([[0.0, 0.0, 0.0], [1000.0, 0.0, 0.0], [0.0, 1000.0, 0.0]])
    toa = 2 * np.linalg.norm(tx - target, axis=1) / C  # monostatic RTT
    # in the reference formulation e_dist = |t-g| + |r-g| with t=r
    sigma = np.full(3, 1e-9)
    xs = np.arange(0, 1000, 5.0)
    xm, ym = np.meshgrid(xs, xs)
    grid = np.stack([xm.flatten(), ym.flatten(), np.zeros(xm.size)], axis=1)
    cost = np.asarray(grid_search_rtt(tx, tx, toa, sigma, grid))
    best = grid[np.argmin(cost)]
    assert np.linalg.norm(best - target) <= 8.0


def test_latlongrid_to_ecef():
    grid, lons, lats = latlongrid_to_ecef(1.0, 103.0, 0.5, 0.5, 5, 7)
    assert grid.shape == (35, 3)
    assert lons.size == 7 and lats.size == 5
    # all points near earth's surface
    r = np.linalg.norm(grid, axis=1)
    assert np.all((r > 6.3e6) & (r < 6.4e6))


def test_calc_crb_td_consistency():
    """CRB from calcCRB_TD matches the component framework. Uses 3 pairs with
    z-diversity so the 3x3 FIM is nonsingular."""
    x = np.array([300.0, 400.0, 50.0])
    s = np.array([[0, 0, 0], [1000, 0, 0], [0, 1000, 0], [800, 900, 400],
                  [500, -200, 800], [-300, 600, 100]], dtype=np.float64)
    sig_td = np.array([1e-9, 2e-9, 1.5e-9])
    sig_r = sig_td * C
    crb1, fim1 = calc_crb_td(x, s.T, sig_r)

    crb = CRB()
    for k in range(3):
        crb.add_component(
            TDOACRBComponent(x, 1 / sig_td[k] ** 2, s[2 * k: 2 * k + 2]))
    fim2 = crb.fim()
    # calcCRB_TD convention: R[:,k] = r_dx[pair0] - r_dx[pair1];
    # TDOACRBComponent: r_dx[1]-r_dx[0] — FIMs are identical (sign squared)
    assert np.allclose(fim1, fim2, rtol=1e-9)
    assert np.allclose(crb1, crb.compute(), rtol=1e-6)


def test_crb_tdfd_and_constraint():
    """4 pairs with geometry + velocity diversity make the 6x6 FIM
    invertible."""
    rng = np.random.default_rng(4)
    x = np.array([300.0, 400.0, 50.0])
    xdot = np.array([10.0, -5.0, 2.0])
    s = rng.uniform(-1000, 1000, (8, 3)).T
    sdot = rng.uniform(-50, 50, (8, 3)).T
    sig_r = np.full(4, 1.0)
    sig_rdot = np.full(4, 0.1)
    crb6 = calc_crb_tdfd(x, s, sig_r, xdot, sdot, sig_rdot)
    assert crb6.shape == (6, 6)
    assert np.all(np.isfinite(crb6))
    assert np.all(np.diag(crb6) > 0)


def test_toa_aoa_components():
    x = np.array([100.0, 200.0, 300.0])
    s = np.array([0.0, 0.0, 0.0])
    toa = TOACRBComponent(x, 1e18, s)
    assert toa.fim().shape == (3, 3)
    aoa = AOA3DCRBComponent(x, 1e-3, s)
    f = aoa.fim()
    assert f.shape == (3, 3)
    # AOA gives no information along the radial direction
    radial = (x - s) / np.linalg.norm(x - s)
    assert abs(radial @ f @ radial) < 1e-6 * np.abs(f).max()


def test_project_crb_to_ellipse():
    crb = np.diag([4.0, 1.0, 0.01])
    pos = np.array([10.0, 20.0, 0.0])
    ell = project_crb_to_ellipse(crb, pos, 0.95)
    assert ell.shape[0] == 3
    center = ell.mean(axis=1)
    assert np.allclose(center[:2], pos[:2], atol=0.5)


def test_average_ellipses():
    mus = np.array([[[0.0], [0.0]], [[2.0], [0.0]]])
    covs = np.array([np.eye(2), np.eye(2)])
    mu_d, cov_d = average_ellipses_davis(mus, covs)
    assert np.allclose(mu_d.flatten(), [1.0, 0.0])
    assert np.allclose(cov_d, np.eye(2) / 2)
    mu_b, cov_b = average_ellipses_berkeley(mus, covs)
    assert np.allclose(mu_b.flatten(), [1.0, 0.0])
    assert cov_b[0, 0] > cov_b[1, 1]  # spread is along x


def test_point_in_ellipse():
    major, minor, angle = ellipse_params_from_cov(np.diag([4.0, 1.0]))
    assert point_in_ellipse([1.0, 0.0], [0, 0], major, minor, angle, 1)
    assert not point_in_ellipse([3.0, 0.0], [0, 0], major, minor, angle, 1)


def test_hyperboloid_from_foci_rangediff():
    """Points on the generated hyperboloid satisfy |s2-x| - |s1-x| = rd."""
    s1 = np.array([-1000.0, 200.0, 50.0])
    s2 = np.array([800.0, -100.0, 300.0])
    rd = 400.0
    h = Hyperboloid.from_foci(s1, s2, rd)
    # foci should map back to s1, s2
    foci = h.foci.T
    d = min(np.linalg.norm(foci[0] - s1), np.linalg.norm(foci[1] - s1))
    assert d < 1e-6
    # sample parametric points on the correct (-c) sheet
    v = np.linspace(0, 1.5, 10)
    theta = np.linspace(0, 2 * np.pi, 10)
    vv, tt = np.meshgrid(v, theta)
    pts_local = np.vstack([h.x(vv.ravel(), tt.ravel()),
                           h.y(vv.ravel(), tt.ravel()),
                           h.z(vv.ravel(), -1)])
    pts = h.transform(pts_local).T
    rdiff = (np.linalg.norm(s2 - pts, axis=1)
             - np.linalg.norm(s1 - pts, axis=1))
    assert np.allclose(rdiff, rd, rtol=1e-9)


def test_wgs84_spheroid_ray_intersection():
    sph = WGS84Spheroid()
    # ray from space toward the centre hits the surface at radius ~ a
    s = np.array([2e7, 0.0, 0.0])
    d = np.array([-1.0, 0.0, 0.0])
    x = sph.intersect_ray(s, d)
    assert x is not None
    assert np.isclose(x[0], 6378137.0, rtol=1e-9)
    # miss
    assert sph.intersect_ray(np.array([2e7, 0, 0]), np.array([0, 0, 1.0])) is None


def test_sphere_intersect_oblate_spheroid():
    # sphere centred on the surface of a spheroid intersects it in a ring
    sph = Sphere(1000.0, mu=np.array([6378137.0, 0.0, 0.0]))
    pts = sph.intersect_oblate_spheroid(np.arange(0.01, np.pi, 0.01),
                                        6378137.0, 6356752.314245)
    # all returned points satisfy the spheroid equation
    val = (pts[0] ** 2 + pts[1] ** 2) / 6378137.0 ** 2 \
        + pts[2] ** 2 / 6356752.314245 ** 2
    assert np.allclose(val, 1.0, atol=1e-9)


def test_trajectories():
    st = StationaryTrajectory(np.array([1.0, 2.0, 3.0]))
    assert np.allclose(st.at([0.0, 5.0]),
                       [[1, 2, 3], [1, 2, 3]])
    cv = ConstantVelocityTrajectory(np.zeros(3), np.array([1.0, 0, 0]))
    assert np.allclose(cv.at([2.0])[0], [2, 0, 0])
    # photon flight time to a stationary receiver
    tau = cv.to(st, np.array([0.0]))
    assert np.isclose(tau[0], np.linalg.norm([1, 2, 3]) / C)

    r_x, r_xdot = create_linear_trajectory(100, np.zeros(3),
                                           np.array([100.0, 0, 0]), 10.0, 0.1)
    assert r_x.shape == (100, 3)
    # speed magnitude constant
    assert np.allclose(np.linalg.norm(r_xdot, axis=1), 10.0)

    c_x, c_xdot, arc, dth = create_circular_trajectory(100)
    assert np.allclose(np.linalg.norm(c_x[:, :2], axis=1), 100000.0)
    assert np.allclose(np.linalg.norm(c_xdot, axis=1), 100.0)


def test_calc_foa():
    r_x = np.array([[0.0, 0, 0]])
    t_x = np.array([[1000.0, 0, 0]])
    r_xdot = np.array([[100.0, 0, 0]])  # moving toward tx
    t_xdot = np.zeros((1, 3))
    foa = calc_foa(r_x, r_xdot, t_x, t_xdot, freq=1e9)
    assert np.isclose(foa[0], 100.0 / C * 1e9)


def test_hyperbola_trace_stays_on_curve():
    """Traced hyperbola points satisfy rdoa == rangediff and pass near the
    true emitter (reference generateHyperbolaXY semantics)."""
    from pydsproutines_tpu.estimation import (generate_hyperbola_xy,
                                              range_difference_of_arrival)
    s1 = np.array([-1000.0, 0.0, 0.0])
    s2 = np.array([1000.0, 0.0, 0.0])
    target = np.array([300.0, 700.0, 0.0])
    rd = (np.linalg.norm(target - s2) - np.linalg.norm(target - s1))
    hyp = generate_hyperbola_xy(200, rd, s1, s2, z=0.0, orthostep=20.0)
    assert hyp.shape == (401, 3)
    errs = np.abs(range_difference_of_arrival(hyp, s1, s2) - rd)
    assert np.max(errs) < 1e-6 * abs(rd) + 1e-6
    # the curve passes through the true position
    assert np.min(np.linalg.norm(hyp - target, axis=1)) < 25.0


def test_blind_linear_rtt_grid_search():
    """Blind linear RTT localizes despite an unknown clock ramp (reference
    gridSearchBlindLinearRTT)."""
    from pydsproutines_tpu.estimation import grid_search_blind_linear_rtt
    C = 299792458.0
    rng = np.random.default_rng(4)
    target = np.array([2500.0, -1200.0, 0.0])
    n = 24
    tx = rng.uniform(-8000, 8000, size=(n, 3)); tx[:, 2] = 0.0
    t = np.linspace(0, 10, n)
    gamma = 2 * np.linalg.norm(tx - target, axis=1) / C
    toa = gamma + 3e-6 * t + 5e-6      # unknown drift + offset
    xr = np.linspace(-5000, 5000, 41)
    yr = np.linspace(-5000, 5000, 41)
    xm, ym = np.meshgrid(xr, yr)
    grid = np.stack([xm.ravel(), ym.ravel(), np.zeros(xm.size)], axis=1)
    cost = np.asarray(grid_search_blind_linear_rtt(
        tx, tx, t, toa, np.full(n, 1e-9), grid))
    best = grid[np.argmin(cost)]
    assert np.linalg.norm(best[:2] - target[:2]) < 300.0


def test_blind_linear_rtt_crb_sane():
    from pydsproutines_tpu.estimation import calc_crb_blind_linear_rtt
    rng = np.random.default_rng(1)
    x = np.array([100.0, 50.0, 10.0])
    s = rng.uniform(-5000, 5000, size=(3, 12))
    t = np.linspace(0, 5, 12)
    crb = calc_crb_blind_linear_rtt(x, s, s, t, np.full(12, 1.0))
    assert crb.shape == (5, 5)
    evals = np.linalg.eigvalsh(crb)
    assert np.all(evals > 0)


def test_grid_localizer_tdoa_mixin():
    """OO localizer: TDMixin.run + localize find the emitter."""
    from pydsproutines_tpu.estimation import TDOAGridLocalizer
    C = 299792458.0
    target = np.array([120.0, -80.0, 0.0])
    sensors = np.array([[1000.0, 0, 0], [-1000, 300, 0],
                        [200, -900, 0], [-400, 800, 0]])
    s1 = np.repeat(sensors[:1], 3, axis=0)
    s2 = sensors[1:]
    td = (np.linalg.norm(s2 - target, axis=1)
          - np.linalg.norm(s1 - target, axis=1)) / C
    loc = TDOAGridLocalizer.from_xy_meshgrid(
        np.linspace(-500, 500, 101), np.linspace(-500, 500, 101))
    cost = loc.run(s1, s2, td, np.full(3, 1e-9))
    best = loc.localize(cost)
    assert np.linalg.norm(best[:2] - target[:2]) < 15.0
    ax, h = loc.plot(cost)
    import matplotlib.pyplot as plt
    plt.close("all")


def test_transceiver_family():
    from pydsproutines_tpu.estimation import Transmitter, Receiver
    t = np.arange(5.0)
    txpos = np.tile([0.0, 500.0, 0.0], (5, 1))
    tx = Transmitter.as_stationary(txpos, t)
    r1 = Receiver.as_stationary(np.tile([-1000.0, 0, 0], (5, 1)), t)
    r2 = Receiver.as_stationary(np.tile([1000.0, 0, 0], (5, 1)), t)
    rd = tx.theoretical_range_diff(r1, r2)
    expected = (np.linalg.norm([1000.0, -500.0, 0])
                - np.linalg.norm([-1000.0, -500.0, 0]))
    np.testing.assert_allclose(rd, expected)
    ax, hyp = tx.plot_hyperbola_flat(r1, r2, idx=0, half_num_pts=50,
                                     orthostep=30.0)
    assert hyp.shape == (101, 3)
    import matplotlib.pyplot as plt
    plt.close("all")


def test_hyperboloid_intersect_oblate_spheroid_small():
    """Curve points lie on both the spheroid and the rangediff sheet
    (reference intersectOblateSpheroid, hyperboloidRoutines.py:346)."""
    s1 = np.array([-3.0, 0.2, 0.5])
    s2 = np.array([3.0, -0.4, 0.1])
    rangediff = 0.8
    h = Hyperboloid.from_foci(s1, s2, rangediff)
    omega, lmbda = 1.0, 0.9
    pts, ve = h.intersect_oblate_spheroid(None, omega, lmbda, num_pts=200)
    assert pts.shape[1] > 50
    res = (pts[0] ** 2 + pts[1] ** 2) / omega ** 2 + pts[2] ** 2 / lmbda ** 2
    assert np.abs(res - 1.0).max() < 1e-9
    rd = (np.linalg.norm(s2[:, None] - pts, axis=0)
          - np.linalg.norm(s1[:, None] - pts, axis=0))
    assert np.abs(rd - rangediff).max() < 1e-9


def test_hyperboloid_intersect_wgs84_ground_curve():
    """TDOA hyperboloid from two GEO satellites through a known ground
    emitter: the WGS84 intersection curve passes near the emitter."""
    a, b = 6378137.0, 6356752.314245
    lat, lon = np.deg2rad(35.0), np.deg2rad(127.0)
    e2 = 1 - (b / a) ** 2
    nrad = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    emitter = np.array([nrad * np.cos(lat) * np.cos(lon),
                        nrad * np.cos(lat) * np.sin(lon),
                        nrad * (1 - e2) * np.sin(lat)])
    r_geo = 42164e3
    sat1 = r_geo * np.array([np.cos(np.deg2rad(116.0)),
                             np.sin(np.deg2rad(116.0)), 0.0])
    sat2 = r_geo * np.array([np.cos(np.deg2rad(113.0)),
                             np.sin(np.deg2rad(113.0)), 0.0])
    rd_true = np.linalg.norm(sat2 - emitter) - np.linalg.norm(sat1 - emitter)
    h = Hyperboloid.from_foci(sat1, sat2, rd_true)
    pts, ve = h.intersect_oblate_spheroid(num_pts=500)
    assert pts.shape[1] > 100
    # every curve point on the WGS84 surface
    res = (pts[0] ** 2 + pts[1] ** 2) / a ** 2 + pts[2] ** 2 / b ** 2
    assert np.abs(res - 1.0).max() < 1e-9
    # and on the hyperboloid sheet (rangediff preserved to sub-micron)
    rdc = (np.linalg.norm(sat2[:, None] - pts, axis=0)
           - np.linalg.norm(sat1[:, None] - pts, axis=0))
    assert np.abs(rdc - rd_true).max() < 1e-3
    # curve passes within one v-grid step of the true emitter
    dmin = np.linalg.norm(pts - emitter[:, None], axis=0).min()
    assert dmin < 50e3
