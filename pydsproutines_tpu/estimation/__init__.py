"""Estimation / geometry layer (SURVEY.md §2.2): localization grid searches,
CRB framework, coordinates, trajectories, geometry, ellipse fusion,
clustering.

The grid searches are jax (vmap over grid points x measurements — they can be
huge); the small-matrix CRB/geometry algebra is host numpy, like the reference.
"""

from pydsproutines_tpu.estimation.coords import (
    geodetic_lla_to_ecef,
    ecef_to_geodetic_lla,
    get_wgs84_tangent_plane_normal,
    get_wgs84_tangent_plane_north_east,
)
from pydsproutines_tpu.estimation.localization import (
    calculate_range_rate,
    calculate_doppler,
    grid_search_tdoa,
    grid_search_fdoa,
    grid_search_tdoa_direct,
    grid_search_tdfd_direct,
    grid_search_rtt,
    latlongrid_to_ecef,
    calc_crb_td,
    calc_crb_tdfd,
    project_crb_to_ellipse,
)
from pydsproutines_tpu.estimation.crb import (
    CRB,
    TDOACRBComponent,
    TOACRBComponent,
    AOA3DCRBComponent,
)
from pydsproutines_tpu.estimation.ellipses import (
    average_ellipses_davis,
    average_ellipses_berkeley,
    point_in_ellipse,
)

__all__ = [
    "geodetic_lla_to_ecef",
    "ecef_to_geodetic_lla",
    "get_wgs84_tangent_plane_normal",
    "get_wgs84_tangent_plane_north_east",
    "calculate_range_rate",
    "calculate_doppler",
    "grid_search_tdoa",
    "grid_search_fdoa",
    "grid_search_tdoa_direct",
    "grid_search_tdfd_direct",
    "grid_search_rtt",
    "latlongrid_to_ecef",
    "calc_crb_td",
    "calc_crb_tdfd",
    "project_crb_to_ellipse",
    "CRB",
    "TDOACRBComponent",
    "TOACRBComponent",
    "AOA3DCRBComponent",
    "average_ellipses_davis",
    "average_ellipses_berkeley",
    "point_in_ellipse",
]
