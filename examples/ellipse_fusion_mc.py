#!/usr/bin/env python
"""Monte-Carlo comparison of the Davis vs Berkeley covariance-ellipse fusion
rules (reference experiment: /root/reference/mit_vs_berkeley.py — samples
noisy position estimates with known covariance, fuses them both ways, and
scores how often the TRUTH lands inside the fused n-sigma ellipse).

Usage: python examples/ellipse_fusion_mc.py [num_trials] [num_ellipses]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from pydsproutines_tpu.estimation.ellipses import (
    average_ellipses_davis, average_ellipses_berkeley,
    ellipse_params_from_cov, point_in_ellipse)


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    num_ellipse = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    rng = np.random.default_rng(0)
    ref_mu = np.zeros(2)
    ref_cov = np.array([[2.0, 0.4], [0.4, 1.0]])
    n_sigma = 2.0

    hits = {"davis": 0, "berkeley": 0}
    areas = {"davis": [], "berkeley": []}
    for _ in range(trials):
        mus = rng.multivariate_normal(ref_mu, ref_cov,
                                      num_ellipse).reshape(-1, 2, 1)
        covs = np.broadcast_to(ref_cov, (num_ellipse, 2, 2)).copy()
        for name, fuse in (("davis", average_ellipses_davis),
                           ("berkeley", average_ellipses_berkeley)):
            mu_f, cov_f = fuse(mus, covs)
            major, minor, ang = ellipse_params_from_cov(cov_f)
            hits[name] += point_in_ellipse(ref_mu.reshape(2, 1), mu_f,
                                           major, minor, ang, n_sigma)
            areas[name].append(np.pi * major * minor * n_sigma ** 2)

    print(f"{trials} trials, {num_ellipse} ellipses each, "
          f"{n_sigma:.0f}-sigma containment of the true position:")
    for name in ("davis", "berkeley"):
        print(f"  {name:9s}: containment {hits[name] / trials:6.1%}, "
              f"mean fused-ellipse area {np.mean(areas[name]):.3f}")
    # Berkeley treats the estimates as independent (covariance shrinks by
    # 1/N); Davis is the conservative intersection-style rule.


if __name__ == "__main__":
    main()
