"""Initial-state configurations for the 2D Riemann problems of
Kurganov & Tadmor, 'Solution of Two-Dimensional Riemann Problems for
Gas Dynamics without Riemann Problem Solvers' (parity with
/root/reference/pysph/examples/gas_dynamics/riemann_2d_config.py).

Each configuration specifies the four constant quadrant states
(w1..w4, counterclockwise from the upper-right) of density, pressure
and velocity; the notation in the paper marks the connecting waves as
shocks (S), rarefactions (R) and contact/slip lines (J).
"""

_CASES = {
    # case: (endtime, ((p, rho, u, v) for quadrants 1..4))
    12: (0.25, ((0.4, 0.5313, 0.0, 0.0),
                (1.0, 1.0, 0.7276, 0.0),
                (1.0, 0.8, 0.0, 0.0),
                (1.0, 1.0, 0.0, 0.7276))),
    2: (0.2, ((1.0, 1.0, 0.0, 0.0),
              (0.4, 0.5197, -0.7259, 0.0),
              (1.0, 1.0, -0.7259, -0.7259),
              (0.4, 0.5197, 0.0, -0.7259))),
    3: (0.3, ((1.5, 1.5, 0.0, 0.0),
              (0.3, 0.5323, 1.206, 0.0),
              (0.029, 0.138, 1.206, 1.206),
              (0.3, 0.5323, 0.0, 1.206))),
    4: (0.25, ((1.1, 1.1, 0.0, 0.0),
               (0.35, 0.5065, 0.8939, 0.0),
               (1.1, 1.1, 0.8939, 0.8939),
               (0.35, 0.5065, 0.0, 0.8939))),
    5: (0.23, ((1.0, 1.0, -0.75, -0.5),
               (1.0, 2.0, -0.75, 0.5),
               (1.0, 1.0, 0.75, 0.5),
               (1.0, 3.0, 0.75, -0.5))),
    6: (0.3, ((1.0, 1.0, 0.75, -0.5),
              (1.0, 2.0, 0.75, 0.5),
              (1.0, 1.0, -0.75, 0.5),
              (1.0, 3.0, -0.75, -0.5))),
    8: (0.25, ((0.4, 0.5197, 0.1, 0.1),
               (1.0, 1.0, -0.6259, 0.1),
               (1.0, 0.8, 0.1, 0.1),
               (1.0, 1.0, 0.1, -0.6259))),
}


class R2DConfig(object):
    def __init__(self, config=3):
        if config not in _CASES:
            raise ValueError('unknown 2D Riemann configuration %r '
                             '(have %s)' % (config, sorted(_CASES)))
        self.config = config
        self.xmin, self.xmax = -0.25, 1.15
        self.ymin, self.ymax = -0.25, 1.15
        self.zmin, self.zmax = 0, 0
        endtime, states = _CASES[config]
        self.endtime = endtime
        for i, (p, rho, u, v) in enumerate(states, start=1):
            setattr(self, 'p%d' % i, p)
            setattr(self, 'rho%d' % i, rho)
            setattr(self, 'u%d' % i, u)
            setattr(self, 'v%d' % i, v)
        self.xmid = 0.5 * (self.xmin + self.xmax)
        self.ymid = 0.5 * (self.ymin + self.ymax)
        rhos = [self.rho1, self.rho2, self.rho3, self.rho4]
        self.rho_max = max(rhos)
        self.rho_min = min(rhos)
