"""Riemann solvers for Godunov SPH (parity with
/root/reference/pysph/sph/gas_dynamics/riemann_solver.py).

Every solver is a pure, batched jnp function
``solver(rhol, rhor, pl, pr, ul, ur, gamma, niter, tol) -> (pstar,
ustar)`` operating elementwise on arrays of any shape.  Iterative
schemes (van Leer, exact) run a fixed ``niter`` Newton iterations —
converged lanes produce vanishing updates, so fixed-trip loops match the
reference's early-exit loops.
"""

import jax
import jax.numpy as jnp

SMALLP = 1e-25


def _sign(x, y):
    """abs(x) carrying the sign of y (reference riemann_solver.py:12)."""
    return jnp.where(y >= 0, jnp.abs(x), -jnp.abs(x))


def non_diffusive(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20,
                  tol=1e-6):
    return 0.5 * (pl + pr), 0.5 * (ul + ur)


def van_leer(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20,
             tol=1e-6):
    """Van Leer iterative solver (reference riemann_solver.py:54)."""
    gamma2 = 1.0 + gamma
    gamma1 = 0.5 * gamma2 / gamma
    Vl = 1.0 / rhol
    Vr = 1.0 / rhor
    cl = jnp.sqrt(gamma * pl * rhol)
    cr = jnp.sqrt(gamma * pr * rhor)
    pstar = pl + (pr - pl - cr * (ur - ul)) * cl / (cl + cr)
    pstar = jnp.maximum(pstar, SMALLP)

    def body(i, carry):
        pstar, wl, wr = carry
        wl = cl * jnp.sqrt(jnp.maximum(
            1.0 + gamma1 * (pstar - pl) / pl, SMALLP))
        wr = cr * jnp.sqrt(jnp.maximum(
            1.0 + gamma1 * (pstar - pr) / pr, SMALLP))
        zl = 4.0 * Vl * wl * wl
        zl = -zl * wl / (zl - gamma2 * (pstar - pl))
        zr = 4.0 * Vr * wr * wr
        zr = zr * wr / (zr - gamma2 * (pstar - pr))
        ustar_l = ul - (pstar - pl) / wl
        ustar_r = ur + (pstar - pr) / wr
        pstar = pstar + (ustar_r - ustar_l) * (zl * zr) / (zr - zl)
        pstar = jnp.maximum(SMALLP, pstar)
        return (pstar, wl, wr)

    pstar, wl, wr = jax.lax.fori_loop(0, niter, body, (pstar, cl, cr))
    ustar_l = ul - (pstar - pl) / wl
    ustar_r = ur + (pstar - pr) / wr
    ustar = 0.5 * (ustar_l + ustar_r)
    bad = (rhol < 0) | (rhor < 0) | (pl < 0) | (pr < 0)
    return (jnp.where(bad, 0.0, pstar), jnp.where(bad, 0.0, ustar))


def _prefun_exact(p, dk, pk, ck, g1, g2, g4, g5, g6):
    """f and f' for the exact solver (reference riemann_solver.py:154)."""
    pratio = p / pk
    f_rare = g4 * ck * (pratio ** g1 - 1.0)
    fd_rare = (1.0 / (dk * ck)) * pratio ** (-g2)
    ak = g5 / dk
    bk = g6 * pk
    qrt = jnp.sqrt(ak / (bk + p))
    f_shock = (p - pk) * qrt
    fd_shock = (1.0 - 0.5 * (p - pk) / (bk + p)) * qrt
    rare = p <= pk
    return (jnp.where(rare, f_rare, f_shock),
            jnp.where(rare, fd_rare, fd_shock))


def exact(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20, tol=1e-6):
    """Toro's exact Riemann solver (reference riemann_solver.py:176)."""
    tmp1 = 1.0 / (2 * gamma)
    tmp2 = 1.0 / (gamma - 1.0)
    tmp3 = 1.0 / (gamma + 1.0)
    g1 = (gamma - 1.0) * tmp1
    g2 = (gamma + 1.0) * tmp1
    g3 = 2 * gamma * tmp2
    g4 = 2 * tmp2
    g5 = 2 * tmp3
    g6 = tmp3 / tmp2
    g7 = 0.5 * (gamma - 1.0)
    cl = jnp.sqrt(gamma * pl / rhol)
    cr = jnp.sqrt(gamma * pr / rhor)

    # guess pressure (PVRS / two-rarefaction / two-shock)
    cup = 0.25 * (rhol + rhor) * (cl + cr)
    ppv = jnp.maximum(0.5 * (pl + pr) + 0.5 * (ul - ur) * cup, 0.0)
    pmin = jnp.minimum(pl, pr)
    pmax = jnp.maximum(pl, pr)
    qmax = pmax / pmin
    pq = (pl / pr) ** g1
    um_g = (pq * ul / cl + ur / cr + g4 * (pq - 1.0)) / \
        (pq / cl + 1.0 / cr)
    ptl = 1.0 + g7 * (ul - um_g) / cl
    ptr = 1.0 + g7 * (um_g - ur) / cr
    pm_rare = 0.5 * (pl * jnp.maximum(ptl, SMALLP) ** g3 +
                     pr * jnp.maximum(ptr, SMALLP) ** g3)
    gel = jnp.sqrt((g5 / rhol) / (g6 * pl + ppv))
    ger = jnp.sqrt((g5 / rhor) / (g6 * pr + ppv))
    pm_shock = (gel * pl + ger * pr - (ur - ul)) / (gel + ger)
    pm = jnp.where((qmax <= 2.0) & (pmin <= ppv) & (ppv <= pmax), ppv,
                   jnp.where(ppv < pmin, pm_rare, pm_shock))
    pm = jnp.maximum(pm, SMALLP)
    udiff = ur - ul

    def body(i, pold):
        fl, fld = _prefun_exact(pold, rhol, pl, cl, g1, g2, g4, g5, g6)
        fr, frd = _prefun_exact(pold, rhor, pr, cr, g1, g2, g4, g5, g6)
        p = pold - (fl + fr + udiff) / (fld + frd)
        return jnp.maximum(p, SMALLP)

    p = jax.lax.fori_loop(0, niter, body, pm)
    fl, _ = _prefun_exact(p, rhol, pl, cl, g1, g2, g4, g5, g6)
    fr, _ = _prefun_exact(p, rhor, pr, cr, g1, g2, g4, g5, g6)
    um = 0.5 * (ul + ur + fr - fl)
    # vacuum generation check (reference returns an error code)
    vacuum = g4 * (cl + cr) <= (ur - ul)
    return jnp.where(vacuum, 0.0, p), jnp.where(vacuum, 0.0, um)


def sample(pm, um, s, rhol, rhor, pl, pr, ul, ur, gamma=1.4):
    """Sample the exact Riemann solution at speed ``s`` = x/t given
    the star-region state (pm, um) from ``exact`` — returns
    (rho, u, p).  Batched select-tree form of the reference's
    branch ladder (reference riemann_solver.py:289); used by
    shocktube post-processing."""
    tmp1 = 1.0 / (2 * gamma)
    tmp2 = 1.0 / (gamma - 1.0)
    tmp3 = 1.0 / (gamma + 1.0)
    g1 = (gamma - 1.0) * tmp1
    g2 = (gamma + 1.0) * tmp1
    g3 = 2 * gamma * tmp2
    g4 = 2 * tmp2
    g5 = 2 * tmp3
    g6 = tmp3 / tmp2
    g7 = 0.5 * (gamma - 1.0)
    cl = jnp.sqrt(gamma * pl / rhol)
    cr = jnp.sqrt(gamma * pr / rhor)

    # ---- left of the contact (s <= um) ----
    # left rarefaction branch
    shl = ul - cl
    cml = cl * (pm / pl) ** g1
    stl = um - cml
    u_fan_l = g5 * (cl + g7 * ul + s)
    c_fan_l = g5 * (cl + g7 * (ul - s))
    rho_fan_l = rhol * (c_fan_l / cl) ** g4
    p_fan_l = pl * (c_fan_l / cl) ** g3
    rho_lr = jnp.where(s <= shl, rhol,
                       jnp.where(s > stl,
                                 rhol * (pm / pl) ** (1.0 / gamma),
                                 rho_fan_l))
    u_lr = jnp.where(s <= shl, ul, jnp.where(s > stl, um, u_fan_l))
    p_lr = jnp.where(s <= shl, pl, jnp.where(s > stl, pm, p_fan_l))
    # left shock branch
    pml = pm / pl
    sl = ul - cl * jnp.sqrt(g2 * pml + g1)
    rho_ls = jnp.where(s <= sl, rhol,
                       rhol * (pml + g6) / (pml * g6 + 1.0))
    u_ls = jnp.where(s <= sl, ul, um)
    p_ls = jnp.where(s <= sl, pl, pm)
    left_rare = pm <= pl
    rho_l = jnp.where(left_rare, rho_lr, rho_ls)
    u_l = jnp.where(left_rare, u_lr, u_ls)
    p_l = jnp.where(left_rare, p_lr, p_ls)

    # ---- right of the contact (s > um) ----
    # right shock branch
    pmr = pm / pr
    sr = ur + cr * jnp.sqrt(g2 * pmr + g1)
    rho_rs = jnp.where(s >= sr, rhor,
                       rhor * (pmr + g6) / (pmr * g6 + 1.0))
    u_rs = jnp.where(s >= sr, ur, um)
    p_rs = jnp.where(s >= sr, pr, pm)
    # right rarefaction branch
    shr = ur + cr
    cmr = cr * (pm / pr) ** g1
    st_r = um + cmr
    u_fan_r = g5 * (-cr + g7 * ur + s)
    c_fan_r = g5 * (cr - g7 * (ur - s))
    rho_fan_r = rhor * (c_fan_r / cr) ** g4
    p_fan_r = pr * (c_fan_r / cr) ** g3
    rho_rr = jnp.where(s >= shr, rhor,
                       jnp.where(s <= st_r,
                                 rhor * (pm / pr) ** (1.0 / gamma),
                                 rho_fan_r))
    u_rr = jnp.where(s >= shr, ur, jnp.where(s <= st_r, um, u_fan_r))
    p_rr = jnp.where(s >= shr, pr, jnp.where(s <= st_r, pm, p_fan_r))
    right_shock = pm > pr
    rho_r = jnp.where(right_shock, rho_rs, rho_rr)
    u_r = jnp.where(right_shock, u_rs, u_rr)
    p_r = jnp.where(right_shock, p_rs, p_rr)

    left = s <= um
    return (jnp.where(left, rho_l, rho_r),
            jnp.where(left, u_l, u_r),
            jnp.where(left, p_l, p_r))


def ducowicz(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20,
             tol=1e-6):
    """Ducowicz approximate solver (reference riemann_solver.py:431)."""
    al = 0.5 * (gamma + 1.0)
    ar = 0.5 * (gamma + 1.0)
    csl = jnp.sqrt(gamma * pl * rhol)
    csr = jnp.sqrt(gamma * pr * rhor)
    umin = ur - 0.5 * csr / ar
    umax = ul + 0.5 * csl / al
    plmin = pl - 0.25 * rhol * csl * csl / al
    prmin = pr - 0.25 * rhor * csr * csr / ar
    bl = rhol * al
    br = rhor * ar
    a = (br - bl) * (prmin - plmin)
    b = br * umin * umin - bl * umax * umax
    c = br * umin - bl * umax
    d = br * bl * (umin - umax) * (umin - umax)

    def pstar_of(ustar):
        p = 0.5 * (plmin + prmin +
                   br * jnp.abs(ustar - umin) * (ustar - umin) -
                   bl * jnp.abs(ustar - umax) * (ustar - umax))
        return jnp.maximum(p, 0.0)

    # case A/B candidates
    ddA = jnp.sqrt(jnp.maximum(0.0, d - a))
    uA = (b + prmin - plmin) / (c - _sign(ddA, umax - umin))
    okA = ((uA - umin) >= 0.0) & ((uA - umax) <= 0.0)
    ddB = jnp.sqrt(jnp.maximum(0.0, d + a))
    uB = (b - prmin + plmin) / (c - _sign(ddB, umax - umin))
    okB = ((uB - umin) <= 0.0) & ((uB - umax) >= 0.0)
    a2 = (bl + br) * (plmin - prmin)
    b2 = bl * umax + br * umin
    c2 = 1.0 / (bl + br)
    ddC = jnp.sqrt(jnp.maximum(0.0, a2 - d))
    uC = (b2 + ddC) * c2
    okC = ((uC - umin) >= 0.0) & ((uC - umax) >= 0.0)
    ddD = jnp.sqrt(jnp.maximum(0.0, -a2 - d))
    uD = (b2 - ddD) * c2
    ustar = jnp.where(okA, uA,
                      jnp.where(okB, uB, jnp.where(okC, uC, uD)))
    return pstar_of(ustar), ustar


def roe(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20, tol=1e-6):
    """Roe's approximate solver (reference riemann_solver.py:528)."""
    rrhol = jnp.sqrt(rhol)
    rrhor = jnp.sqrt(rhor)
    denominator = 1.0 / (rrhor + rrhol)
    plr = (rrhol * pl + rrhor * pr) * denominator
    vlr = (rrhol / rhol + rrhor / rhor) * denominator
    ulr = (rrhol * ul + rrhor * ur) * denominator
    cslr = jnp.sqrt(gamma * plr / vlr)
    cslr1 = 1.0 / cslr
    pstar = plr - 0.5 * (ur - ul) * cslr
    ustar = ulr - 0.5 * (pr - pl) * cslr1
    return pstar, ustar


def llxf(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20, tol=1e-6):
    """Local Lax-Friedrichs (reference riemann_solver.py:575)."""
    gamma1 = 1.0 / (gamma - 1.0)
    csl = jnp.sqrt(gamma * pl * rhol)
    csr = jnp.sqrt(gamma * pr * rhor)
    cslr = jnp.maximum(csr, csl)
    El = pl * gamma1 / rhol + 0.5 * ul * ul
    Er = pr * gamma1 / rhor + 0.5 * ur * ur
    pstar = 0.5 * (pl + pr - cslr * (ur - ul))
    ustar = (0.5 * ((pl * ul + pr * ur) - cslr * (Er - El))) / pstar
    return pstar, ustar


def hllc(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20, tol=1e-6):
    """HLLC solver (reference riemann_solver.py:622)."""
    gamma1 = 1.0 / (gamma - 1.0)
    rrhol = jnp.sqrt(rhol)
    rrhor = jnp.sqrt(rhor)
    ulr = (rrhol * ul + rrhor * ur) / (rrhol + rrhor)
    vl = ul - ulr
    vr = ur - ulr
    csl = jnp.sqrt(gamma * pl / rhol)
    csr = jnp.sqrt(gamma * pr / rhor)
    cslr = (rrhol * csl + rrhor * csr) / (rrhol + rrhor)
    sl = jnp.minimum(vl - csl, -cslr)
    sr = jnp.maximum(vr + csr, cslr)
    sm = (rhor * vr * (sr - vr) - rhol * vl * (sl - vl) + pl - pr) / \
        (rhor * (sr - vr) - rhol * (sl - vl))
    phat = rhol * (vl - sl) * (vl - sm) + pl
    El = rhol * (pl * gamma1 / rhol + 0.5 * ul * ul)
    Er = rhor * (pr * gamma1 / rhor + 0.5 * ur * ur)
    Ml = rhol * ul
    Mr = rhor * ur

    def star(s_, v_, M_, E_, p_):
        m = 1.0 / (s_ - sm) * ((s_ - v_) * M_ + (phat - p_))
        e = 1.0 / (s_ - sm) * ((s_ - v_) * E_ - p_ * v_ + phat * sm)
        ps = sm * m + phat
        us = (sm * e + (sm + ulr) * phat) / ps
        return ps, us

    psl, usl = star(sl, vl, Ml, El, pl)
    psr, usr = star(sr, vr, Mr, Er, pr)
    pstar = jnp.where(sl > 0, pl,
                      jnp.where(sm > 0, psl,
                                jnp.where(sr > 0, psr, pr)))
    ustar = jnp.where(sl > 0, ul,
                      jnp.where(sm > 0, usl,
                                jnp.where(sr > 0, usr, ur)))
    return pstar, ustar


def hllc_ball(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20,
              tol=1e-6):
    """HLLC with Ball wave speeds (reference riemann_solver.py:720)."""
    gamma1 = 0.5 * (gamma + 1.0) / gamma
    csl = jnp.sqrt(gamma * pl / rhol)
    csr = jnp.sqrt(gamma * pr / rhor)
    cslr = 0.5 * (csl + csr)
    rholr = 0.5 * (rhol + rhor)
    pstar = 0.5 * (pl + pr - rholr * cslr * (ur - ul))
    ustar = 0.5 * (ul + ur - 1.0 / (rholr * cslr) * (pr - pl))
    Hl = pstar / pl
    Hr = pstar / pr
    ql = jnp.where(Hl > 1, jnp.sqrt(1 + gamma1 * (Hl - 1.0)), 1.0)
    qr = jnp.where(Hr > 1, jnp.sqrt(1 + gamma1 * (Hr - 1.0)), 1.0)
    Sl = ul - csl * ql
    Sr = ur + csr * qr
    pstar_l = pl + rhol * (ul - Sl) * (ul - ustar)
    pstar_r = pr + rhor * (ur - Sr) * (ur - ustar)
    pstar = 0.5 * (pstar_l + pstar_r)
    return pstar, ustar


def hlle(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20, tol=1e-6):
    """HLLE solver (reference riemann_solver.py:788)."""
    gamma1 = 1.0 / (gamma - 1.0)
    rrhol = jnp.sqrt(rhol)
    rrhor = jnp.sqrt(rhor)
    csl = jnp.sqrt(gamma * pl * rhol)
    csr = jnp.sqrt(gamma * pr * rhor)
    cslr = (rrhol * csl + rrhor * csr) / (rrhol + rrhor)
    sl = jnp.minimum(ul - csl, -cslr)
    sr = jnp.maximum(ur + csr, cslr)
    smax = jnp.maximum(sl, sr)
    smin = jnp.minimum(sl, sr)
    El = pl * gamma1 / rhol + 0.5 * ul * ul
    Er = pr * gamma1 / rhor + 0.5 * ur * ur
    pstar = ((smax * pl - smin * pr) / (smax - smin) +
             smax * smin / (smax - smin) * (ur - ul))
    ustar = ((smax * pl * ul - smin * pr * ur) / (smax - smin) +
             smax * smin / (smax - smin) * (Er - El))
    return pstar, ustar / pstar


def hll_ball(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20,
             tol=1e-6):
    """HLL with Ball wave speeds (reference riemann_solver.py:854)."""
    rrhol = jnp.sqrt(rhol)
    rrhor = jnp.sqrt(rhor)
    denominator = 1.0 / (rrhor + rrhol)
    csl = jnp.sqrt(gamma * pl / rhol)
    csr = jnp.sqrt(gamma * pr / rhor)
    eta = 0.5 * (gamma - 1.0) * (rrhor * rrhol) * denominator * \
        denominator
    betal = jnp.abs(ul)
    betar = jnp.abs(ur)
    ulr = (rrhol * ul + rrhor * ur) / (rrhol * rrhor)
    cslr2 = (rrhol * csl * csl + rrhor * csr * csr) / (rrhol * rrhor)
    cslr = jnp.sqrt(cslr2 + eta * (betar - betal) * (betar - betal))
    Sl = jnp.minimum(ulr - cslr, ul - csl)
    Sr = jnp.maximum(ulr + cslr, ur + csr)
    ustar = ((Sr * Sl * (rhor - rhol) + rhol * ul * Sr -
              rhor * ur * Sl) /
             (rhol * (ul - Sl) + rhor * (Sr - ur)))
    pstar = (pr * (ustar - Sl) - pl * (ustar - Sr) +
             rhor * ur * (ustar - Sl) * (ur - Sr) -
             rhol * ul * (ustar - Sr) * (ul - Sl)) / (Sr - Sl)
    return pstar, ustar


def hllsy(rhol, rhor, pl, pr, ul, ur, gamma=1.4, niter=20, tol=1e-6):
    """HLL of Sirotkin-Yoh 2013 (reference riemann_solver.py:916)."""
    gamma1 = 1.0 / (gamma - 1.0)
    rrhol = jnp.sqrt(rhol)
    rrhor = jnp.sqrt(rhor)
    denominator = 1.0 / (rrhor + rrhol)
    csl = jnp.sqrt(gamma * pl * rhol)
    csr = jnp.sqrt(gamma * pr * rhor)
    cslr = denominator * (rrhol * csl + rrhor * csr)
    bl = jnp.maximum(csl, cslr)
    br = jnp.maximum(csr, cslr)
    wl = br / (bl + br)
    wr = bl / (bl + br)
    wlr = bl * br / (bl + br)
    El = pl * gamma1 / rhol + 0.5 * ul * ul
    Er = pr * gamma1 / rhor + 0.5 * ur * ur
    pstar = wl * pl + wr * pr - wlr * (ur - ul)
    ustar = (wl * (pl * ul) + wr * (pr * ur) - wlr * (Er - El)) / pstar
    return pstar, ustar


SOLVERS = {
    0: non_diffusive, 1: van_leer, 2: exact, 3: hllc, 4: ducowicz,
    5: hlle, 6: roe, 7: llxf, 8: hllc_ball, 9: hll_ball, 10: hllsy,
}


def riemann_solve(method, rhol, rhor, pl, pr, ul, ur, gamma=1.4,
                  niter=20, tol=1e-6):
    """Dispatch by the (static) method id
    (reference riemann_solver.py:19)."""
    return SOLVERS[int(method)](rhol, rhor, pl, pr, ul, ur, gamma,
                                niter, tol)


HELPERS = list(SOLVERS.values())
