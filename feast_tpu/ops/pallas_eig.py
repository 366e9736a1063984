"""Whole-Schur Pallas kernel: the complete complex QR eigensolver (Hessenberg
reduction + shifted QR iteration with deflation) in ONE kernel launch.

Why: the XLA formulation (ops/eig.py) is dependency-stage bound on this chip
(~150 us per scalar->vector stage, CLAUDE.md cost model): a 48x48 f32 Schur
costs ~0.21 s across thousands of tiny dispatches, and it is the per-sweep
long pole of the `feast_compiled` coarse tier (solvers/feast.py two_tier).
Inside one Mosaic kernel the same sequential math runs at VPU latencies with
H and Z resident in VMEM.

Semantics mirror ops/eig.py exactly (same Givens/Wilkinson/deflation
formulas; reference: LAPACK zgeev path used by `eigen!` at feast.jl:45) so
the two backends are interchangeable; `eig.set_schur_backend("pallas")`
gates the f32 TPU path.

Mosaic rules this kernel lives by (measured on the real chip, see also
ops/pallas_lu.py): no dynamic LANE-dim slicing (column access is
lane-masked: extract = masked sum, write = masked select), dynamic SUBLANE
(row) pl.ds access is native, no dynamic_slice on values, strictly 32-bit
control scalars (jnp.argmax/python-int fori bounds go int64 under x64 and
Mosaic's i64 conversion recurses), python-unrolled bodies cost ~10 min of
remote compile vs seconds for fori/while bodies.

Transpose trick: Mosaic has no cheap (n,1)->(1,n) transpose; a column v is
re-laid as a row via `sum(v * eye, axis=0)` (one (n,n) elementwise+reduce —
trivial at reduced-eig sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..cx import CX

_INTERPRET = False


def _schur_kernel(n: int, max_sweeps_per_eig: int, stop_after: str = "",
                  want_y: bool = False):
    from jax.experimental import pallas as pl

    def rds(start, size: int = 1):
        return (pl.ds(start, size), slice(None))

    def kernel(ar_in, ai_in, tr_ref, ti_ref, zr_ref, zi_ref, *y_refs):
        # explicit copy-in, NOT input_output_aliases: through the remote
        # axon backend an aliased pallas parameter returned stale/zero
        # results on the first call and corrupted the caller's buffer on
        # repeats (pallas_lu dodges this because its per-panel calls sit
        # inside a jit that feeds them intermediate values, not jit
        # parameters)
        tr_ref[:] = ar_in[:]
        ti_ref[:] = ai_in[:]
        f32 = tr_ref.dtype
        eps = jnp.finfo(f32).eps
        rows2 = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols2 = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        rowsc = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        colsr = lax.broadcasted_iota(jnp.int32, (1, n), 1)
        eye = (rows2 == cols2).astype(f32)
        subm = rows2 == cols2 + 1  # (i+1, i) positions
        zr_ref[:] = eye
        zi_ref[:] = jnp.zeros_like(eye)

        # ---- Hessenberg reduction (ops/eig.py hessenberg, in-kernel) ----
        def hess_step(k, _):
            Hr = tr_ref[:]
            Hi = ti_ref[:]
            kmask = colsr == k
            xr = jnp.sum(jnp.where(kmask, Hr, 0.0), axis=1, keepdims=True)
            xi = jnp.sum(jnp.where(kmask, Hi, 0.0), axis=1, keepdims=True)
            below = rowsc >= k + 1
            xr = jnp.where(below, xr, 0.0)
            xi = jnp.where(below, xi, 0.0)
            normx = jnp.sqrt(jnp.sum(xr * xr + xi * xi))
            sel = rowsc == k + 1
            alr = jnp.sum(jnp.where(sel, xr, 0.0))
            ali = jnp.sum(jnp.where(sel, xi, 0.0))
            amag = jnp.sqrt(alr * alr + ali * ali)
            az_ = amag > 0
            phr = jnp.where(az_, alr / jnp.where(az_, amag, 1.0), 1.0)
            phi = jnp.where(az_, ali / jnp.where(az_, amag, 1.0), 0.0)
            selv = sel.astype(f32)
            vr = xr + selv * (phr * normx)
            vi = xi + selv * (phi * normx)
            vnorm2 = jnp.sum(vr * vr + vi * vi)
            beta = jnp.where(vnorm2 > 0,
                             2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0), 0.0)
            # w = v^H A  (1, n): sublane reduction, no transpose needed
            wr = jnp.sum(vr * Hr + vi * Hi, axis=0, keepdims=True)
            wi = jnp.sum(vr * Hi - vi * Hr, axis=0, keepdims=True)
            # A <- A - beta v w
            Hr = Hr - beta * (vr * wr - vi * wi)
            Hi = Hi - beta * (vr * wi + vi * wr)
            # row layout of v (transpose trick)
            vrr = jnp.sum(vr * eye, axis=0, keepdims=True)
            vri = jnp.sum(vi * eye, axis=0, keepdims=True)
            # u = A v  (n, 1): lane reduction against the row form
            ur = jnp.sum(Hr * vrr - Hi * vri, axis=1, keepdims=True)
            ui = jnp.sum(Hr * vri + Hi * vrr, axis=1, keepdims=True)
            # A <- A - beta u v^H
            tr_ref[:] = Hr - beta * (ur * vrr + ui * vri)
            ti_ref[:] = Hi - beta * (ui * vrr - ur * vri)
            # Z <- Z - beta (Z v) v^H
            Zr = zr_ref[:]
            Zi = zi_ref[:]
            qr_ = jnp.sum(Zr * vrr - Zi * vri, axis=1, keepdims=True)
            qi_ = jnp.sum(Zr * vri + Zi * vrr, axis=1, keepdims=True)
            zr_ref[:] = Zr - beta * (qr_ * vrr + qi_ * vri)
            zi_ref[:] = Zi - beta * (qi_ * vrr - qr_ * vri)
            return jnp.int32(0)

        if n > 2:
            lax.fori_loop(jnp.int32(0), jnp.int32(n - 2), hess_step,
                          jnp.int32(0))
        if stop_after == "hess":
            return

        fnorm = jnp.sqrt(jnp.sum(tr_ref[:] * tr_ref[:]
                                 + ti_ref[:] * ti_ref[:]))
        tolfb = eps * jnp.where(fnorm > 0, fnorm, 1.0)

        # ---- deflation (ops/eig.py schur.deflate, in 2D masks) ----
        def deflate():
            Hr = tr_ref[:]
            Hi = ti_ref[:]
            dabs = jnp.sqrt(jnp.where(rows2 == cols2,
                                      Hr * Hr + Hi * Hi, 0.0))
            drow = jnp.sum(dabs, axis=0, keepdims=True)   # (1,n): |H[c,c]|
            dcol = jnp.sum(dabs, axis=1, keepdims=True)   # (n,1): |H[r,r]|
            # at subdiag position (i+1, i): drow -> |H[i,i]|, dcol ->
            # |H[i+1,i+1]| — the two flanking diagonal magnitudes
            tol2d = eps * (drow + dcol)
            tol2d = jnp.where(tol2d > 0, tol2d, tolfb)
            subabs = jnp.sqrt(jnp.where(subm, Hr * Hr + Hi * Hi, 0.0))
            conv = subm & (subabs <= tol2d)
            tr_ref[:] = jnp.where(conv, 0.0, Hr)
            ti_ref[:] = jnp.where(conv, 0.0, Hi)
            nzm = subm & ~conv
            # jnp.int32(0), not 0: a weak-int literal traces as i64
            # under x64 and Mosaic's i64->i32 conversion recurses
            k = jnp.max(jnp.where(nzm, cols2 + 1, jnp.int32(0)))
            return k.astype(jnp.int32)

        k0 = deflate()
        maxit = jnp.int32(max_sweeps_per_eig * n)

        def extract(k_r, k_c):
            m = (rows2 == k_r) & (cols2 == k_c)
            return (jnp.sum(jnp.where(m, tr_ref[:], 0.0)),
                    jnp.sum(jnp.where(m, ti_ref[:], 0.0)))

        def sweep_cond(state):
            k, it, stag = state
            return (k > 0) & (it < maxit)

        def sweep_body(state):
            k, it, stag = state
            # ---- Wilkinson shift (ops/eig.py _wilkinson_shift) ----
            a_r, a_i = extract(k - 1, k - 1)
            b_r, b_i = extract(k - 1, k)
            g_r, g_i = extract(k, k - 1)
            d_r, d_i = extract(k, k)
            der = (a_r - d_r) * 0.5
            dei = (a_i - d_i) * 0.5
            bgr = b_r * g_r - b_i * g_i
            bgi = b_r * g_i + b_i * g_r
            # t = csqrt(delta^2 + b g)
            t2r = der * der - dei * dei + bgr
            t2i = 2.0 * der * dei + bgi
            mag = jnp.sqrt(t2r * t2r + t2i * t2i)
            tre = jnp.sqrt(jnp.maximum((mag + t2r) * 0.5, 0.0))
            tim_ = jnp.sqrt(jnp.maximum((mag - t2r) * 0.5, 0.0))
            tim = jnp.where(t2i < 0, -tim_, tim_)
            d1r, d1i = der + tre, dei + tim
            d2r, d2i = der - tre, dei - tim
            n1 = d1r * d1r + d1i * d1i
            n2 = d2r * d2r + d2i * d2i
            pick1 = n1 >= n2
            dnr = jnp.where(pick1, d1r, d2r)
            dni = jnp.where(pick1, d1i, d2i)
            dn2 = jnp.where(pick1, n1, n2)
            small = dn2 <= 0.0
            dn2s = jnp.where(small, 1.0, dn2)
            qr_ = jnp.where(small, 0.0, (bgr * dnr + bgi * dni) / dn2s)
            qi_ = jnp.where(small, 0.0, (bgi * dnr - bgr * dni) / dn2s)
            sig_r = d_r - qr_
            sig_i = d_i - qi_
            gabs = jnp.sqrt(g_r * g_r + g_i * g_i)
            # jnp.int32(10): jnp.remainder's arg promotion emits an i64
            # convert for a bare python literal (unlike +/-), and Mosaic's
            # i64 conversion helper recurses
            use_exc = (stag > 0) & (stag % jnp.int32(10) == 0)
            sig_r = jnp.where(use_exc, d_r + 0.75 * gabs, sig_r)
            sig_i = jnp.where(use_exc, d_i, sig_i)

            # subtract shift on the active diagonal.  NOTE: astype(f32),
            # not where(mask, 1.0, 0.0) — under x64 the two weak-f64
            # literals make the where f64, the arithmetic promotes, and
            # the f64->f32 store conversion recurses in Mosaic lowering
            dmaskf = ((rows2 == cols2) & (rows2 <= k)).astype(f32)
            tr_ref[:] = tr_ref[:] - dmaskf * sig_r
            ti_ref[:] = ti_ref[:] - dmaskf * sig_i

            # ---- forward pass: Givens row rotations ----
            def fwd_i(i, carry):
                cvec, svr, svi = carry
                ri_r = tr_ref[rds(i)]
                ri_i = ti_ref[rds(i)]
                rn_r = tr_ref[rds(i + 1)]
                rn_i = ti_ref[rds(i + 1)]
                imask = colsr == i
                ar_ = jnp.sum(jnp.where(imask, ri_r, 0.0))
                ai_ = jnp.sum(jnp.where(imask, ri_i, 0.0))
                br_ = jnp.sum(jnp.where(imask, rn_r, 0.0))
                bi_ = jnp.sum(jnp.where(imask, rn_i, 0.0))
                na2 = ar_ * ar_ + ai_ * ai_
                nb2 = br_ * br_ + bi_ * bi_
                r2 = na2 + nb2
                bz = nb2 == 0
                rr_ = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
                absa = jnp.sqrt(na2)
                az = na2 > 0
                phr = jnp.where(az, ar_ / jnp.where(az, absa, 1.0), 1.0)
                phi = jnp.where(az, ai_ / jnp.where(az, absa, 1.0), 0.0)
                c = jnp.where(bz, 1.0, absa / rr_)
                # s = phase(a) * conj(b) / r
                sr_ = jnp.where(bz, 0.0, (phr * br_ + phi * bi_) / rr_)
                si_ = jnp.where(bz, 0.0, (phi * br_ - phr * bi_) / rr_)
                active = i < k
                c = jnp.where(active, c, 1.0)
                sr_ = jnp.where(active, sr_, 0.0)
                si_ = jnp.where(active, si_, 0.0)
                # top = c*row_i + s*row_{i+1}; bot = c*row_{i+1} -
                # conj(s)*row_i
                top_r = c * ri_r + sr_ * rn_r - si_ * rn_i
                top_i = c * ri_i + sr_ * rn_i + si_ * rn_r
                bot_r = rn_r * c - (sr_ * ri_r + si_ * ri_i)
                bot_i = rn_i * c - (sr_ * ri_i - si_ * ri_r)
                tr_ref[rds(i)] = top_r
                ti_ref[rds(i)] = top_i
                tr_ref[rds(i + 1)] = bot_r
                ti_ref[rds(i + 1)] = bot_i
                imf = imask.astype(f32)
                return (cvec * (1.0 - imf) + imf * c,
                        svr * (1.0 - imf) + imf * sr_,
                        svi * (1.0 - imf) + imf * si_)

            zrow = jnp.zeros((1, n), f32)
            cvec, svr, svi = lax.fori_loop(jnp.int32(0), jnp.int32(n - 1),
                                           fwd_i, (zrow, zrow, zrow))

            # ---- backward pass: column rotations on T and Z ----
            def bwd_i(i, _):
                im0 = colsr == i
                im1 = colsr == i + 1
                c = jnp.sum(jnp.where(im0, cvec, 0.0))
                sr_ = jnp.sum(jnp.where(im0, svr, 0.0))
                si_ = jnp.sum(jnp.where(im0, svi, 0.0))

                def rot(re_ref, im_ref):
                    Mr = re_ref[:]
                    Mi = im_ref[:]
                    ci_r = jnp.sum(jnp.where(im0, Mr, 0.0), axis=1,
                                   keepdims=True)
                    ci_i = jnp.sum(jnp.where(im0, Mi, 0.0), axis=1,
                                   keepdims=True)
                    cj_r = jnp.sum(jnp.where(im1, Mr, 0.0), axis=1,
                                   keepdims=True)
                    cj_i = jnp.sum(jnp.where(im1, Mi, 0.0), axis=1,
                                   keepdims=True)
                    # new_i = c*col_i + conj(s)*col_{i+1}
                    ni_r = c * ci_r + sr_ * cj_r + si_ * cj_i
                    ni_i = c * ci_i + sr_ * cj_i - si_ * cj_r
                    # new_{i+1} = c*col_{i+1} - s*col_i
                    nj_r = c * cj_r - (sr_ * ci_r - si_ * ci_i)
                    nj_i = c * cj_i - (sr_ * ci_i + si_ * ci_r)
                    re_ref[:] = jnp.where(im0, ni_r,
                                          jnp.where(im1, nj_r, Mr))
                    im_ref[:] = jnp.where(im0, ni_i,
                                          jnp.where(im1, nj_i, Mi))

                rot(tr_ref, ti_ref)
                rot(zr_ref, zi_ref)
                return jnp.int32(0)

            lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), bwd_i,
                          jnp.int32(0))

            # restore the shift
            tr_ref[:] = tr_ref[:] + dmaskf * sig_r
            ti_ref[:] = ti_ref[:] + dmaskf * sig_i

            k_new = deflate()
            stag = jnp.where(k_new < k, jnp.int32(0), stag + 1)
            return k_new, it + 1, stag

        lax.while_loop(sweep_cond, sweep_body,
                       (k0, jnp.int32(0), jnp.int32(0)))

        # force exact triangularity (downstream back-substitution)
        tri = cols2 >= rows2
        tr_ref[:] = jnp.where(tri, tr_ref[:], 0.0)
        ti_ref[:] = jnp.where(tri, ti_ref[:], 0.0)

        if not want_y:
            return
        # ---- tri_eigvecs + tri_unit_inv in-kernel (ops/eig.py:273-331)
        # — the two remaining sequential back-substitutions of the f32
        # eig, each a fori of masked full-array ops ----
        yr_ref, yi_ref, xr_ref, xi_ref = y_refs
        yr_ref[:] = eye
        yi_ref[:] = jnp.zeros_like(eye)
        dsel = rows2 == cols2
        lamr = jnp.sum(jnp.where(dsel, tr_ref[:], 0.0), axis=0,
                       keepdims=True)                       # (1,n) diag(T)
        lami = jnp.sum(jnp.where(dsel, ti_ref[:], 0.0), axis=0,
                       keepdims=True)
        tnorm = jnp.sqrt(jnp.sum(tr_ref[:] * tr_ref[:]
                                 + ti_ref[:] * ti_ref[:]))
        smln = eps * jnp.maximum(tnorm, 1.0)

        def y_step(t, _):
            j = jnp.int32(n - 2) - t
            trow_r0 = tr_ref[rds(j)]
            trow_i0 = ti_ref[rds(j)]
            jmask = colsr == j
            cmask = colsr > j
            tjj_r = jnp.sum(jnp.where(jmask, trow_r0, 0.0))
            tjj_i = jnp.sum(jnp.where(jmask, trow_i0, 0.0))
            trow_r = jnp.where(cmask, trow_r0, 0.0)
            trow_i = jnp.where(cmask, trow_i0, 0.0)
            # row -> column layout (transpose trick)
            tcol_r = jnp.sum(trow_r * eye, axis=1, keepdims=True)
            tcol_i = jnp.sum(trow_i * eye, axis=1, keepdims=True)
            Yr = yr_ref[:]
            Yi = yi_ref[:]
            num_r = jnp.sum(tcol_r * Yr - tcol_i * Yi, axis=0,
                            keepdims=True)
            num_i = jnp.sum(tcol_r * Yi + tcol_i * Yr, axis=0,
                            keepdims=True)
            den_r = tjj_r - lamr
            den_i = tjj_i - lami
            dmag = jnp.sqrt(den_r * den_r + den_i * den_i)
            small = dmag < smln
            den_r = jnp.where(small, smln, den_r)
            den_i = jnp.where(small, 0.0, den_i)
            d2 = den_r * den_r + den_i * den_i
            val_r = -(num_r * den_r + num_i * den_i) / d2
            val_i = -(num_i * den_r - num_r * den_i) / d2
            yr_ref[rds(j)] = jnp.where(jmask, 1.0,
                                       jnp.where(cmask, val_r, 0.0))
            yi_ref[rds(j)] = jnp.where(cmask, val_i, 0.0)
            return jnp.int32(0)

        if n > 1:
            lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), y_step,
                          jnp.int32(0))

        # X = Y^{-1} (unit upper triangular): row j = e_j - Y[j,j+1:] X
        xr_ref[:] = eye
        xi_ref[:] = jnp.zeros_like(eye)

        def x_step(t, _):
            j = jnp.int32(n - 2) - t
            yrow_r = yr_ref[rds(j)]
            yrow_i = yi_ref[rds(j)]
            jmask = colsr == j
            cmask = colsr > j
            yrow_r = jnp.where(cmask, yrow_r, 0.0)
            yrow_i = jnp.where(cmask, yrow_i, 0.0)
            ycol_r = jnp.sum(yrow_r * eye, axis=1, keepdims=True)
            ycol_i = jnp.sum(yrow_i * eye, axis=1, keepdims=True)
            Xr = xr_ref[:]
            Xi = xi_ref[:]
            num_r = jnp.sum(ycol_r * Xr - ycol_i * Xi, axis=0,
                            keepdims=True)
            num_i = jnp.sum(ycol_r * Xi + ycol_i * Xr, axis=0,
                            keepdims=True)
            xr_ref[rds(j)] = jnp.where(jmask, 1.0, -num_r)
            xi_ref[rds(j)] = jnp.where(jmask, 0.0, -num_i)
            return jnp.int32(0)

        if n > 1:
            lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), x_step,
                          jnp.int32(0))

    return kernel


@functools.partial(jax.jit, static_argnames=("max_sweeps_per_eig",
                                             "interpret", "stop_after",
                                             "want_y"))
def schur_pallas(A: CX, max_sweeps_per_eig: int = 30,
                 interpret: bool = False, stop_after: str = "",
                 want_y: bool = False):
    """Complex Schur decomposition A = Z T Z^H, one Pallas launch.

    f32 only (Mosaic has no emulated f64); n <= 128 (single lane tile —
    the reduced-eig sizes FEAST uses).  Drop-in for ops/eig.schur.

    want_y=True additionally back-substitutes the triangular
    eigenvectors Y and their unit-triangular inverse X = Y^{-1} inside
    the same launch (ops/eig.py tri_eigvecs / tri_unit_inv semantics)
    and returns (T, Z, Y, X) — the full f32 eig with zero extra
    dispatches."""
    from jax.experimental import pallas as pl

    n = A.shape[0]
    if n == 1:
        one = CX(jnp.ones((1, 1), A.re.dtype),
                 jnp.zeros((1, 1), A.re.dtype))
        if want_y:
            return A, one, one, one
        return A, one
    assert A.re.dtype == jnp.float32, "schur_pallas is f32-only"
    assert n <= 128, "schur_pallas: single lane tile (n <= 128)"
    from jax.experimental.pallas import tpu as pltpu

    kern = _schur_kernel(n, max_sweeps_per_eig, stop_after, want_y)
    # explicit VMEM specs; NO input_output_aliases: through the remote
    # axon backend an aliased jit parameter returned stale/zero results
    # (the kernel copies its input in explicitly)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_out = 8 if want_y else 4
    mat = jax.ShapeDtypeStruct((n, n), A.re.dtype)
    out = pl.pallas_call(
        kern,
        out_shape=(mat,) * n_out,
        in_specs=[vmem, vmem],
        out_specs=(vmem,) * n_out,
        interpret=interpret or _INTERPRET,
    )(A.re, A.im)
    if want_y:
        tr, ti, zr, zi, yr, yi, xr, xi = out
        return CX(tr, ti), CX(zr, zi), CX(yr, yi), CX(xr, xi)
    tr, ti, zr, zi = out
    return CX(tr, ti), CX(zr, zi)
