"""Schur pressure correction preconditioner (Stokes / Navier–Stokes).

Capability parity with the reference
(amgcl/preconditioner/schur_pressure_correction.hpp:59-373): split the
system by a pressure mask into (u, p) blocks; precondition with the
block factorization

  type 1:  Kuu u = fu;  S p = fp − Kpu u;  Kuu u = fu − Kup p
  type 2:  S p = fp;    Kuu u = fu − Kup p

with the *matrix-free* Schur complement S x = Kpp_adj x − Kpu (Kuu⁻¹) Kup x,
Kuu⁻¹ approximated by the inverted (SIMPLEC) diagonal when approx_schur
is set, else by the nested USolver; the PSolver's preconditioner is built
on the adjusted pressure matrix (adjust_p ∈ {0,1,2} exactly as the
reference).  Nested solvers are this framework's make_solver instances.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from ..ops.formats import from_scipy_auto
from ..ops.spmv import spmv


class SchurPressureCorrection:
    def __init__(
        self,
        K,
        pmask,
        *,
        usolver: dict | None = None,
        psolver: dict | None = None,
        type: int = 1,
        approx_schur: bool = False,
        adjust_p: int = 1,
        simplec_dia: bool = True,
        dtype=jnp.float32,
    ):
        from ..runtime import make_solver_from_config

        K = sp.csr_matrix(K)
        K.sort_indices()
        pmask = np.asarray(pmask, dtype=bool)
        self.type = type
        self.approx_schur = approx_schur

        iu = np.nonzero(~pmask)[0]
        ip = np.nonzero(pmask)[0]
        self.iu_dev = jnp.asarray(iu, dtype=jnp.int32)
        self.ip_dev = jnp.asarray(ip, dtype=jnp.int32)
        self.n = K.shape[0]

        Kuu = sp.csr_matrix(K[iu][:, iu])
        Kup = sp.csr_matrix(K[iu][:, ip])
        Kpu = sp.csr_matrix(K[ip][:, iu])
        Kpp = sp.csr_matrix(K[ip][:, ip])

        # SIMPLEC / diagonal approximation of Kuu^{-1}
        if simplec_dia:
            nu = Kuu.shape[0]
            rows = np.repeat(np.arange(nu), np.diff(Kuu.indptr))
            s = np.bincount(rows, weights=np.abs(Kuu.data), minlength=nu)
        else:
            s = np.abs(Kuu.diagonal())
        s[s == 0] = 1.0
        Mdia = 1.0 / s

        # Adjusted pressure matrix for the PSolver's preconditioner
        # (schur_pressure_correction.hpp adjust_p semantics).
        if adjust_p == 0:
            Padj = Kpp
        else:
            L = sp.csr_matrix(Kpu @ sp.diags(Mdia) @ Kup)
            if adjust_p == 1:
                Padj = sp.csr_matrix(Kpp - sp.diags(L.diagonal()))
            else:
                Padj = sp.csr_matrix(Kpp - L)

        usolver = dict(usolver or {})
        usolver.setdefault("solver", {"type": "preonly"})
        usolver["solver"].setdefault("type", "preonly")
        psolver = dict(psolver or {})
        psolver.setdefault("solver", {"type": "cg", "tol": 1e-2, "maxiter": 16})

        self.U = make_solver_from_config(Kuu, usolver)
        self.Psolve = make_solver_from_config(Padj, psolver)

        dtb = dtype
        self.Kuu = from_scipy_auto(Kuu, dtype=dtb)
        self.Kup = from_scipy_auto(Kup, dtype=dtb)
        self.Kpu = from_scipy_auto(Kpu, dtype=dtb)
        # True Kpp for the Schur action: Padj only preconditions the
        # PSolver (reference keeps a pristine Kpp for its spmv,
        # schur_pressure_correction.hpp:264-271).
        self.Kpp = (
            self.Psolve.A_dev if adjust_p == 0
            else from_scipy_auto(Kpp, dtype=dtb)
        )
        self.M = jnp.asarray(Mdia, dtype=dtb)
        self.K_dev = from_scipy_auto(K, dtype=dtb)

        # Build the matrix-free Schur solve: PSolver's Krylov loop over the
        # S operator, preconditioned by PSolver's own preconditioner.
        from ..solver import make_solver_fn

        p_fn = make_solver_fn(psolver["solver"].get("type", "cg"))
        p_kw = {
            k: v for k, v in psolver["solver"].items() if k != "type"
        }
        self._p_fn, self._p_kw = p_fn, p_kw

    # ------------------------------------------------------------------
    def _usolve(self, fu):
        x, _ = self.U._compiled(
            fu.astype(self.U.A_dev.dtype), jnp.zeros_like(fu, self.U.A_dev.dtype)
        )
        return x.astype(fu.dtype)

    def _schur_op(self, x):
        """S x = Kpp x − Kpu (Kuu⁻¹) Kup x with the *true* Kpp — the
        adjust_p modification applies only to the PSolver's
        preconditioner matrix (reference spmv, hpp:259-284)."""
        y = spmv(self.Kpp, x.astype(self.Kpp.dtype)).astype(x.dtype)
        t = spmv(self.Kup, x)
        if self.approx_schur:
            u = self.M * t
        else:
            u = self._usolve(t)
        return y - spmv(self.Kpu, u)

    def _psolve(self, fp):
        P_prec = self.Psolve.precond
        from .amg import AMG, amg_apply

        if isinstance(P_prec, AMG):
            Pop = lambda r: amg_apply(P_prec.levels, r, P_prec.prm)
        else:
            Pop = P_prec.apply
        x, _ = self._p_fn(self._schur_op, Pop, fp, None, **self._p_kw)
        return x

    def apply(self, r):
        dt = self.Kuu.dtype
        rr = r.astype(dt)
        fu = rr[self.iu_dev]
        fp = rr[self.ip_dev]

        if self.type == 1:
            u = self._usolve(fu)
            fp = fp - spmv(self.Kpu, u)
            p = self._psolve(fp)
            fu2 = fu - spmv(self.Kup, p)
            u = self._usolve(fu2)
        else:
            p = self._psolve(fp)
            u = self._usolve(fu - spmv(self.Kup, p))

        x = jnp.zeros_like(rr)
        x = x.at[self.iu_dev].set(u)
        x = x.at[self.ip_dev].set(p)
        return x.astype(r.dtype)

    def system_matrix(self):
        return self.K_dev

    def __call__(self, r):
        return self.apply(r)
