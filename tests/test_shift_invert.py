"""Shift-invert / interior eigenvalues: blocked MINRES + eigsh(sigma=...).

The reference is exterior-only (LM: benchmark.jl:42); these cover the
beyond-parity interior capability (ops/minres.py, compat.eigsh sigma/SM).
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as sla

import jax
import jax.numpy as jnp

import rbl_tpu as rt
from rbl_tpu.ops.minres import ShiftInvertOperator, block_minres


class TestBlockMinres:
    def test_indefinite_diagonal(self):
        # (A - 37.3 I) is indefinite: eigenvalues straddle the shift
        d = jnp.arange(1.0, 201.0)
        op = rt.DiagonalOperator(d)
        rng = np.random.default_rng(0)
        B = jnp.asarray(rng.standard_normal((200, 4)))
        X, (itn, relres) = block_minres(op.apply, B, shift=37.3, tol=1e-12)
        Xtrue = B / (d - 37.3)[:, None]
        assert float(jnp.max(jnp.abs(X - Xtrue))) < 1e-9
        assert float(jnp.max(relres)) < 1e-11

    def test_laplacian_interior_shift_jits(self):
        lp = rt.Laplacian2D(nx=24, ny=24)
        rng = np.random.default_rng(1)
        B = jnp.asarray(rng.standard_normal((576, 3)))
        si = ShiftInvertOperator.shift(lp, 1.7, inner_tol=1e-12)
        Y = jax.jit(lambda o, b: o.apply(b))(si, B)
        res = lp.apply(Y) - 1.7 * Y - B
        assert float(jnp.max(jnp.abs(res))) < 1e-9

    def test_breakdown_columns_stay_finite(self):
        # column 0: zero RHS (x = 0); column 1: an eigenvector (exact
        # solution after one step) — neither may produce NaNs
        d = jnp.arange(1.0, 201.0)
        op = rt.DiagonalOperator(d)
        e5 = jnp.where(jnp.arange(200) == 5, 1.0, 0.0)
        B = jnp.stack([jnp.zeros(200), e5], axis=1)
        X, (itn, relres) = block_minres(op.apply, B, shift=37.3, tol=1e-12)
        assert bool(jnp.all(jnp.isfinite(X)))
        assert float(jnp.max(jnp.abs(X[:, 0]))) == 0.0
        assert float(X[5, 1]) == pytest.approx(1.0 / (6.0 - 37.3), rel=1e-12)

    def test_maxiter_caps(self):
        d = jnp.arange(1.0, 201.0)
        op = rt.DiagonalOperator(d)
        B = jnp.ones((200, 2))
        _, (itn, relres) = block_minres(
            op.apply, B, shift=37.3, tol=1e-14, maxiter=5
        )
        assert int(itn) == 5


class TestEigshSigma:
    def test_interior_matches_scipy(self):
        n = 300
        A = sp.diags(np.arange(1.0, n + 1.0)).tocsr()
        w, v = rt.eigsh(A, k=5, sigma=137.4)
        ws, _ = sla.eigsh(A, k=5, sigma=137.4)
        np.testing.assert_allclose(w, ws, rtol=1e-10)
        # residuals against the original A
        r = A @ v - v * w
        assert np.max(np.abs(r)) < 1e-6

    def test_which_sm_tridiag_laplacian(self):
        lp = sp.diags([-1, 2.0, -1], [-1, 0, 1], shape=(400, 400)).tocsr()
        w = rt.eigsh(lp, k=4, which="SM", return_eigenvectors=False)
        ws = sla.eigsh(lp, k=4, which="SM", return_eigenvectors=False)
        # scipy sorts no-vector SM results by DESCENDING |λ|; match it
        np.testing.assert_allclose(w, ws, rtol=1e-8)

    def test_which_sm_with_vectors_ascending(self):
        lp = sp.diags([-1, 2.0, -1], [-1, 0, 1], shape=(300, 300)).tocsr()
        w, v = rt.eigsh(lp, k=3, which="SM")
        assert np.all(np.diff(w) > 0)  # ascending algebraic
        r = lp @ v - v * w
        assert np.max(np.abs(r)) < 1e-6

    def test_sigma_la_sa_sides(self):
        # LA with sigma: eigenvalues just ABOVE σ; SA: just below
        n = 200
        A = sp.diags(np.arange(1.0, n + 1.0)).tocsr()
        w_above = rt.eigsh(
            A, k=3, sigma=50.5, which="LA", return_eigenvectors=False
        )
        np.testing.assert_allclose(np.sort(w_above), [51.0, 52.0, 53.0],
                                   rtol=1e-9)
        w_below = rt.eigsh(
            A, k=3, sigma=50.5, which="SA", return_eigenvectors=False
        )
        np.testing.assert_allclose(np.sort(w_below), [48.0, 49.0, 50.0],
                                   rtol=1e-9)

    def test_unsupported_modes_raise(self):
        A = sp.eye(50, format="csr") * 2.0
        with pytest.raises(NotImplementedError):
            rt.eigsh(A, k=2, sigma=1.0, mode="buckling")
        with pytest.raises(NotImplementedError):
            rt.eigsh(A, k=2, sigma=1.0, which="SM")
        with pytest.raises(NotImplementedError):
            rt.eigsh(A, k=2, sigma=1.0, which="BE")
