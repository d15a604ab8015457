"""SuiteSparse matrix loading.

The reference's benchmark harness loads ldoor via MAT and hood/audi via
MatrixMarket (benchmark.jl:21-28).  Equivalent here: MatrixMarket via
scipy.io.mmread, MATLAB .mat via scipy.io.loadmat (SuiteSparse .mat files
store the matrix under Problem.A), both returned as symmetric CSR.
"""

from __future__ import annotations

import numpy as np
import scipy.io
import scipy.sparse as sp


def load_matrix(path: str) -> sp.csr_matrix:
    """Load a sparse symmetric matrix from .mtx/.mtx.gz or .mat.

    Plain .mtx files go through the native C++ MatrixMarket parser
    (native/mmio.cpp — one buffered read, in-place tokenization; the
    SuiteSparse benchmark matrices are 100M+ text tokens and scipy's
    Python-side reader is the harness bottleneck), with scipy.io.mmread as
    the fallback for exotic flavors or a missing toolchain."""
    if path.endswith(".mtx"):
        try:
            from ..native import read_matrix_market

            A = read_matrix_market(path)
        except (RuntimeError, OSError):
            A = scipy.io.mmread(path)
    elif path.endswith(".mtx.gz"):
        A = scipy.io.mmread(path)
    elif path.endswith(".mat"):
        m = scipy.io.loadmat(path)
        if "Problem" in m:  # SuiteSparse collection layout
            A = m["Problem"]["A"][0, 0]
        else:
            A = next(v for v in m.values() if sp.issparse(v))
    else:
        raise ValueError(f"unsupported matrix format: {path}")
    A = sp.csr_matrix(A)
    if (abs(A - A.T)).max() > 0:
        A = (A + A.T) * 0.5
    return A


def laplacian_2d(nx: int, ny: int) -> sp.csr_matrix:
    """Explicit sparse 5-point Laplacian (for cross-checks against the
    matrix-free operator)."""
    Ix = sp.eye(nx)
    Iy = sp.eye(ny)
    Dx = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    Dy = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(ny, ny))
    return sp.csr_matrix(sp.kron(Dx, Iy) + sp.kron(Ix, Dy))
