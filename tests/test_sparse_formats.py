"""Sparse-format operator tests: DIA, blocked-ELL/Pallas BSR (interpret
mode on the CPU test backend), and the auto format selection.  The
reference's only sparse layout is CSC dispatched to vendor libraries
(RBL_gpu.jl:209); here each TPU-native layout is property-tested against
the scipy ground truth."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import rbl_tpu as rt
from rbl_tpu.ops.spmm.dia import DiaOperator, count_diagonals
from rbl_tpu.ops.spmm.ell import SparseEllOperator
from rbl_tpu.ops.spmm.pallas_bsr import BlockSparseOperator


def _banded(n, offs, seed=0):
    rng = np.random.default_rng(seed)
    A = sp.diags([rng.standard_normal(n) for _ in offs], offs, shape=(n, n))
    return ((A + A.T) * 0.5).tocsr()


def _random_sym(n, density, seed=0):
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=rng)
    return ((A + A.T) * 0.5).tocsr()


@pytest.mark.parametrize("offs", [[0], [0, 1, -1], [0, 3, -3, 40, -40]])
def test_dia_matches_scipy(offs):
    n = 200
    A = _banded(n, offs)
    op = DiaOperator.from_scipy(A)
    X = np.random.default_rng(1).standard_normal((n, 5))
    Y = np.asarray(op.apply(jnp.asarray(X)))
    np.testing.assert_allclose(Y, A @ X, atol=1e-12)


def test_dia_rejects_dense_diag_structure():
    A = _random_sym(300, 0.5, seed=2)
    with pytest.raises(ValueError):
        DiaOperator.from_scipy(A, max_diags=16)


def test_count_diagonals():
    A = _banded(100, [0, 2, -2])
    assert count_diagonals(A) == 3


@pytest.mark.parametrize("n", [100, 300, 517])
def test_bsr_pallas_matches_scipy_interpret(n):
    A = _random_sym(n, 0.02, seed=3)
    op = BlockSparseOperator.from_scipy(A, dtype=jnp.float32, interpret=True)
    X = np.random.default_rng(4).standard_normal((n, 8)).astype(np.float32)
    Y = np.asarray(op.apply(jnp.asarray(X)))
    ref = (A @ X.astype(np.float64)).astype(np.float64)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(Y - ref).max() / scale < 1e-5


def test_bsr_blocked_ell_format_roundtrip():
    """The blocked-ELL arrays must reconstruct A exactly (up to the f32
    rounding of the stored values)."""
    from rbl_tpu.ops.spmm.pallas_bsr import _blocked_ell_from_scipy

    A = _random_sym(300, 0.05, seed=5)
    bc, bv, nb, ncb, L = _blocked_ell_from_scipy(A, 128, 128, np.float64)
    D = np.zeros((nb * 128, ncb * 128))
    for i in range(nb):
        for j in range(L):
            D[i * 128 : (i + 1) * 128, bc[i, j] * 128 : (bc[i, j] + 1) * 128] += bv[i, j]
    np.testing.assert_allclose(D[:300, :300], A.toarray(), atol=1e-14)


def test_ell_matches_scipy():
    n = 250
    A = _random_sym(n, 0.03, seed=6)
    op = SparseEllOperator.from_scipy(A)
    X = np.random.default_rng(7).standard_normal((n, 4))
    Y = np.asarray(op.apply(jnp.asarray(X)))
    np.testing.assert_allclose(Y, A @ X, atol=1e-12)


def test_as_operator_auto_selects_dia():
    A = _banded(400, [0, 1, -1, 7, -7])
    op = rt.as_operator(A)
    assert isinstance(op, DiaOperator)


def test_as_operator_auto_falls_back_to_ell_on_cpu():
    """Scattered sparsity with >64 diagonals on the CPU backend → ELL."""
    A = _random_sym(400, 0.05, seed=8)
    op = rt.as_operator(A)
    assert isinstance(op, SparseEllOperator)


def test_dia_solver_end_to_end():
    """Full RBL solve through the DIA path: eigenvalues of a known banded
    matrix vs numpy."""
    n = 400
    A = _banded(n, [0, 1, -1], seed=9)
    w = np.linalg.eigvalsh(A.toarray())
    idx = np.argsort(-np.abs(w))[:4]
    expect = w[idx]
    res = rt.rbl(rt.as_operator(A), 4, 4)
    np.testing.assert_allclose(res.eigenvalues, expect, rtol=1e-9)


def test_bsr_sums_duplicate_coo_entries():
    """Review regression: FEM-assembly-style COO input with duplicate
    entries must sum them (fancy-index scatter alone keeps the last)."""
    rows = np.array([0, 0, 3])
    cols = np.array([1, 1, 2])
    vals = np.array([2.0, 3.0, 7.0])
    A = sp.coo_matrix((vals, (rows, cols)), shape=(8, 8))
    A = A + A.T
    op = BlockSparseOperator.from_scipy(A, dtype=jnp.float32, interpret=True)
    X = np.eye(8, dtype=np.float32)
    Y = np.asarray(op.apply(jnp.asarray(X)))
    np.testing.assert_allclose(Y, A.toarray(), atol=1e-6)


def _skewed_sym(n, seed=0):
    """Sparse background + a few half-dense rows: the row-length skew that
    makes pure ELL pad every row to ~n/2."""
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=0.01, random_state=rng).tolil()
    for r in rng.choice(n, 3, replace=False):
        cols = rng.choice(n, n // 2, replace=False)
        A[r, cols] = rng.standard_normal(len(cols))
    return ((A + A.T) * 0.5).tocsr()


def test_coo_matches_scipy():
    from rbl_tpu.ops.spmm.coo import CooOperator

    A = _random_sym(300, 0.03, seed=5)
    op = CooOperator.from_scipy(A)
    X = np.random.default_rng(1).standard_normal((300, 8))
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(X)), A @ X, rtol=1e-12)


def test_coo_chunked_matches_unchunked():
    import dataclasses

    from rbl_tpu.ops.spmm.coo import CooOperator

    A = _random_sym(300, 0.05, seed=6)
    op = CooOperator.from_scipy(A)
    small = dataclasses.replace(op, _chunk=1024)  # forces the scan path
    assert op.rows.shape[0] > 1024
    X = np.random.default_rng(2).standard_normal((300, 4))
    np.testing.assert_allclose(
        np.asarray(small @ jnp.asarray(X)), np.asarray(op @ jnp.asarray(X)),
        rtol=1e-12,
    )


def test_hyb_matches_scipy_and_spills():
    from rbl_tpu.ops.spmm.coo import HybOperator

    A = _skewed_sym(400, seed=7)
    op = HybOperator.from_scipy(A)
    assert op.coo.nnz > 0                      # the dense rows spilled
    assert op.ell.cols.shape[0] < np.diff(A.indptr).max()  # ELL is capped
    X = np.random.default_rng(3).standard_normal((400, 8))
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(X)), A @ X, rtol=1e-12)
    assert abs(op.nnz - A.nnz) <= 0  # no entries lost or duplicated


def test_hyb_no_spill_degenerates_to_ell():
    from rbl_tpu.ops.spmm.coo import HybOperator

    A = _random_sym(200, 0.05, seed=9)
    op = HybOperator.from_scipy(A, quantile=1.0)
    assert op.coo.nnz == 0
    X = np.random.default_rng(4).standard_normal((200, 4))
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(X)), A @ X, rtol=1e-12)


def test_as_operator_auto_selects_hyb_on_skew():
    from rbl_tpu.ops.spmm.coo import HybOperator

    op = rt.as_operator(_skewed_sym(400, seed=10))
    assert isinstance(op, HybOperator)


def test_hyb_solver_end_to_end():
    import scipy.sparse.linalg as spla

    A = _skewed_sym(500, seed=11)
    op = rt.as_operator(A)
    k = 6
    D, V = rt.RBL(op, k, 4)
    ref = spla.eigsh(A, k=k, which="LM", tol=0)[0]
    ref = ref[np.argsort(-np.abs(ref))]
    np.testing.assert_allclose(D, ref, rtol=1e-9)
    resid = np.linalg.norm(A @ np.asarray(V) - np.asarray(V) * D[None, :], axis=0)
    assert resid.max() < 1e-6 * np.abs(D).max()


def test_ell_dia_bf16_accumulate_in_f32():
    """Sub-f32 inputs must accumulate in f32 across ALL formats (the _pet
    upcast): a bf16 scan over ~n products per row loses ~L·2⁻⁸ relative.
    ELL and DIA are checked against the f64 ground truth at a tolerance a
    raw-bf16 accumulation fails by an order of magnitude."""
    n, b = 256, 4
    rng = np.random.default_rng(12)
    # one dense band: every row sums ~n/4 products — accumulation-hostile
    A = _banded(n, list(range(-24, 25)), seed=12)
    X = rng.standard_normal((n, b))
    Xb = jnp.asarray(X, dtype=jnp.bfloat16)
    ref = A @ np.asarray(Xb, dtype=np.float64)
    scale = np.abs(ref).max()
    for op in (
        SparseEllOperator.from_scipy(A, dtype=np.float32),
        DiaOperator.from_scipy(A, dtype=np.float32),
    ):
        out = np.asarray(op @ Xb, dtype=np.float64)
        assert np.abs(out - ref).max() < 3e-3 * scale, type(op).__name__


def test_auto_routing_uses_matrix_dtype_when_unspecified():
    """_pick_sparse_format must gate the (TPU-only) BSR branch on the
    dtype the operator will actually be built with — A.dtype when the
    caller passes none — not on a hardcoded f64 default.  On the CPU test
    backend the BSR branch is unreachable, so assert via the format
    probe's itemsize logic directly."""
    from rbl_tpu.ops.spmm.operator import _pick_sparse_format

    A = _random_sym(600, 0.05, seed=13).astype(np.float32)
    # blocky enough to pass the fill gate if the backend were TPU; here we
    # only check the probe doesn't crash and routes consistently for both
    # explicit and inherited dtype
    assert _pick_sparse_format(A, None) == _pick_sparse_format(A, np.float32)


def test_as_operator_routes_pure_diagonal_to_diagonal_operator():
    """An exactly-diagonal scipy matrix must become a DiagonalOperator —
    cheaper applies than any sparse layout, and rbl_generalized's exact
    degree-0 M^{±1/2} fast path keys on it (the reference's test matrices
    are sparse(Diagonal(...)), test.jl:17-50)."""
    d = np.linspace(0.5, 9.0, 300)
    for mat in (sp.diags(d).tocsr(), sp.diags(d).tocoo(), sp.diags(d)):
        op = rt.as_operator(mat)
        assert isinstance(op, rt.DiagonalOperator), type(mat)
        np.testing.assert_allclose(np.asarray(op.diag), d)
    # duplicate COO entries on the diagonal must sum, matching scipy
    A = sp.coo_matrix(([1.0, 2.0, 5.0], ([0, 0, 2], [0, 0, 2])),
                      shape=(3, 3))
    op = rt.as_operator(A)
    assert isinstance(op, rt.DiagonalOperator)
    np.testing.assert_allclose(np.asarray(op.diag), [3.0, 0.0, 5.0])
    # a forced format is honored even for a diagonal matrix
    from rbl_tpu.ops.spmm.dia import DiaOperator

    assert isinstance(rt.as_operator(sp.diags(d), format="dia"),
                      DiaOperator)


# ---- packed (CSR-of-tiles) BSR layout --------------------------------------

def _messy_sym(n=2000, seed=0):
    """Skewed tile counts, one very heavy row, plenty of empty block-rows."""
    rng = np.random.default_rng(seed)
    rows = np.concatenate([rng.integers(0, 300, 4000), np.full(1500, 1777)])
    cols = np.concatenate(
        [rng.integers(0, n, 4000), rng.integers(0, n, 1500)]
    )
    vals = rng.standard_normal(rows.size)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
    return ((A + A.T) * 0.5).tocsr()


@pytest.mark.parametrize("bm", [None, 16, 32, 128])
def test_bsr_packed_matches_scipy_all_tile_heights(bm):
    A = _messy_sym()
    rng = np.random.default_rng(1)
    X = rng.standard_normal((A.shape[0], 8)).astype(np.float32)
    op = BlockSparseOperator.from_scipy(
        A, dtype=jnp.float32, bm=bm, interpret=True
    )
    Y = np.asarray(op.apply(jnp.asarray(X)))
    ref = (A @ X.astype(np.float64)).astype(np.float32)
    assert np.abs(Y - ref).max() / np.abs(ref).max() < 5e-6
    np.testing.assert_allclose(
        np.asarray(op.diagonal()), A.diagonal(), atol=1e-6
    )


def test_bsr_tile_plan_calibrated_choices():
    """The joint (tile height, unroll) tuner reproduces the TPU-measured
    ordering (tpu_*_spmm3.log): scattered dense-node-block matrices go
    fine-tiled (stored bytes dominate), and high unroll divides the
    ~0.25 us/grid-step overhead everywhere."""
    from rbl_tpu.ops.spmm.pallas_bsr import pick_tile_plan
    from rbl_tpu.utils.fem import fem_elasticity_3d

    # blocky: random dense 16x16 blocks -> 128-tall tiles store ~7x more
    # zeros; the plan must pick a fine tile
    rng = np.random.default_rng(5)
    nbn = 1024  # wide enough that the 14 blocks/row scatter (at 256 the
    # pattern is ~44% dense at 128x128 and coarse tiles genuinely win)
    rb = np.repeat(np.arange(nbn), 7)
    cb = rng.integers(0, nbn, rb.size)
    key = np.unique(
        np.concatenate([rb, cb]).astype(np.int64) * nbn
        + np.concatenate([cb, rb])
    )
    rb, cb = key // nbn, key % nbn
    ii = (rb[:, None, None] * 16 + np.arange(16)[None, :, None]
          ).repeat(16, axis=2).ravel()
    jj = (cb[:, None, None] * 16 + np.arange(16)[None, None, :]
          ).repeat(16, axis=1).ravel()
    G = sp.coo_matrix(
        (np.ones(ii.size, np.float32), (ii, jj)), shape=(nbn * 16, nbn * 16)
    ).tocsr()
    bm_g, u_g = pick_tile_plan(G)
    assert bm_g <= 32
    assert u_g >= 8

    # the plan's operator is correct whatever it picks
    A = fem_elasticity_3d(8)
    op = BlockSparseOperator.from_scipy(A, dtype=jnp.float32, interpret=True)
    rng = np.random.default_rng(2)
    X = rng.standard_normal((A.shape[0], 8)).astype(np.float32)
    Y = np.asarray(op.apply(jnp.asarray(X)))
    ref = (A @ X.astype(np.float64)).astype(np.float32)
    assert np.abs(Y - ref).max() / np.abs(ref).max() < 5e-6


def test_bsr_packed_pads_rows_to_unroll_not_to_max():
    """Packed layout memory: a matrix with one 40-tile row and 99 1-tile
    rows must store ~40+99 tiles (plus <=U-1 per-row alignment), not
    100 rows x 40 tiles of ELL padding."""
    n = 100 * 16
    rng = np.random.default_rng(3)
    rows = np.concatenate([np.full(40, 5), np.arange(100) * 16])
    cols = np.concatenate(
        [np.arange(40) * 40, rng.integers(0, n, 100)]
    )
    A = sp.coo_matrix(
        (np.ones(rows.size), (rows, cols)), shape=(n, n)
    ).tocsr()
    op = BlockSparseOperator.from_scipy(
        A, dtype=jnp.float32, bm=16, interpret=True
    )
    # 100 block-rows x U(=4)-alignment + the heavy row's 13 tiles in 4
    # chunks = 412; blocked-ELL at L_max=13 would store 100 x 16 = 1600
    assert op.nnz_blocks <= 100 * op.unroll + 16
    X = rng.standard_normal((n, 4)).astype(np.float32)
    Y = np.asarray(op.apply(jnp.asarray(X)))
    ref = (A @ X.astype(np.float64)).astype(np.float32)
    assert np.abs(Y - ref).max() <= 5e-6 * max(np.abs(ref).max(), 1)


def test_bsr_packed_edge_shapes():
    """Empty matrix, 1x1, and n not a multiple of either tile dim."""
    A0 = sp.csr_matrix((64, 64))
    op = BlockSparseOperator.from_scipy(A0, dtype=jnp.float32, interpret=True)
    assert np.all(np.asarray(op.apply(jnp.ones((64, 4), jnp.float32))) == 0)

    A1 = sp.csr_matrix(np.array([[3.0]]))
    op1 = BlockSparseOperator.from_scipy(A1, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(op1.apply(jnp.ones((1, 2), jnp.float32))), 3.0
    )

    A2 = sp.random(333, 333, density=0.05, random_state=0)
    A2 = ((A2 + A2.T) * 0.5).tocsr()
    op2 = BlockSparseOperator.from_scipy(A2, dtype=jnp.float32, interpret=True)
    X2 = np.random.default_rng(0).standard_normal((333, 8)).astype(np.float32)
    Y2 = np.asarray(op2.apply(jnp.asarray(X2)))
    ref = (A2 @ X2.astype(np.float64)).astype(np.float32)
    assert np.abs(Y2 - ref).max() < 5e-6 * np.abs(ref).max()


def test_bsr_plan_none_when_smem_overflows(monkeypatch):
    """Review regression: when every (bm, U) candidate overflows the
    scalar-prefetch budget, pick_tile_plan returns None, the model prices
    it as inf, and from_scipy refuses with a clear error."""
    import rbl_tpu.ops.spmm.pallas_bsr as pb

    A = _messy_sym()
    monkeypatch.setattr(pb, "_SMEM_TILE_IDS_BYTES", 0)
    assert pb.pick_tile_plan(A) is None
    assert pb.pick_tile_height(A) is None
    assert pb.modeled_bsr_apply_seconds(A) == float("inf")
    with pytest.raises(ValueError, match="scalar-prefetch budget"):
        BlockSparseOperator.from_scipy(A, dtype=jnp.float32, interpret=True)


def test_packed_resident_matches_streaming():
    """The VMEM-resident-RHS packed kernel (NEXT r2 item 3) must equal
    the streaming variant bit-for-bit in result (both f64 interpret)."""
    import scipy.sparse as sp

    from rbl_tpu.ops.spmm import pallas_bsr as pb

    rng = np.random.default_rng(7)
    n, b = 768, 5
    M = sp.random(n, n, density=0.01, random_state=8)
    A = sp.csr_matrix(M + M.T)
    op = rt.BlockSparseOperator.from_scipy(
        A, dtype=jnp.float64, bm=16, bk=128, unroll=4, interpret=True
    )
    X = jnp.asarray(rng.standard_normal((n, b)))
    y_res = np.asarray(op.apply(X))  # small X → resident path
    old = pb._RESIDENT_X_BYTES
    try:
        pb._RESIDENT_X_BYTES = 0  # force the streaming kernel
        y_str = np.asarray(op.apply(X))
    finally:
        pb._RESIDENT_X_BYTES = old
    np.testing.assert_allclose(y_res, y_str, atol=1e-12)
    np.testing.assert_allclose(y_res, A @ np.asarray(X), atol=1e-10)


def test_packed_panel_layout_matches_packed():
    """Panel layout (one large-contraction dot per chunk — round-4 SpMM
    ceiling decomposition) must reproduce the packed kernel exactly on a
    block-structured matrix, including ragged rows and padding chunks."""
    import numpy as np
    import scipy.sparse as sp

    import jax.numpy as jnp

    from rbl_tpu.ops.spmm.pallas_bsr import BlockSparseOperator

    rng = np.random.default_rng(7)
    n = 768
    A = sp.random(n, n, density=0.03, random_state=3).tocsr()
    A = A + A.T
    X = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    ref = np.asarray(A @ np.asarray(X))
    for bm, U in ((16, 4), (32, 2), (16, 8)):
        packed = BlockSparseOperator.from_scipy(
            A, dtype=jnp.float32, bm=bm, unroll=U, panel=False)
        pan = BlockSparseOperator.from_scipy(
            A, dtype=jnp.float32, bm=bm, unroll=U, panel=True)
        Yp = np.asarray(packed.apply(X))
        Ya = np.asarray(pan.apply(X))
        np.testing.assert_allclose(Ya, Yp, rtol=1e-5, atol=1e-4)
        rel = np.linalg.norm(Ya - ref) / np.linalg.norm(ref)
        assert rel < 1e-5, (bm, U, rel)


def test_packed_panel_lane_concat_gather_matches():
    """The round-5 lane-concat X-gather (panel_gather="concat") must be
    bit-equivalent to the stack+swapaxes gather — same dot, same operand
    values, different VMEM assembly (VERDICT r4 item 3)."""
    import dataclasses

    import numpy as np
    import scipy.sparse as sp

    import jax.numpy as jnp

    from rbl_tpu.ops.spmm.pallas_bsr import BlockSparseOperator

    rng = np.random.default_rng(11)
    n = 512
    A = sp.random(n, n, density=0.04, random_state=5).tocsr()
    A = A + A.T
    X = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    ref = np.asarray(A @ np.asarray(X))
    for bm, U in ((16, 4), (16, 8)):
        pan = BlockSparseOperator.from_scipy(
            A, dtype=jnp.float32, bm=bm, unroll=U, panel=True)
        Ys = np.asarray(pan.apply(X))
        Yc = np.asarray(
            dataclasses.replace(pan, panel_gather="concat").apply(X))
        np.testing.assert_allclose(Yc, Ys, rtol=1e-6, atol=1e-6)
        rel = np.linalg.norm(Yc - ref) / np.linalg.norm(ref)
        assert rel < 1e-5, (bm, U, rel)
