"""Cone projection unit tests.

Oracles: analytic projections + the reference's inline tests
(cone_psd.rs:89-110) + brute-force checks on random points.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from totsu_tpu.ops import sympack
from totsu_tpu.solver import cone as cones


def project(layout, x, dual=False):
    return np.asarray(layout.project(jnp.asarray(x, dtype=jnp.float64), dual))


def test_zero_primal_dual():
    lay = cones.ConeLayout([cones.zero(3)])
    x = np.array([1.0, -2.0, 3.0])
    np.testing.assert_allclose(project(lay, x, dual=False), np.zeros(3))
    # dual of the zero cone is R^n -> identity (ref cone_zero.rs:38-44)
    np.testing.assert_allclose(project(lay, x, dual=True), x)


def test_rpos():
    lay = cones.ConeLayout([cones.rpos(4)])
    x = np.array([1.0, -2.0, 0.0, 5.0])
    expect = np.array([1.0, 0.0, 0.0, 5.0])
    np.testing.assert_allclose(project(lay, x, dual=False), expect)
    np.testing.assert_allclose(project(lay, x, dual=True), expect)


@pytest.mark.parametrize("s,v,exp_s,exp_v", [
    # interior: unchanged
    (5.0, [1.0, 2.0], 5.0, [1.0, 2.0]),
    # polar interior: projects to 0
    (-5.0, [1.0, 2.0], 0.0, [0.0, 0.0]),
    # boundary blend: alpha = (1 + s/||v||)/2
    (0.0, [3.0, 4.0], 2.5, [1.5, 2.0]),
])
def test_soc_cases(s, v, exp_s, exp_v):
    lay = cones.ConeLayout([cones.soc(1 + len(v))])
    out = project(lay, np.array([s] + v))
    np.testing.assert_allclose(out[0], exp_s, atol=1e-12)
    np.testing.assert_allclose(out[1:], exp_v, atol=1e-12)


def test_soc_degenerate_dim1():
    # 1-element SOC block reduces to max(x, 0) (ref cone_soc.rs len-1 path,
    # exercised by test_socp2's ni=0 blocks)
    lay = cones.ConeLayout([cones.soc(1)])
    np.testing.assert_allclose(project(lay, np.array([-3.0])), [0.0])
    np.testing.assert_allclose(project(lay, np.array([3.0])), [3.0])


def test_soc_batched_blocks():
    lay = cones.ConeLayout([cones.soc(3, count=2)])
    x = np.array([5.0, 1.0, 2.0, 0.0, 3.0, 4.0])
    out = project(lay, x)
    np.testing.assert_allclose(out[:3], [5.0, 1.0, 2.0])
    np.testing.assert_allclose(out[3:], [2.5, 1.5, 2.0])


def test_rsoc_membership_and_projection():
    # project random points; result must satisfy x3^2+... <= 2 x1 x2,
    # x1, x2 >= 0, and be a fixed point of the projection
    rng = np.random.default_rng(0)
    lay = cones.ConeLayout([cones.rsoc(5)])
    for _ in range(20):
        x = rng.normal(size=5) * 3
        y = project(lay, x)
        assert y[0] >= -1e-10 and y[1] >= -1e-10
        assert np.sum(y[2:] ** 2) <= 2 * y[0] * y[1] + 1e-8
        np.testing.assert_allclose(project(lay, y), y, atol=1e-10)


def test_rsoc_point_already_inside():
    lay = cones.ConeLayout([cones.rsoc(4)])
    x = np.array([2.0, 1.0, 1.0, 1.0])  # 1+1=2 <= 2*2*1, inside
    np.testing.assert_allclose(project(lay, x), x, atol=1e-12)


def test_rsoc_dim1():
    lay = cones.ConeLayout([cones.rsoc(1)])
    np.testing.assert_allclose(project(lay, np.array([-2.0])), [0.0])


def test_psd_reference_inline():
    # ref cone_psd.rs test_cone_psd1: packed [5, 0, -5] (matrix diag(5, -5))
    # projects to [5, 0, 0]
    lay = cones.ConeLayout([cones.psd(2)])
    out = project(lay, np.array([5.0, 0.0, -5.0]))
    np.testing.assert_allclose(out, [5.0, 0.0, 0.0], atol=1e-6)


def test_psd_random_oracle():
    rng = np.random.default_rng(1)
    k = 5
    lay = cones.ConeLayout([cones.psd(k)])
    for _ in range(10):
        m = rng.normal(size=(k, k))
        m = (m + m.T) / 2
        v = np.asarray(sympack.pack(jnp.asarray(m), scaled=True))
        out = project(lay, v)
        # numpy oracle: eigendecompose, clip, reconstruct
        w, vec = np.linalg.eigh(m)
        expect = (vec * np.maximum(w, 0)) @ vec.T
        out_mat = np.asarray(sympack.unpack(jnp.asarray(out), k, scaled=True))
        np.testing.assert_allclose(out_mat, expect, atol=1e-8)


def test_psd_scaled_vec_norm_identity():
    # the sqrt2 convention makes ||vec(X)||_2 == ||X||_F (cone_psd.rs:13-19)
    rng = np.random.default_rng(2)
    m = rng.normal(size=(4, 4))
    m = m + m.T
    v = np.asarray(sympack.pack(jnp.asarray(m), scaled=True))
    np.testing.assert_allclose(np.linalg.norm(v),
                               np.linalg.norm(m, "fro"), rtol=1e-12)


def test_product_layout_and_group_min():
    lay = cones.ConeLayout([
        cones.rpos(2), cones.soc(3), cones.zero(1), cones.soc(2, count=2)])
    assert lay.dim == 2 + 3 + 1 + 4
    t = np.arange(1.0, 11.0)
    out = np.asarray(lay.group_min(jnp.asarray(t)))
    # rpos & zero unchanged; each soc block flattened to its min
    np.testing.assert_allclose(out[:2], [1, 2])
    np.testing.assert_allclose(out[2:5], [3, 3, 3])
    np.testing.assert_allclose(out[5:6], [6])
    np.testing.assert_allclose(out[6:8], [7, 7])
    np.testing.assert_allclose(out[8:10], [9, 9])


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    for k in [1, 2, 3, 7]:
        m = rng.normal(size=(k, k))
        m = m + m.T
        for scaled in [False, True]:
            v = sympack.pack(jnp.asarray(m), scaled=scaled)
            assert v.shape[-1] == sympack.tri_len(k)
            m2 = sympack.unpack(v, k, scaled=scaled)
            np.testing.assert_allclose(np.asarray(m2), m, atol=1e-12)


def test_packed_ordering_colmaj():
    # packed order is upper-triangle column-major: (0,0) (0,1) (1,1) (0,2)...
    m = np.array([[1.0, 2.0, 4.0],
                  [2.0, 3.0, 5.0],
                  [4.0, 5.0, 6.0]])
    v = np.asarray(sympack.pack(jnp.asarray(m), scaled=False))
    np.testing.assert_allclose(v, [1, 2, 3, 4, 5, 6])


def test_psd_newton_schulz_matches_eigh():
    # 'ns' matmul-only projection agrees with the exact eigh projection
    rng = np.random.default_rng(9)
    for k in [3, 8, 20]:
        m = rng.normal(size=(k, k))
        m = (m + m.T) / 2
        v = sympack.pack(jnp.asarray(m), scaled=True)
        exact = np.asarray(sympack.proj_psd_packed(v, method="eigh"))
        ns = np.asarray(sympack.proj_psd_packed(v, method="ns"))
        np.testing.assert_allclose(ns, exact, atol=1e-10)
    # via the cone layout
    lay_ns = cones.ConeLayout([cones.psd(2, method="ns")])
    out = np.asarray(lay_ns.project(jnp.asarray([5.0, 0.0, -5.0]), False))
    np.testing.assert_allclose(out, [5.0, 0.0, 0.0], atol=1e-6)


def test_matbuild_scale_nondiag_and_sqrt():
    # ref matbuild inline test (mod.rs:304-333): scale_nondiag on SymPack
    import totsu_tpu as tt
    mb = tt.MatBuild.sympack(3).set_iter_rowmaj([1., 2., 3.,
                                                 2., 4., 5.,
                                                 3., 5., 6.])
    mb.set_scale_nondiag(10.0)
    dense = mb.to_dense()
    np.testing.assert_allclose(np.diag(dense), [1., 4., 6.])
    np.testing.assert_allclose(dense[0, 1], 20.0)
    np.testing.assert_allclose(dense[1, 0], 20.0)
    # sqrt: (P^1/2)^2 == P for PSD P
    p = np.array([[4.0, 2.0], [2.0, 3.0]])
    mb2 = tt.MatBuild.sympack(2)
    mb2[0, 0], mb2[0, 1], mb2[1, 1] = p[0, 0], p[0, 1], p[1, 1]
    mb2.set_sqrt()
    root = mb2.to_dense()
    np.testing.assert_allclose(root @ root, p, atol=1e-12)


def test_matbuild_reshape_colvec():
    import totsu_tpu as tt
    mb = tt.MatBuild.sympack(2).set_iter_rowmaj([1., 2., 2., 3.])
    mb.set_reshape_colvec()
    assert mb.size == (3, 1)
    np.testing.assert_allclose(mb.to_dense()[:, 0], [1., 2., 3.])


def test_matbuild_display_format():
    # reference Display format parity (ref matbuild/ex.rs:5-60)
    import totsu_tpu as tt
    mb = tt.MatBuild.general(2, 2).set_iter_rowmaj([1., 2., 3., 4.])
    s = str(mb)
    lines = s.splitlines()
    assert lines[0].startswith("[ 1.000e+00 2.000e+00")
    assert s.rstrip().endswith("] (2 x 2) General")
    assert str(tt.MatBuild.general(0, 3)) == "[ ]"
    assert str(tt.MatBuild.sympack(1).set_iter_rowmaj([5.])).endswith(
        "Symmetric Packed")


# ---------------------------------------------------------------------------
# user-defined cone factors (the reference's public Cone trait:
# cone.rs:9-30; custom composite cone in imgnr_udef prob_cone.rs:8-47)

def test_custom_matches_builtin_rpos():
    # a custom factor re-implementing R+^n must agree with the builtin,
    # including the Moreau-derived dual (R+ is self-dual)
    lay_ref = cones.ConeLayout([cones.rpos(5)])
    lay_cus = cones.ConeLayout(
        [cones.custom(5, lambda b: jnp.maximum(b, 0.0), grouped=False)])
    rng = np.random.default_rng(3)
    x = rng.normal(size=5)
    for dual in (False, True):
        np.testing.assert_allclose(project(lay_cus, x, dual),
                                   project(lay_ref, x, dual))


def test_custom_moreau_dual_zero_cone():
    # primal proj -> 0 gives Moreau dual x + proj(-x) = x (dual of {0} is R^n)
    lay = cones.ConeLayout([cones.custom(4, jnp.zeros_like)])
    x = np.array([1.0, -2.0, 3.0, -4.0])
    np.testing.assert_allclose(project(lay, x, dual=False), np.zeros(4))
    np.testing.assert_allclose(project(lay, x, dual=True), x)


def test_custom_blocked_soc_and_grouping():
    # two SOC blocks via the custom hook must match the builtin soc factor,
    # and grouped=True must group the preconditioner per block
    from totsu_tpu.solver.cone import _proj_soc_blocks
    lay_ref = cones.ConeLayout([cones.soc(3, count=2)])
    lay_cus = cones.ConeLayout(
        [cones.custom(3, _proj_soc_blocks, count=2,
                      dual_proj=_proj_soc_blocks)])
    rng = np.random.default_rng(4)
    x = rng.normal(size=6)
    for dual in (False, True):
        np.testing.assert_allclose(project(lay_cus, x, dual),
                                   project(lay_ref, x, dual), atol=1e-12)
    t = jnp.asarray(rng.uniform(1.0, 2.0, size=6))
    np.testing.assert_allclose(np.asarray(lay_cus.group_min(t)),
                               np.asarray(lay_ref.group_min(t)))


def test_custom_end_to_end_lp_parity():
    # the golden LP solved with a custom-factor layout reproduces the exact
    # reference iterate path (160 updates, tests/test_solver.py oracle)
    import totsu_tpu as tt
    c = jnp.asarray([-1.0, 0.0])
    g = jnp.asarray([[4.0, -1.0], [-1.0, 4.0], [-1.0, -1.0]])
    h = jnp.asarray([6.0, 6.0, 1.0])
    param = tt.SolverParam(max_iter=10_000)
    lay_cus = tt.ConeLayout(
        [tt.custom(3, lambda b: jnp.maximum(b, 0.0), grouped=False)])
    res = tt.solve_jit(c, g, h, lay_cus, param)
    assert int(res.status) == tt.SolverStatus.CONVERGED
    assert int(res.iters) == 160
    np.testing.assert_allclose(np.asarray(res.x), [2.0, 2.0], atol=1e-5)


def test_psd_jacobi_matches_eigh():
    # parallel-order Jacobi projection must agree with the eigh-based one
    # to roundoff (both exact), across a batch and both parities of k
    from totsu_tpu.ops import sympack
    rng = np.random.default_rng(11)
    for k in (2, 5, 8):
        sn = sympack.tri_len(k)
        v = jnp.asarray(rng.normal(size=(3, sn)))
        pe = sympack.proj_psd_packed(v, scaled=True, method="eigh")
        pj = sympack.proj_psd_packed(v, scaled=True, method="jacobi")
        np.testing.assert_allclose(np.asarray(pj), np.asarray(pe),
                                   atol=1e-10)


def test_psd_jacobi_cone_end_to_end():
    # the reference 2x2 PSD projection case (cone_psd.rs:89-110) through
    # the jacobi variant: matrix diag(-5, ...) clips its negative eigenvalue
    lay_e = cones.ConeLayout([cones.psd(2, method="eigh")])
    lay_j = cones.ConeLayout([cones.psd(2, method="jacobi")])
    rng = np.random.default_rng(12)
    x = rng.normal(size=3)
    for dual in (False, True):
        np.testing.assert_allclose(project(lay_j, x, dual),
                                   project(lay_e, x, dual), atol=1e-10)


def test_jacobi_eigh_properties():
    from totsu_tpu.ops.jacobi import jacobi_eigh
    rng = np.random.default_rng(13)
    for k in (3, 20, 33):  # odd sizes exercise the zero-padding path
        x = rng.normal(size=(4, k, k))
        x = (x + x.transpose(0, 2, 1)) / 2
        w, v = jacobi_eigh(jnp.asarray(x), sweeps=12)
        w, v = np.asarray(w), np.asarray(v)
        rec = np.einsum("bik,bk,bjk->bij", v, w, v)
        np.testing.assert_allclose(rec, x, atol=1e-12)
        orth = np.einsum("bik,bjk->bij", v, v)
        np.testing.assert_allclose(orth, np.broadcast_to(np.eye(k), orth.shape),
                                   atol=1e-12)
        np.testing.assert_allclose(np.sort(w, axis=-1),
                                   np.linalg.eigvalsh(x), atol=1e-11)


def test_jacobi_eigh_symmetrizes_input():
    # public contract: input is read symmetrically; an asymmetric matrix is
    # treated as its symmetric part (exactness of the rotation build needs
    # bit-equal triangles internally)
    from totsu_tpu.ops.jacobi import jacobi_eigh
    rng = np.random.default_rng(21)
    x = rng.normal(size=(2, 6, 6))  # deliberately asymmetric
    w, v = jacobi_eigh(jnp.asarray(x), sweeps=12)
    xs = (x + x.transpose(0, 2, 1)) / 2
    np.testing.assert_allclose(np.sort(np.asarray(w), axis=-1),
                               np.linalg.eigvalsh(xs), atol=1e-11)


def test_custom_grouped_cone_survives_equilibration():
    # regression: Ruiz equilibration must apply block-uniform row scaling
    # to custom grouped factors exactly as it does to builtin soc —
    # otherwise the scaled slack leaves the cone and the solve diverges
    import totsu_tpu as tt
    from totsu_tpu.solver.cone import _proj_soc_blocks
    rng = np.random.default_rng(30)
    n = 6
    g = rng.normal(size=(3, n)) * np.array([[1e3], [1.0], [1e-3]])  # bad rows
    c = rng.normal(size=n)
    h = np.abs(rng.normal(size=3))
    # bound the variables so the LP part is bounded
    eye = np.eye(n)
    g_full = np.concatenate([g, eye, -eye], axis=0)
    h_full = np.concatenate([h, np.full(n, 2.0), np.full(n, 2.0)])
    lay_b = cones.ConeLayout([cones.soc(3), cones.rpos(2 * n)])
    lay_c = cones.ConeLayout(
        [cones.custom(3, _proj_soc_blocks, dual_proj=_proj_soc_blocks),
         cones.rpos(2 * n)])
    param = tt.SolverParam(max_iter=300_000, eps_acc=1e-6,
                          equil_iters=10)
    rb = tt.solve_jit(jnp.asarray(c), jnp.asarray(g_full),
                      jnp.asarray(h_full), lay_b, param)
    rc = tt.solve_jit(jnp.asarray(c), jnp.asarray(g_full),
                      jnp.asarray(h_full), lay_c, param)
    assert int(rb.status) == int(rc.status) == 1
    np.testing.assert_allclose(np.asarray(rc.x), np.asarray(rb.x),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# exponential cone (beyond the reference surface; docs/PARITY.md last section)

def _in_exp(p, tol):
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    with np.errstate(over="ignore"):
        smooth = (y > 0) & (
            y * np.exp(np.clip(x / np.where(y != 0, y, 1.0), -700, 700))
            <= z + tol)
    ray = (np.abs(y) <= tol) & (x <= tol) & (z >= -tol)
    return smooth | ray


def _in_exp_polar(p, tol):
    u, v, w = p[..., 0], p[..., 1], p[..., 2]
    with np.errstate(over="ignore"):
        smooth = (u > 0) & (
            u * np.exp(np.clip(v / np.where(u != 0, u, 1.0), -700, 700))
            <= -np.e * w + tol)
    ray = (u <= tol) & (v <= tol) & (w <= tol)
    return smooth | ray


def test_exp_trivial_cases():
    lay = cones.ConeLayout([cones.expc()])
    # already in the cone: unchanged (1*e^0 = 1 <= 2)
    np.testing.assert_allclose(project(lay, np.array([0.0, 1.0, 2.0])),
                               [0.0, 1.0, 2.0])
    # deep in the polar cone: 0  (u=1, v=-9: e^{-9} <= -e*w for w=-1)
    np.testing.assert_allclose(project(lay, np.array([1.0, -9.0, -1.0])),
                               [0.0, 0.0, 0.0], atol=1e-12)
    # r<=0, s<=0 quadrant: (r, 0, t+)
    np.testing.assert_allclose(project(lay, np.array([-1.0, -2.0, 5.0])),
                               [-1.0, 0.0, 5.0])
    np.testing.assert_allclose(project(lay, np.array([-1.0, -2.0, -5.0])),
                               [-1.0, 0.0, 0.0])


def test_exp_projection_moreau_optimality():
    """vp in K, v - vp in K-polar, <vp, v-vp> = 0 together certify vp is
    THE projection (Moreau); checked over random + adversarial points,
    f64 and f32."""
    rng = np.random.default_rng(11)
    v = np.concatenate([
        rng.normal(scale=3.0, size=(3000, 3)),
        rng.normal(scale=50.0, size=(500, 3)),
        rng.normal(scale=1e-3, size=(500, 3)),
        # ill-conditioned regimes: root at large |rho|
        [[1e-8, -5.0, 3.0], [1e-3, -100.0, 7.0], [-8.16, 0.181, -2.86],
         [0.0066, -2.37, 0.426], [0.0, -1.0, 1.0], [0.0, 0.0, 0.0],
         [1e3, 1.0, -1.0], [-1e3, 2.0, 2.0], [1.0, 1e3, 1.0]]])
    scale = 1.0 + np.linalg.norm(v, axis=1)
    for dtype, tol in ((jnp.float64, 1e-7), (jnp.float32, 2e-3)):
        vp = np.asarray(
            cones._proj_exp_blocks(jnp.asarray(v, dtype=dtype))
        ).astype(np.float64)
        vd = v - vp
        assert _in_exp(vp, tol * scale).all()
        assert _in_exp_polar(vd, tol * scale).all()
        assert (np.abs((vp * vd).sum(1)) <= tol * scale ** 2).all()
    # idempotency (f64)
    vp = np.asarray(cones._proj_exp_blocks(jnp.asarray(v)))
    vp2 = np.asarray(cones._proj_exp_blocks(jnp.asarray(vp)))
    np.testing.assert_allclose(vp2, vp, atol=1e-10)


def test_exp_dual_via_moreau_identity():
    """proj_{K*}(v) = v + proj_K(-v); dual projection output must lie in
    K* = -K-polar and satisfy the same optimality certificate."""
    lay = cones.ConeLayout([cones.expc(count=64)])
    rng = np.random.default_rng(3)
    v = rng.normal(scale=2.0, size=64 * 3)
    out = project(lay, v, dual=True).reshape(64, 3)
    vd = v.reshape(64, 3) - out
    scale = 1.0 + np.linalg.norm(v.reshape(64, 3), axis=1)
    # out in K* <=> -out in K-polar
    assert _in_exp_polar(-out, 1e-7 * scale).all()
    # residual in (K*)-polar = -K <=> -vd in K
    assert _in_exp(-vd, 1e-7 * scale).all()
    assert (np.abs((out * vd).sum(1)) <= 1e-6 * scale ** 2).all()


def test_exp_grouping_and_layout():
    f = cones.expc(count=5)
    assert f.needs_group and f.dim == 3 and f.total == 15
    lay = cones.ConeLayout([cones.rpos(2), cones.expc(count=2)])
    t = jnp.asarray(np.arange(1.0, 9.0))
    g = np.asarray(lay.group_min(t))
    np.testing.assert_allclose(g[:2], [1.0, 2.0])     # separable: untouched
    np.testing.assert_allclose(g[2:5], 3.0)           # block mins
    np.testing.assert_allclose(g[5:8], 6.0)


def test_exp_end_to_end_solve():
    """min t  s.t.  e^x <= t, x = 1  ->  (x, t) = (1, e).

    Conic form: slack (x, 1, t) in K_exp plus a zero-cone row for x = 1."""
    import totsu_tpu as tt
    c = jnp.asarray([0.0, 1.0])
    a = jnp.asarray([[1.0, 0.0],    # zero cone: 1 - x = 0
                     [-1.0, 0.0],   # exp row 1: s1 = x
                     [0.0, 0.0],    # exp row 2: s2 = 1
                     [0.0, -1.0]])  # exp row 3: s3 = t
    b = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    lay = tt.ConeLayout([tt.zero(1), tt.expc()])
    res = tt.solve(c, a, b, lay, tt.SolverParam(max_iter=200_000))
    x = np.asarray(res.x)
    np.testing.assert_allclose(x, [1.0, np.e], atol=1e-4)


# ---------------------------------------------------------------------------
# power cone (beyond the reference surface, like exp; docs/PARITY.md)

def _pow_val(x, y, a):
    """x^a y^(1-a) for x, y >= 0 (0 if either is <= 0)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        v = np.exp(a * np.log(np.maximum(x, 1e-300))
                   + (1 - a) * np.log(np.maximum(y, 1e-300)))
    return np.where((x > 0) & (y > 0), v, 0.0)


def _in_powc(p, a, tol):
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return (x >= -tol) & (y >= -tol) & (_pow_val(x, y, a)
                                        >= np.abs(z) - tol)


def test_pow_trivial_cases():
    lay = cones.ConeLayout([cones.powc(0.5)])
    # in the cone: unchanged (sqrt(4*1) = 2 >= |2|)
    np.testing.assert_allclose(project(lay, np.array([4.0, 1.0, 2.0])),
                               [4.0, 1.0, 2.0])
    # deep in the polar cone -K*: 0   ((2*0.5)^0.5 (2*0.5)^0.5 = 1 >= 0.5)
    np.testing.assert_allclose(project(lay, np.array([-1.0, -1.0, 0.5])),
                               [0.0, 0.0, 0.0], atol=1e-12)
    # z = 0 and outside: clip to the nonnegative quadrant
    np.testing.assert_allclose(project(lay, np.array([-3.0, 7.0, 0.0])),
                               [0.0, 7.0, 0.0], atol=1e-12)
    # invalid exponents rejected at construction
    for bad in (0.0, 1.0, -0.2, 1.5):
        with pytest.raises(ValueError):
            cones.powc(bad)


def test_pow_projection_certificates():
    """For each random v: vp in K, <vp, v-vp> ~ 0, and the variational
    inequality <v-vp, q-vp> <= 0 over sampled q in K (the boundary-polar
    membership check is exponentially ill-conditioned at extreme alpha, so
    the VI — necessary and well-conditioned — is the oracle). f64 + f32,
    plus idempotency."""
    rng = np.random.default_rng(5)
    for a in (0.5, 0.3, 0.9):
        v = np.concatenate([
            rng.normal(scale=3.0, size=(500, 3)),
            rng.normal(scale=80.0, size=(100, 3)),
            rng.normal(scale=1e-4, size=(100, 3)),
            [[0, 0, 0], [1, 1, 0], [-1, -1, 5], [0, -1, 2],
             [1e8, -1, 3], [-5, 1e-9, 1e-9]]])
        scale = 1.0 + np.linalg.norm(v, axis=1)
        # sample q in K (interior and boundary-ish)
        qxy = np.abs(rng.normal(size=(100, 2))) + 1e-6
        qz = _pow_val(qxy[:, 0], qxy[:, 1], a) * np.tanh(
            rng.normal(size=100))
        q = np.concatenate([qxy, qz[:, None]], axis=1)
        qs = 1.0 + np.linalg.norm(q, axis=1)
        # membership is re-checked with a looser tolerance than the VI:
        # the boundary z = x^a y^(1-a) has unbounded normal curvature as
        # x -> 0 (d/dx ~ a x^(a-1)), so recomputing pv at a boundary point
        # amplifies roundoff even though the point is VI-optimal to 1e-8
        for dtype, tol, mtol in ((jnp.float64, 1e-8, 1e-6),
                                 (jnp.float32, 2e-3, 5e-3)):
            vp = np.asarray(cones._proj_pow_blocks(
                jnp.asarray(v, dtype=dtype), a)).astype(np.float64)
            vd = v - vp
            # skip membership (NOT the VI) on blocks pinned to the x=0 /
            # y=0 edge: there pv = x^a y^(1-a) rechecks a quantity whose
            # log diverges, meaningless at f32 eps
            edge = np.minimum(vp[:, 0], vp[:, 1]) < 1e-6 * scale
            assert (_in_powc(vp, a, mtol * scale) | edge).all()
            assert (np.abs((vp * vd).sum(1)) <= tol * scale ** 2).all()
            vi = vd @ q.T - (vd * vp).sum(1)[:, None]
            assert (vi <= tol * scale[:, None] * qs[None, :]).all()
        vp = np.asarray(cones._proj_pow_blocks(jnp.asarray(v), a))
        vp2 = np.asarray(cones._proj_pow_blocks(jnp.asarray(vp), a))
        np.testing.assert_allclose(vp2, vp, atol=1e-6)


def test_pow_dual_via_moreau_identity():
    """proj_{K*}(v) = v + proj_K(-v): output in K* (scaled primal-cone
    membership), residual in -K, orthogonal."""
    a = 0.3
    lay = cones.ConeLayout([cones.powc(a, count=64)])
    rng = np.random.default_rng(4)
    v = rng.normal(scale=2.0, size=64 * 3)
    out = project(lay, v, dual=True).reshape(64, 3)
    vd = v.reshape(64, 3) - out
    scale = 1.0 + np.linalg.norm(v.reshape(64, 3), axis=1)
    # out in K* <=> (a*, (1-a)*) rescale lands in K_pow(a)
    rescaled = np.stack([out[:, 0] / a, out[:, 1] / (1 - a), out[:, 2]], -1)
    assert _in_powc(rescaled, a, 1e-7 * scale).all()
    # residual in (K*)-polar = -K
    assert _in_powc(-vd, a, 1e-7 * scale).all()
    assert (np.abs((out * vd).sum(1)) <= 1e-7 * scale ** 2).all()


def test_pow_grouping_and_layout():
    f = cones.powc(0.25, count=5)
    assert f.needs_group and f.dim == 3 and f.total == 15 and f.alpha == 0.25
    lay = cones.ConeLayout([cones.rpos(2), cones.powc(0.25, count=2)])
    t = jnp.asarray(np.arange(1.0, 9.0))
    g = np.asarray(lay.group_min(t))
    np.testing.assert_allclose(g[:2], [1.0, 2.0])
    np.testing.assert_allclose(g[2:5], 3.0)
    np.testing.assert_allclose(g[5:8], 6.0)


def test_pow_end_to_end_solve():
    """max sqrt(x*y)  s.t.  x + y = 2   ->  (x, y) = (1, 1), value 1.

    Variables (x, y, z); min -z with slack (x, y, z) in K_pow(1/2) and a
    zero-cone row for x + y = 2."""
    import totsu_tpu as tt
    c = jnp.asarray([0.0, 0.0, -1.0])
    a = jnp.asarray([[1.0, 1.0, 0.0],     # zero cone: 2 - x - y = 0
                     [-1.0, 0.0, 0.0],    # pow row 1: s1 = x
                     [0.0, -1.0, 0.0],    # pow row 2: s2 = y
                     [0.0, 0.0, -1.0]])   # pow row 3: s3 = z
    b = jnp.asarray([2.0, 0.0, 0.0, 0.0])
    lay = tt.ConeLayout([tt.zero(1), tt.powc(0.5)])
    res = tt.solve(c, a, b, lay, tt.SolverParam(max_iter=200_000))
    x = np.asarray(res.x)
    np.testing.assert_allclose(x, [1.0, 1.0, 1.0], atol=1e-4)


# ---------------------------------------------------------------------------
# psd(method='auto') solve-time resolution (BASELINE.md SDP sweep policy)

def test_psd_auto_method_resolution():
    import totsu_tpu as tt
    from totsu_tpu.solver.cone import resolve_auto_methods
    lay = cones.ConeLayout([cones.psd(48), cones.psd(8, count=128),
                            cones.zero(3)])
    # reference profile: exact methods only; big-k -> eigh, small-k
    # batched -> jacobi (exact, beats latency-bound batched eigh)
    ref = resolve_auto_methods(lay, tt.SolverParam())
    assert [f.variant for f in ref.factors[:2]] == ["eigh", "jacobi"]
    # fast profile at loose tolerance: ns where its ~5e-6 floor is safe
    fast = resolve_auto_methods(
        lay, tt.SolverParam(profile="fast", eps_acc=1e-3))
    assert [f.variant for f in fast.factors[:2]] == ["ns", "jacobi"]
    # fast profile at tight tolerance: stays exact
    tight = resolve_auto_methods(
        lay, tt.SolverParam(profile="fast", eps_acc=1e-6))
    assert tight.factors[0].variant == "eigh"
    # explicitly chosen methods are never overridden
    lay2 = cones.ConeLayout([cones.psd(48, method="eigh")])
    out = resolve_auto_methods(
        lay2, tt.SolverParam(profile="fast", eps_acc=1e-3))
    assert out.factors[0].variant == "eigh"


def test_psd_auto_end_to_end_fast_profile():
    """The ref sdp1 instance (diag LMI -> (3,4)) solved with the default
    'auto' method under both profiles — the fast/ns path must hit the same
    answer at eps_acc=1e-3."""
    import totsu_tpu as tt
    f0 = np.diag([-1.0, 0.0])
    f1 = np.diag([0.0, -1.0])
    f2 = np.diag([3.0, 4.0])
    prob = tt.problems.sdp(c=[1.0, 1.0], f_mats=np.stack([f0, f1, f2]))
    for profile in ("reference", "fast"):
        res = prob.solve(tt.SolverParam(max_iter=200_000, eps_acc=1e-3,
                                        profile=profile))
        np.testing.assert_allclose(np.asarray(res.x), [3.0, 4.0], atol=5e-3)
