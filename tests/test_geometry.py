"""Substrate tests: dihedrals/angles/virtual-CB, NeRF build, binning."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trx2dy.geometry.transforms import (
    dihedral, bond_angle, virtual_cb, geometry_maps_6d, backbone_torsions,
)
from trx2dy.geometry.nerf import (
    build_backbone, place_atom,
    BOND_N_CA, BOND_CA_C, BOND_C_N, ANGLE_N_CA_C, ANGLE_CA_C_N, ANGLE_C_N_CA,
)
from trx2dy.geometry.binning import bin_geometry_maps, DIST_EDGES


def _np_dihedral(a, b, c, d):
    b0 = -1.0 * (b - a)
    b1 = c - b
    b2 = d - c
    b1 = b1 / np.linalg.norm(b1)
    v = b0 - np.dot(b0, b1) * b1
    w = b2 - np.dot(b2, b1) * b1
    x = np.dot(v, w)
    y = np.dot(np.cross(b1, v), w)
    return np.arctan2(y, x)


def test_dihedral_matches_reference_formula():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 4, 3))
    got = jax.vmap(dihedral)(*[jnp.asarray(pts[:, i]) for i in range(4)])
    want = np.array([_np_dihedral(*p) for p in pts])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_dihedral_known_values():
    a = jnp.array([1.0, 1.0, 0.0])
    b = jnp.array([0.0, 0.0, 0.0])
    c = jnp.array([0.0, 0.0, 1.0])
    # cis (dihedral 0)
    d0 = jnp.array([1.0, 1.0, 1.0])
    assert abs(float(dihedral(a, b, c, d0))) < 1e-6
    # trans (dihedral pi)
    d180 = jnp.array([-1.0, -1.0, 1.0])
    assert abs(abs(float(dihedral(a, b, c, d180))) - np.pi) < 1e-6
    # +90
    d90 = jnp.array([-1.0, 1.0, 1.0])
    assert abs(float(dihedral(a, b, c, d90)) - np.pi / 2) < 1e-6


def test_bond_angle():
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 0.0, 0.0])
    c = jnp.array([0.0, 1.0, 0.0])
    assert abs(float(bond_angle(a, b, c)) - np.pi / 2) < 1e-6


def test_nerf_roundtrip_torsions():
    """Build a backbone from torsions and re-measure them."""
    rng = np.random.default_rng(1)
    L = 17
    phi = jnp.asarray(rng.uniform(-np.pi, np.pi, L))
    psi = jnp.asarray(rng.uniform(-np.pi, np.pi, L))
    omg = jnp.asarray(np.full(L, np.pi * 0.98))

    coords = build_backbone(phi, psi, omg)
    (phi2, psi2, omg2), (phi_m, psi_m, omg_m) = backbone_torsions(
        coords["N"], coords["CA"], coords["C"])

    def wrap(x):
        return np.angle(np.exp(1j * np.asarray(x)))

    np.testing.assert_allclose(
        wrap(phi2)[1:], wrap(phi)[1:], atol=1e-4)
    np.testing.assert_allclose(
        wrap(psi2)[:-1], wrap(psi)[:-1], atol=1e-4)
    np.testing.assert_allclose(
        wrap(omg2)[:-1], wrap(omg)[:-1], atol=1e-4)


def test_nerf_ideal_geometry():
    L = 9
    rng = np.random.default_rng(2)
    coords = build_backbone(
        jnp.asarray(rng.uniform(-np.pi, np.pi, L)),
        jnp.asarray(rng.uniform(-np.pi, np.pi, L)),
        jnp.asarray(np.full(L, np.pi)),
    )
    n, ca, c = map(np.asarray, (coords["N"], coords["CA"], coords["C"]))
    np.testing.assert_allclose(
        np.linalg.norm(ca - n, axis=-1), BOND_N_CA, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(c - ca, axis=-1), BOND_CA_C, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(n[1:] - c[:-1], axis=-1), BOND_C_N, atol=1e-5)
    # bond angles
    ang = np.asarray(bond_angle(jnp.asarray(n), jnp.asarray(ca), jnp.asarray(c)))
    np.testing.assert_allclose(ang, ANGLE_N_CA_C, atol=1e-5)


def test_nerf_differentiable_and_vmappable():
    L = 8
    def loss(phi):
        coords = build_backbone(phi, jnp.zeros(L), jnp.full((L,), jnp.pi))
        return jnp.sum(coords["CA"] ** 2)
    g = jax.grad(loss)(jnp.linspace(-1.0, 1.0, L))
    assert np.all(np.isfinite(np.asarray(g)))
    batched = jax.vmap(
        lambda p: build_backbone(p, jnp.zeros(L), jnp.full((L,), jnp.pi))["CA"]
    )(jnp.stack([jnp.zeros(L), jnp.ones(L)]))
    assert batched.shape == (2, L, 3)


def test_geometry_maps_and_binning_match_reference_semantics():
    """Dense maps + binning vs a direct numpy re-implementation of pros()."""
    rng = np.random.default_rng(3)
    L = 20
    phi = jnp.asarray(rng.uniform(-np.pi, np.pi, L))
    psi = jnp.asarray(rng.uniform(-np.pi, np.pi, L))
    coords = build_backbone(phi, psi, jnp.full((L,), jnp.pi))
    maps = geometry_maps_6d(coords["N"], coords["CA"], coords["C"])

    dist = np.asarray(maps["dist"])
    # reference binning: (edges < d).sum(), >=37 or ==0 -> bin 0
    jd = (DIST_EDGES[None, None, :] < dist[:, :, None]).sum(-1)
    jd = np.where(jd >= 37, 0, jd)
    want = np.eye(37)[jd]
    got = np.asarray(bin_geometry_maps(maps["dist"], angle=False)["dist"])
    np.testing.assert_array_equal(got, want)

    # full-angle binning shape + one-hot property
    hist = bin_geometry_maps(**maps)
    assert hist["dist"].shape == (L, L, 37)
    assert hist["omega"].shape == (L, L, 25)
    assert hist["theta"].shape == (L, L, 25)
    assert hist["phi"].shape == (L, L, 13)
    for k in hist:
        np.testing.assert_allclose(np.asarray(hist[k]).sum(-1), 1.0)

    # diagonal / long-range pairs land in bin 0
    assert np.all(np.asarray(hist["dist"])[np.arange(L), np.arange(L), 0] == 1)


def test_geometry_maps_diagonal_gradient_finite():
    """Regression: the pairwise distance in geometry_maps_6d must keep a
    FINITE gradient through the i==i diagonal (zero difference vector).
    The epsilon belongs under the sqrt, not added to the vector — the old
    `norm(cb_i - cb_j + eps)` form biased every distance and was the exact
    pattern energy.py's own comment warns against."""
    L = 10
    rng = np.random.default_rng(4)
    phi = jnp.asarray(rng.uniform(-np.pi, np.pi, L))

    def loss(p):
        coords = build_backbone(p, jnp.zeros(L), jnp.full((L,), np.pi))
        maps = geometry_maps_6d(coords["N"], coords["CA"], coords["C"])
        # sum of the raw distance map, diagonal included
        return jnp.sum(maps["dist"])

    g = jax.grad(loss)(phi)
    assert np.all(np.isfinite(np.asarray(g)))

    # and the distances themselves are unbiased: d(i,j) == |cb_i - cb_j|
    coords = build_backbone(phi, jnp.zeros(L), jnp.full((L,), np.pi))
    maps = geometry_maps_6d(coords["N"], coords["CA"], coords["C"])
    cb = np.asarray(virtual_cb(coords["N"], coords["CA"], coords["C"]))
    want = np.linalg.norm(cb[:, None] - cb[None, :], axis=-1)
    np.testing.assert_allclose(np.asarray(maps["dist"]), want,
                               rtol=1e-5, atol=1e-4)


def test_virtual_cb_close_to_real_cb_geometry():
    # virtual CB should sit ~1.53 A from CA
    L = 6
    coords = build_backbone(
        jnp.full((L,), -1.0), jnp.full((L,), -0.8), jnp.full((L,), np.pi))
    cb = np.asarray(coords["CB"])
    ca = np.asarray(coords["CA"])
    d = np.linalg.norm(cb - ca, axis=-1)
    assert np.all((d > 1.4) & (d < 1.65))


def test_place_atom_internal_coords():
    a = jnp.array([0.0, 1.0, 0.0])
    b = jnp.array([0.0, 0.0, 0.0])
    c = jnp.array([1.5, 0.0, 0.0])
    r, th, ph = 1.2, np.deg2rad(109.0), 0.7
    d = place_atom(a, b, c, r, th, ph)
    assert abs(float(jnp.linalg.norm(d - c)) - r) < 1e-6
    assert abs(float(bond_angle(b, c, d)) - th) < 1e-6
    assert abs(float(dihedral(a, b, c, d)) - ph) < 1e-6
