"""Diagnose cart-refined geometry strain (ideality CI bar).

Reproduces tests/test_physics.py::TestProductionProtocolQuality's fixture
fold ONCE, caches the pre-cartesian-refinement atoms + restraints to
/tmp/ideality_cache.npz, then reports bond/angle deviation maxima at each
stage of cartesian_refine (post-L-BFGS, post-idealize) plus where along
the chain the max strain sits. Re-runs reuse the cache so idealize/weight
experiments iterate in seconds.

Usage: python scripts/debug_ideality.py [--refold] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = "/tmp/ideality_cache.npz"


def _devs(atoms):
    from trx2dy.geometry.nerf import (
        BOND_N_CA, BOND_CA_C, BOND_C_N,
        ANGLE_N_CA_C, ANGLE_CA_C_N, ANGLE_C_N_CA,
    )
    n = np.asarray(atoms["N"])
    ca = np.asarray(atoms["CA"])
    c = np.asarray(atoms["C"])

    def blen(a, b):
        return np.linalg.norm(a - b, axis=-1)

    def bang(a, b, cc):
        u = a - b
        v = cc - b
        cos = (u * v).sum(-1) / (
            np.linalg.norm(u, axis=-1) * np.linalg.norm(v, axis=-1))
        return np.arccos(np.clip(cos, -1.0, 1.0))

    bonds = {
        "N-CA": np.abs(blen(n, ca) - BOND_N_CA),
        "CA-C": np.abs(blen(ca, c) - BOND_CA_C),
        "C-N": np.abs(blen(c[:, :-1], n[:, 1:]) - BOND_C_N),
    }
    angs = {
        "N-CA-C": np.abs(bang(n, ca, c) - ANGLE_N_CA_C),
        "CA-C-N": np.abs(bang(ca[:, :-1], c[:, :-1], n[:, 1:])
                         - ANGLE_CA_C_N),
        "C-N-CA": np.abs(bang(c[:, :-1], n[:, 1:], ca[:, 1:])
                         - ANGLE_C_N_CA),
    }
    return bonds, angs


def report(tag, atoms):
    bonds, angs = _devs(atoms)
    bmax = max(v.max() for v in bonds.values())
    amax = max(v.max() for v in angs.values())
    parts = []
    for k, v in bonds.items():
        i = np.unravel_index(np.argmax(v), v.shape)
        parts.append(f"{k}={v.max():.3f}@b{i[0]}r{i[1]}")
    for k, v in angs.items():
        i = np.unravel_index(np.argmax(v), v.shape)
        parts.append(f"{k}={np.rad2deg(v.max()):.1f}deg@b{i[0]}r{i[1]}")
    print(f"[{tag}] bond_max={bmax:.4f} A  angle_max="
          f"{np.rad2deg(amax):.2f} deg   {' '.join(parts)}")
    return bmax, amax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--refold", action="store_true")
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    from trx2dy.utils.cache import enable_compilation_cache
    enable_compilation_cache("/tmp/trx2dy_jax_cache_tests")

    import jax
    from scripts.native_recovery import native_histograms
    from trx2dy.io.pdbio import read_pdb_backbone
    from trx2dy.physics.folder import fold_ensemble, SCOREFXN_RELAX
    from trx2dy.physics.restraints import (
        compile_restraints, FoldParams, restraint_masks)

    coords, seq = read_pdb_backbone("/root/reference/example/apo.pdb")
    npz = native_histograms(coords["N"], coords["CA"], coords["C"],
                            coords["CB"])

    if args.refold or not os.path.isfile(CACHE):
        # Same fold as the fixture but WITHOUT the final cart stage, so the
        # cached atoms are the refinement INPUT.
        res = fold_ensemble(npz, seq, jax.random.PRNGKey(0), n_decoys=2,
                            max_iter=300, fastrelax=True, oversample=0.5,
                            cart_refine=False)
        np.savez(CACHE, **{f"atom_{k}": np.asarray(v)
                           for k, v in res.atoms.items()})
        print("cached pre-cart atoms ->", CACHE)

    z = np.load(CACHE)
    import jax.numpy as jnp
    atoms = {k[len("atom_"):]: jnp.asarray(z[k]) for k in z.files}

    rst = compile_restraints(npz, FoldParams(), use_orient=True)
    L = len(seq)
    relax2 = restraint_masks(rst, seq, 1, L, pcut=0.30, nogly=True)

    report("pre-cart (NeRF ideal)", atoms)

    # the production final-stage call, piecewise
    from trx2dy.physics import cartmin
    from trx2dy.physics.energy import weights_to_vec
    from trx2dy.physics.minimize import lbfgs_minimize

    w_vec = weights_to_vec(SCOREFXN_RELAX)
    B, Lr, _ = atoms["N"].shape
    efun = cartmin._cart_efun(atoms, (rst, relax2), w_vec, "dense")
    mres = lbfgs_minimize(efun, jnp.zeros((B, 5 * Lr * 3)), max_iter=200)
    refined_raw = cartmin._delta_unpack(atoms, mres.x)
    report("post-refine (no idealize)", refined_raw)

    x_id = cartmin._idealize(atoms, mres.x)
    report("post-idealize (shipped)", cartmin._delta_unpack(atoms, x_id))

    # experiments: longer idealize, stronger scale, weaker tether
    for iters, scale, tether in ((200, 10.0, 30.0), (50, 30.0, 30.0),
                                 (200, 30.0, 10.0), (400, 30.0, 5.0)):
        def ideal_fun(d, scale=scale, tether=tether):
            at = cartmin._delta_unpack(atoms, d)
            e = jax.vmap(lambda a: cartmin.cart_bonded_energy(
                a, k_bond=scale * cartmin.K_BOND,
                k_angle=scale * cartmin.K_ANGLE))(at)
            return e + tether * jnp.sum((d - mres.x) ** 2, axis=-1)
        xi = lbfgs_minimize(ideal_fun, mres.x, max_iter=iters).x
        at = cartmin._delta_unpack(atoms, xi)
        disp = float(jnp.abs(at["CA"] - refined_raw["CA"]).max())
        bmax, amax = report(
            f"idealize iters={iters} scale={scale} tether={tether}", at)
        print(f"    max CA move off refined pose: {disp:.3f} A")


if __name__ == "__main__":
    main()
