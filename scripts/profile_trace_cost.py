"""Split the per-process FIXED cost of the fold program family into
per-program trace+lower times (host Python work — backend-independent).

The e2e pipeline pays ~158 s before its first decoy (EXAMPLE_RESULTS.md);
that cost = jit tracing + StableHLO lowering (host) + compile-cache
deserialize + executable load (tunnel). This script times the HOST part —
`jitted.lower(args)` per program at production shapes — so the AOT-cache
work (jax.export serialization) can be sized against it.

Usage: JAX_PLATFORMS=cpu python scripts/profile_trace_cost.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# setdefault would NOT override the harness's exported JAX_PLATFORMS=axon,
# and this host-only profile must never grab the single-tenant TPU tunnel.
os.environ.pop("JAX_PLATFORMS", None)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from trx2dy.physics.restraints import (
    FoldParams, compile_restraints, restraint_masks,
)
from trx2dy.physics import folder as F
from trx2dy.physics.compact import compact_restraints_lanes
from trx2dy.physics.minimize import lbfgs_init  # noqa: F401


def perturbed_npzs(base: dict, n: int, seed: int = 0) -> list:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        d = {}
        for k in ("dist", "omega", "theta", "phi"):
            a = np.asarray(base[k], np.float32)
            a = a * rng.uniform(0.6, 1.0, size=a.shape[:2] + (1,)).astype(
                np.float32)
            a = a / np.maximum(a.sum(-1, keepdims=True), 1e-9)
            d[k] = a
        out.append(d)
    return out


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label:<44s} {dt:7.2f}s", flush=True)
    return out, dt


def main():
    base = dict(np.load(
        "/root/reference/example/output/seq/pred_npz/seq_NMR.npz"))
    with open("/root/reference/example/seq.fasta") as f:
        seq = "".join(l.strip() for l in f if not l.startswith(">"))
    L = len(seq)
    M = 32                                   # driver lane bucket
    params = FoldParams()
    npzs = perturbed_npzs(base, 8)
    rsts = [compile_restraints(z, params, use_orient=True) for z in npzs]
    fan = [i % 8 for i in range(M)]
    rsts_f = [rsts[u] for u in fan]
    sm = [F._stage_masks_centroid(r, seq, 2, params.PCUT) for r in rsts]
    r1 = [restraint_masks(r, seq, 1, L, pcut=0.15, nogly=True)
          for r in rsts]
    cl = compact_restraints_lanes(rsts_f, [sm[u][0] for u in fan])
    cl1 = compact_restraints_lanes(rsts_f, [r1[u] for u in fan])
    print(f"lanes M={M} L={L}; table pairs: dist={cl.dist.i.shape}",
          flush=True)

    x = jnp.zeros((M, 3 * L), jnp.float32)
    freeze = jnp.zeros((M,), bool)
    w = F.weights_to_vec(F.SCOREFXN_CENT)
    total = 0.0

    st, dt = t("_stage_init_jit.lower+compile (multi)", lambda: jax.jit(
        lambda *a: F._stage_init_jit(*a, dist_on_ca=False, multi=True,
                                     remat=False, fused=False,
                                     res_mask=None,
                                     nm=F.NONMONOTONE_WINDOW))
        .lower(x, cl, None, w, freeze).compile())
    total += dt
    st_val = F._stage_init_jit(x, cl, None, w, freeze, multi=True,
                               nm=F.NONMONOTONE_WINDOW)

    _, dt = t("_stage_run_jit.lower+compile (multi)", lambda: jax.jit(
        lambda *a: F._stage_run_jit(*a, dist_on_ca=False, multi=True,
                                    remat=False, fused=False,
                                    res_mask=None))
        .lower(st_val, cl, None, w, jnp.int32(250)).compile())
    total += dt

    # cartesian family (relax round-1 block + per-lane refine share these)
    from trx2dy.physics import cartmin as C
    tp = x.reshape(M, 3, L)
    atoms = F._atoms_jit(tp)
    delta = jnp.zeros((M, 5 * 3 * L), jnp.float32)
    w_rel = F.weights_to_vec(F.SCOREFXN_RELAX)
    cst, dt = t("_cart_init_jit.lower+compile (lanes)", lambda: jax.jit(
        lambda *a: C._cart_init_jit(*a, kind="lanes", res_mask=None))
        .lower(atoms, delta, cl1, w_rel).compile())
    total += dt
    cst_val = C._cart_init_jit(atoms, delta, cl1, w_rel, "lanes")
    _, dt = t("_cart_run_jit.lower+compile (lanes)", lambda: jax.jit(
        lambda *a: C._cart_run_jit(*a, kind="lanes", res_mask=None))
        .lower(cst_val, atoms, cl1, w_rel, jnp.int32(250)).compile())
    total += dt

    _, dt = t("_atoms_jit / _project_torsions_jit", lambda: (
        jax.jit(F._atoms_jit.__wrapped__).lower(tp).compile(),
        jax.jit(F._project_torsions_jit.__wrapped__)
        .lower(x, atoms).compile()))
    total += dt

    from trx2dy.physics.sidechain import _pack_jit, pack_input
    pin = pack_input(seq)
    chi0 = jnp.zeros((M, L, 4), jnp.float32)
    pairs = jnp.zeros((0, 2), jnp.int32)
    _, dt = t("_pack_jit.lower+compile", lambda: jax.jit(
        lambda *a: _pack_jit(*a, max_iter=200))
        .lower(tp, chi0, pairs, pin).compile())
    total += dt

    print(f"  {'TOTAL':<44s} {total:7.2f}s")


if __name__ == "__main__":
    main()
