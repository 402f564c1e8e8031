"""Sidechain packing: full-atom builds on folded backbones.

Covers the full-atom output contract of the reference folder
(folding/folding.py:200-273 FastRelax with chi DoFs + dump full-atom PDB;
disulfide detection folding.py:48,233)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trx2dy.geometry.nerf import build_backbone
from trx2dy.physics.folder import random_torsions
from trx2dy.physics.sidechain import (
    PackInput, pack_input, atom14_from_torsions, detect_disulfides,
    pack_ensemble, _clash_energy, _rotamer_energy, _pack_energy,
    SS_BOND_LENGTH,
)

SEQ = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"   # 33 aa, varied sidechains


@pytest.fixture(scope="module")
def torsions():
    return np.asarray(random_torsions(jax.random.PRNGKey(3),
                                      len(SEQ), 2))


class TestAtom14Build:
    def test_psi_convention_places_O_on_nerf_O(self, torsions):
        """The psi rigid-group angle == our psi torsion: the frame-built O
        must coincide with the NeRF O (validates the AF2 psi convention
        geometrically, not in angle space)."""
        pin = pack_input(SEQ)
        t = jnp.asarray(torsions[0])
        chi = jnp.zeros((len(SEQ), 4))
        xyz, mask, atoms = atom14_from_torsions(t, chi, pin,
                                                pin_backbone=False)
        o_err = np.linalg.norm(np.asarray(xyz[:, 3]) - np.asarray(atoms["O"]),
                               axis=-1)
        # interior residues; ideal-geometry mismatch only (< 0.2 A)
        assert o_err[:-1].max() < 0.2, o_err[:-1].max()

    def test_backbone_frame_consistency(self, torsions):
        """Frame-built N/CA/C must land on the NeRF backbone up to the
        literature-vs-NeRF ideal geometry difference."""
        pin = pack_input(SEQ)
        t = jnp.asarray(torsions[0])
        xyz, _, atoms = atom14_from_torsions(t, jnp.zeros((len(SEQ), 4)),
                                             pin, pin_backbone=False)
        assert np.abs(np.asarray(xyz[:, 1]) - np.asarray(atoms["CA"])).max() \
            < 1e-4                                   # CA is the frame origin
        for slot, name in ((0, "N"), (2, "C")):
            err = np.linalg.norm(np.asarray(xyz[:, slot])
                                 - np.asarray(atoms[name]), axis=-1)
            assert err.max() < 0.1, (name, err.max())

    def test_pinned_backbone_is_exact(self, torsions):
        pin = pack_input(SEQ)
        t = jnp.asarray(torsions[0])
        xyz, _, atoms = atom14_from_torsions(t, jnp.zeros((len(SEQ), 4)), pin)
        for slot, name in ((0, "N"), (1, "CA"), (2, "C"), (3, "O")):
            assert np.abs(np.asarray(xyz[:, slot])
                          - np.asarray(atoms[name])).max() == 0.0

    def test_sidechain_bond_lengths(self, torsions):
        """CB-CG bond ~1.5 A for residues that have CG (literature
        geometry must survive the frame composition)."""
        from trx2dy.models import constants as rc
        pin = pack_input(SEQ)
        t = jnp.asarray(torsions[0])
        xyz, mask, _ = atom14_from_torsions(t, jnp.zeros((len(SEQ), 4)), pin)
        xyz = np.asarray(xyz)
        for i, aa in enumerate(SEQ):
            names = [str(n) for n in rc.atom14_names[pin.aatype[i]]]
            if "CG" in names and "CB" in names:
                d = np.linalg.norm(xyz[i, names.index("CG")]
                                   - xyz[i, names.index("CB")])
                assert 1.3 < d < 1.7, (aa, d)

    def test_chi_rotation_moves_only_its_group(self, torsions):
        """chi1 = pi flip moves gamma atoms but not N/CA/C/O/CB."""
        pin = pack_input(SEQ)
        t = jnp.asarray(torsions[0])
        x0, _, _ = atom14_from_torsions(t, jnp.zeros((len(SEQ), 4)), pin)
        chi = jnp.zeros((len(SEQ), 4)).at[:, 0].set(np.pi)
        x1, _, _ = atom14_from_torsions(t, chi, pin)
        diff = np.linalg.norm(np.asarray(x1 - x0), axis=-1)
        assert diff[:, :5].max() < 1e-4
        assert diff[:, 5:].max() > 0.5       # gamma+ atoms moved


class TestPacking:
    def test_pack_reduces_clash(self, torsions):
        pin = pack_input(SEQ)
        t = jnp.asarray(torsions)
        xyz14, mask, chi = pack_ensemble(t, SEQ, max_iter=40)
        e_packed = jax.vmap(_clash_energy, in_axes=(0, None))(xyz14, pin)
        chi0 = jnp.full((t.shape[0], len(SEQ), 4), np.pi) * pin.chi_mask
        x0 = jax.vmap(atom14_from_torsions, in_axes=(0, 0, None))(
            t, chi0, pin)[0]
        e_start = jax.vmap(_clash_energy, in_axes=(0, None))(x0, pin)
        assert np.all(np.asarray(e_packed) <= np.asarray(e_start) + 1e-3)

    def test_pack_backbone_untouched(self, torsions):
        t = jnp.asarray(torsions)
        atoms = jax.vmap(lambda tt: build_backbone(tt[0], tt[1], tt[2]))(t)
        xyz14, _, _ = pack_ensemble(t, SEQ, max_iter=10)
        for slot, name in ((0, "N"), (1, "CA"), (2, "C"), (3, "O")):
            # identical coordinates up to compile-variant ULP noise
            assert np.abs(np.asarray(xyz14[:, :, slot])
                          - np.asarray(atoms[name])).max() < 1e-4

    def test_pack_onto_explicit_backbone(self, torsions):
        """backbone= pins the atom14 backbone slots to the GIVEN (e.g.
        cartesian-refined) coordinates instead of the ideal NeRF rebuild,
        and sidechains still pack to finite geometry around them."""
        t = jnp.asarray(torsions)
        atoms = jax.vmap(lambda tt: build_backbone(tt[0], tt[1], tt[2]))(t)
        rng = np.random.default_rng(5)
        refined = {k: jnp.asarray(np.asarray(v)
                                  + rng.normal(scale=0.05,
                                               size=v.shape
                                               ).astype(np.float32))
                   for k, v in atoms.items()}
        xyz14, _, _ = pack_ensemble(t, SEQ, max_iter=10, backbone=refined)
        for slot, name in ((0, "N"), (1, "CA"), (2, "C"), (3, "O")):
            assert np.abs(np.asarray(xyz14[:, :, slot])
                          - np.asarray(refined[name])).max() < 1e-4
        assert np.isfinite(np.asarray(xyz14)).all()

    def test_masked_chi_stays_zero(self, torsions):
        t = jnp.asarray(torsions)
        _, _, chi = pack_ensemble(t, SEQ, max_iter=10)
        pin = pack_input(SEQ)
        assert np.abs(np.asarray(chi) * (1 - np.asarray(pin.chi_mask))).max() \
            == 0.0

    def test_full_atom_pdb_roundtrip(self, torsions, tmp_path):
        from trx2dy.io.pdbio import write_pdb_atom14, read_pdb_backbone
        t = jnp.asarray(torsions)
        xyz14, mask, _ = pack_ensemble(t, SEQ, max_iter=5)
        path = str(tmp_path / "fa.pdb")
        write_pdb_atom14(path, SEQ, np.asarray(xyz14[0]), np.asarray(mask))
        coords, seq, _ = read_pdb_backbone(path, return_resseq=True)
        assert seq == SEQ
        assert np.allclose(coords["CA"], np.asarray(xyz14[0, :, 1]),
                           atol=2e-3)
        n_atoms = sum(1 for ln in open(path) if ln.startswith("ATOM"))
        assert n_atoms == int(np.asarray(mask).sum())   # all heavy atoms


class TestDisulfide:
    def test_detect_and_bond(self):
        """Two CYS folded adjacent in space pack their SG atoms to ~2 A."""
        seq = "CAAAC" + "A" * 3
        # hairpin-ish torsions bringing the two CYS close: use a compact
        # helix so residues 0 and 4 are one turn apart (~6 A CB-CB)
        L = len(seq)
        phi = jnp.full((L,), jnp.deg2rad(-60.0))
        psi = jnp.full((L,), jnp.deg2rad(-45.0))
        omg = jnp.full((L,), jnp.pi)
        t = jnp.stack([phi, psi, omg])
        atoms = build_backbone(phi, psi, omg)
        pairs = detect_disulfides(np.asarray(atoms["CB"]), seq, cutoff=7.0)
        assert pairs.shape == (1, 2)
        pin = pack_input(seq)

        def sg_dist(xyz14):
            sg = np.asarray(xyz14[0, :, pin.sg_slot])
            return float(np.linalg.norm(sg[pairs[0, 0]] - sg[pairs[0, 1]]))

        with_ss = sg_dist(pack_ensemble(t[None], seq, max_iter=120,
                                        pairs=pairs)[0])
        without = sg_dist(pack_ensemble(
            t[None], seq, max_iter=120,
            pairs=np.zeros((0, 2), np.int32))[0])
        # the term pulls the SG pair together as far as the fixed CB-CB
        # separation (one helix turn ~6 A here) geometrically allows
        assert with_ss < without - 0.3, (with_ss, without)
        assert with_ss < 4.2, with_ss

    def test_no_pairs_far_apart(self):
        seq = "CAAAAAAAAAAAAAAAAAAAC"
        phi = jnp.full((len(seq),), jnp.deg2rad(-120.0))
        psi = jnp.full((len(seq),), jnp.deg2rad(130.0))   # extended
        atoms = build_backbone(phi, psi, jnp.full((len(seq),), jnp.pi))
        pairs = detect_disulfides(np.asarray(atoms["CB"]), seq)
        assert pairs.shape[0] == 0
