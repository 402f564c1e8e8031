"""Training-example construction: (a3m, native PDB) -> features + labels.

The reference distributes no training code (checkpoints are downloaded
artifacts; SURVEY.md §4). This module closes the loop TPU-natively: native
geometry is measured and binned with EXACTLY the inference-side kernels
(trx2dy.geometry), so the label convention matches the predicted-histogram
contract bin-for-bin (dist 37 with bin 0 = no contact, omega/theta 25,
phi 13 — with the reference's theta-into-phi binning quirk DISABLED for
training, since labels should be correct phi bins).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from trx2dy.io.a3m import parse_a3m
from trx2dy.io.pdbio import read_pdb_backbone
from trx2dy.geometry.transforms import geometry_maps_6d, virtual_cb
from trx2dy.geometry.binning import bin_geometry_maps


class TrainExample(NamedTuple):
    msa: np.ndarray            # (R, L) tokens
    labels: Dict[str, np.ndarray]   # bin indices (L, L) per geometry
    mask: np.ndarray           # (L, L) valid-pair mask
    seq: str


def labels_from_structure(coords: dict, seq: str,
                          phi_compat_bug: bool = False):
    """Bin-index labels + mask from native backbone coordinates.

    Residues with missing N/CA/C are masked out; real CBs are used for
    non-GLY when present (the measurement convention, utils.py:125-150).
    """
    n = np.asarray(coords["N"])
    ca = np.asarray(coords["CA"])
    c = np.asarray(coords["C"])
    ok = ~(np.isnan(n).any(-1) | np.isnan(ca).any(-1) | np.isnan(c).any(-1))
    n, ca, c = (np.nan_to_num(x) for x in (n, ca, c))
    vcb = np.asarray(virtual_cb(jnp.asarray(n), jnp.asarray(ca),
                                jnp.asarray(c)))
    cb = np.asarray(coords.get("CB"))
    if cb is not None:
        cb = np.where(np.isnan(cb).any(-1, keepdims=True), vcb, cb)
    else:
        cb = vcb
    maps = geometry_maps_6d(jnp.asarray(n, jnp.float32),
                            jnp.asarray(ca, jnp.float32),
                            jnp.asarray(c, jnp.float32),
                            cb=jnp.asarray(cb, jnp.float32),
                            atom_mask=jnp.asarray(ok))
    hist = bin_geometry_maps(maps["dist"], maps["omega"], maps["theta"],
                             maps["phi"], angle=True,
                             phi_compat_bug=phi_compat_bug)
    labels = {k: np.asarray(jnp.argmax(v, axis=-1), np.int32)
              for k, v in hist.items()}
    mask = ok[:, None] & ok[None, :]
    return labels, mask


def load_example(a3m_path: str, pdb_path: str, msa_limit: int = 2000,
                 ) -> Optional[TrainExample]:
    """One training example; None when MSA/native lengths disagree."""
    msa = parse_a3m(a3m_path, limit=msa_limit)
    coords, seq = read_pdb_backbone(pdb_path)
    if msa.shape[1] != len(seq):
        return None
    labels, mask = labels_from_structure(coords, seq)
    return TrainExample(msa=msa, labels=labels, mask=mask, seq=seq)
