"""Torch checkpoint -> JAX flat-param conversion.

The pretrained trRosettaX2 checkpoints (trX2(NMR)_40.pth / trX2(X-ray)_40.pth,
run_inference.py:298-302) are plain torch state_dicts of DistPredictorBaseline
(keys prefixed 'net.'). Because trx2dy.models.predictor2d uses those exact key
names, conversion is a dtype cast per tensor — no renaming, no reshaping
(conv kernels keep torch's OIHW layout; the JAX conv transposes at use site).

torch is only imported here (CPU build in the image); inference never needs
it. Converted weights can be cached as .npz for torch-free reload.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


def state_dict_to_params(state_dict, dtype=np.float32) -> Dict[str, jnp.ndarray]:
    """Flat {torch key: array} param dict from a torch state_dict (or any
    mapping of tensors/arrays)."""
    params = {}
    for k, v in state_dict.items():
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                         else v, dtype=dtype)
        params[k] = jnp.asarray(arr)
    return params


def load_torch_checkpoint(path: str, dtype=np.float32) -> Dict[str, jnp.ndarray]:
    """Load a .pth state_dict checkpoint into a JAX param dict."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):       # whole-module checkpoint
        sd = sd.state_dict()
    return state_dict_to_params(sd, dtype=dtype)


def save_params_npz(params: Dict[str, jnp.ndarray], path: str) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params_npz(path: str) -> Dict[str, jnp.ndarray]:
    with np.load(path) as f:
        return {k: jnp.asarray(f[k]) for k in f.files}


def load_esm_checkpoint(path: str, dtype=np.float32) -> Dict[str, jnp.ndarray]:
    """Load a fairseq ESM-MSA checkpoint (.pt) into the flat layout
    trx2dy.models.esm_msa expects.

    Replicates the reference's state-dict upgrade
    (esm/pretrained.py:119-131 _load_model_and_alphabet_core_v1,
    arch msa_transformer): strip 'encoder.' / 'sentence_encoder.' prefixes
    and SWAP 'row' <-> 'column' in key names (the checkpoint stores the
    axial attentions under exchanged names). Plain state_dicts (already
    upgraded / saved by us) pass through unchanged.

    Loader-arm note: the real esm_msa1_t12_100M_UR50S.pt has
    embed_positions_msa=True, so the reference selects MSATransformer1b
    (pretrained.py:125-132) rather than the base MSATransformer. The two
    share identical parameters — the 1b arm only adds the custom res_idx
    forward argument (esm/model.py:586-602), which esm_msa_apply supports
    — so this conversion covers both arms unchanged (its
    msa_position_embedding is (1, 1024, 1, 1), the emb_dim==1
    initial-release shape the loader special-cases).
    """
    import torch
    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data:
        def swap_rc(s):
            if "row" in s:
                return s.replace("row", "column")
            return s.replace("column", "row")

        def strip(s):
            # order matters: 'sentence_encoder.' first, then 'encoder.'
            # (pretrained.py:124: prs1(prs2(...)))
            s = "".join(s.split("sentence_encoder.")[1:]) \
                if "sentence_encoder." in s else s
            s = "".join(s.split("encoder.")[1:]) if "encoder." in s else s
            return s

        sd = {strip(swap_rc(k)): v for k, v in data["model"].items()}
    else:
        sd = data
    return state_dict_to_params(sd, dtype=dtype)
