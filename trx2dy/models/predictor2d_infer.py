"""2D-geometry inference pipeline — pred_2d_geometry equivalent
(utils_trX2dy/utils.py:768-797): a3m -> features -> Predictor2D -> softmaxed
histograms npz.

Checkpoints: either the original torch .pth (converted on the fly via
trx2dy.models.torch_convert) or a previously converted .npz (torch-free).
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from trx2dy.io.a3m import parse_a3m
from trx2dy.models.features import get_f2d
from trx2dy.models.predictor2d import predictor2d_apply

MSA_CUTOFF = 500      # trunk row cap (utils.py:635)
PARSE_LIMIT = 20000   # a3m row cap (utils.py:733)
FLASH_MIN_L = 256     # route triangle attention through the Pallas flash
                      # kernel above this length: at L=400 it is ~28% faster
                      # per forward and ~27x faster to compile than the XLA
                      # logits path (and saves ~1 GB HBM per attention)


def load_params(weight_file: str):
    if weight_file.endswith(".npz"):
        from trx2dy.models.torch_convert import load_params_npz
        return load_params_npz(weight_file)
    from trx2dy.models.torch_convert import load_torch_checkpoint
    return load_torch_checkpoint(weight_file)


@functools.partial(jax.jit, static_argnames=("use_flash",))
def _forward(params, f2d, msa_trunk, use_flash=False):
    logits = predictor2d_apply(params, f2d, msa_trunk, use_flash=use_flash)
    return {k: jax.nn.softmax(v, axis=-1) for k, v in logits.items()}


def predict_geometry(params, msa: np.ndarray,
                     use_flash: Optional[bool] = None) -> Dict[str, np.ndarray]:
    """Softmaxed geometry histograms for an (R, L) token MSA."""
    msa = jnp.asarray(msa)
    if use_flash is None:
        use_flash = (msa.shape[1] >= FLASH_MIN_L
                     and jax.default_backend() == "tpu")
    f2d = get_f2d(msa)
    out = _forward(params, f2d, msa[:MSA_CUTOFF], use_flash=use_flash)
    return {k: np.asarray(v) for k, v in out.items()}


def pred_2d_geometry(weight_file: str, msa_file: str,
                     save_dir: Optional[str] = None,
                     save_name: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Reference pred_2d_geometry: load weights, parse MSA, predict, save."""
    params = load_params(weight_file)
    if msa_file.endswith(".a3m"):
        msa = parse_a3m(msa_file, limit=PARSE_LIMIT)
    elif msa_file.endswith(".npz"):
        msa = np.load(msa_file)["msa"]
        if msa.ndim == 3:
            msa = msa[0]
    else:
        raise ValueError(f"unsupported MSA file {msa_file!r}")
    labels = predict_geometry(params, msa)
    if save_dir is not None:
        np.savez_compressed(os.path.join(save_dir, save_name), **labels)
    return labels
