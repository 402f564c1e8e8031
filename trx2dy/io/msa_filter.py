"""MSA diversity filtering — the hhfilter substitute.

The reference shells out to HH-suite's hhfilter to reduce deep MSAs to
<= nrows maximally-diverse sequences (`hhfilter -i .. -o .. -diff N`,
trRosettaX2/predict.py:141-147). Equivalent here: greedy maximin selection on
Hamming distance — keep the query, then repeatedly add the sequence with the
largest minimum distance to the kept set. This preserves the property the
pipeline needs (a diversity-maximising row subset of the alignment); exact
hhfilter scoring (which works on suboptimal-alignment posteriors) is not a
numeric contract of the pipeline.

Vectorized numpy; O(N_kept * N) distance updates.
"""
from __future__ import annotations

import numpy as np


def filter_msa_diff(msa: np.ndarray, n_keep: int) -> np.ndarray:
    """Select <= n_keep diverse rows of an (N, L) token MSA (query kept).

    Returns the selected ROW INDICES (sorted, query first), so callers can
    slice tokens or an a3m file consistently.
    """
    N = msa.shape[0]
    if N <= n_keep:
        return np.arange(N)
    sel = [0]
    # min Hamming distance of every row to the selected set
    mind = (msa != msa[0]).sum(axis=1).astype(np.int64)
    mind[0] = -1
    for _ in range(n_keep - 1):
        nxt = int(np.argmax(mind))
        if mind[nxt] <= 0:
            break
        sel.append(nxt)
        d = (msa != msa[nxt]).sum(axis=1)
        mind = np.minimum(mind, d)
        mind[nxt] = -1
    sel = sorted(sel)
    return np.asarray(sel)


def hhfilter_equivalent(msa: np.ndarray, nrows: int,
                        trigger_ratio: float = 1.1) -> np.ndarray:
    """predict.py:141-147 semantics: filter only when len(msa) exceeds
    trigger_ratio * nrows; otherwise return the MSA unchanged."""
    if msa.shape[0] > trigger_ratio * nrows:
        return msa[filter_msa_diff(msa, nrows)]
    return msa
