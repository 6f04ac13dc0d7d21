"""Pin the quantized-argmax tie-break of the coherence kernel
(context._qkey): exact score ties — which genuinely occur (two
candidates updating to exactly 0.5 at sf0.1, see the ctx1 oracle
docstring) — must resolve to the FIRST candidate in qid-sorted order
on every engine and every run, never by sub-ulp float-sum noise."""

import numpy as np
import pandas as pd

from t_res_spark.operators.context import _conv_coherence, _qkey


def test_qkey_collapses_noise_preserves_margins():
    base = 0.5
    noisy = base + 4e-16  # a few ulp of summation noise
    separated = base + 3e-9  # a genuine (if tiny) margin
    k = _qkey(np.array([base, noisy, separated]))
    assert k[0] == k[1], "ulp noise must land in the same 1e-9 cell"
    assert k[2] > k[0], "a >2e-9 margin must stay a distinct cell"


def test_exact_prior_tie_breaks_to_lowest_qid():
    # one singleton conversation, two candidates with EQUAL priors;
    # n_loops=0 reduces selection to argmax(prior) — the tie must go
    # to the lexicographically first qid ("Q0" < "Q18"), matching the
    # oracle's ORDER BY ... DESC, qid ASC
    emb = [0.0] * 4
    pdf = pd.DataFrame(
        {
            "conv_id": ["c0", "c0"],
            "mention_id": ["m0", "m0"],
            "mention": ["x", "x"],
            "qid": ["Q18", "Q0"],  # deliberately unsorted input order
            "prior": [0.5, 0.5],
            "emb": [emb, emb],
            "is_prior": [False, False],
            "prior_qid": [None, None],
        }
    )
    out = _conv_coherence(pdf, n_loops=0, round_dp=None)
    assert out["prediction"].tolist() == ["Q0"]
