"""OSD post-decoder parity tests: batched bit-packed OSD vs the per-shot
NumPy oracle, plus the syndrome-consistency property (SURVEY.md §4.2)."""

import numpy as np
import pytest

from qldpcsim_tpu.codes import get_code
from qldpcsim_tpu.decoders import DecoderConfig, TannerGraph, make_ms_decoder, make_osd

import oracle


def _failed_shots(codename, p, n_shots, max_iter, seed):
    """Generate shots and return decoder-failed ones with their posteriors."""
    rng = np.random.default_rng(seed)
    code = get_code(codename)
    H = np.asarray(code.Hz)
    m, n = H.shape
    errs = (rng.random((n_shots, n)) < p).astype(np.int8)
    syn = ((errs.astype(np.int64) @ H.T.astype(np.int64)) % 2).astype(np.int8)
    graph = TannerGraph.build(H)
    decode = make_ms_decoder(graph, DecoderConfig(max_iter=max_iter))
    res = decode(syn, p)
    conv = np.asarray(res.converged)
    failed = ~conv
    return (H, np.asarray(res.e_hat)[failed], syn[failed],
            np.asarray(res.posterior)[failed])


@pytest.mark.parametrize("order", [0, 1, 2])
def test_osd_matches_oracle(order):
    # Aggressive noise + few iterations so plenty of shots fail into OSD.
    H, e_hat, syn, post = _failed_shots("lp04_0", 0.09, 64, 3, seed=7)
    assert e_hat.shape[0] >= 4, "need some failed shots for the test"
    osd = make_osd(H, order)
    out = np.asarray(osd(e_hat, syn, post))
    for s in range(e_hat.shape[0]):
        ref = oracle.osd_decode(H, e_hat[s].copy(), syn[s], post[s], order)
        assert (out[s] == ref).all(), f"shot {s} OSD-{order} mismatch"


def test_osd_syndrome_consistency():
    """OSD-0 on achievable syndromes returns syndrome-consistent vectors."""
    H, e_hat, syn, post = _failed_shots("lp04_0", 0.09, 64, 3, seed=11)
    osd = make_osd(H, 0)
    out = np.asarray(osd(e_hat, syn, post)).astype(np.int64)
    syn_out = (out @ np.asarray(H, np.int64).T) % 2
    assert (syn_out == syn).all()


def test_osd_order_improves_weight():
    """Higher order can only lower (or keep) the best candidate weight."""
    H, e_hat, syn, post = _failed_shots("lp04_0", 0.09, 48, 3, seed=13)
    w = {}
    for order in (0, 2):
        out = np.asarray(make_osd(H, order)(e_hat, syn, post))
        w[order] = out.sum(axis=1)
    assert (w[2] <= w[0]).all()
