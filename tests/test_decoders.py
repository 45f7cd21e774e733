"""Batched decoder parity tests against the per-shot NumPy oracle
(SURVEY.md §4.2), plus property tests (zero syndrome, correctable errors)."""

import numpy as np
import pytest

from qldpcsim_tpu.codes import get_code
from qldpcsim_tpu.decoders import (
    DecoderConfig,
    TannerGraph,
    build_layers,
    layerize,
    make_bf_decoder,
    make_bp_decoder,
    make_ms_decoder,
    make_ng_decoder,
)

import oracle


def _sample_shots(rng, H, n_shots, weight_p=0.06):
    """Random error vectors + their true syndromes."""
    m, n = H.shape
    errs = (rng.random((n_shots, n)) < weight_p).astype(np.int8)
    syn = (errs.astype(np.int64) @ H.T.astype(np.int64)) % 2
    return errs, syn.astype(np.int8)


def _layers_of(H, schedule):
    if schedule == "F":
        return [np.arange(H.shape[0])]
    return layerize(H, serial=(schedule == "S"))


@pytest.mark.parametrize("codename,schedule", [
    ("steane", "F"),
    ("steane", "L"),
    ("shor", "S"),
    ("lp04_0", "F"),
    ("lp04_0", "L"),
    ("lp04_0", "S"),
])
def test_ms_matches_oracle(rng, codename, schedule):
    code = get_code(codename)
    H = np.asarray(code.Hz)
    graph = TannerGraph.build(H)
    cfg = DecoderConfig(dec_type="MS", max_iter=12, schedule=schedule)
    decode = make_ms_decoder(graph, cfg)
    errs, syn = _sample_shots(rng, H, 48)
    res = decode(syn, 0.02)
    e_hat = np.asarray(res.e_hat)
    n_iter = np.asarray(res.n_iter)
    conv = np.asarray(res.converged)
    layers = _layers_of(H, schedule)
    for s in range(syn.shape[0]):
        e_ref, it_ref, _post, conv_ref = oracle.ms_decode(H, syn[s], 0.02, 12, layers)
        assert conv[s] == conv_ref, f"shot {s}: convergence mismatch"
        assert n_iter[s] == it_ref, f"shot {s}: iteration count mismatch"
        assert (e_hat[s] == e_ref).all(), f"shot {s}: e_hat mismatch"


@pytest.mark.parametrize("codename,schedule", [
    ("steane", "F"),
    ("shor", "L"),
    ("lp04_0", "F"),
])
def test_bp_matches_oracle(rng, codename, schedule):
    code = get_code(codename)
    H = np.asarray(code.Hz)
    graph = TannerGraph.build(H)
    cfg = DecoderConfig(dec_type="BP", max_iter=10, schedule=schedule)
    decode = make_bp_decoder(graph, cfg)
    errs, syn = _sample_shots(rng, H, 32)
    res = decode(syn, 0.02)
    e_hat = np.asarray(res.e_hat)
    n_iter = np.asarray(res.n_iter)
    layers = _layers_of(H, schedule)
    mismatch = 0
    for s in range(syn.shape[0]):
        e_ref, it_ref, _post, _c = oracle.bp_decode(H, syn[s], 0.02, 10, layers)
        if not ((e_hat[s] == e_ref).all() and n_iter[s] == it_ref):
            mismatch += 1
    # BP is float-heavy; tolerate rare association-order sign flips.
    assert mismatch <= 1, f"{mismatch}/32 BP shots diverged from oracle"


@pytest.mark.parametrize("codename", ["steane", "bicycle"])
def test_bf_matches_oracle(rng, codename):
    code = get_code(codename)
    H = np.asarray(code.Hz)
    graph = TannerGraph.build(H)
    decode = make_bf_decoder(graph, DecoderConfig(dec_type="BF"))
    errs, syn = _sample_shots(rng, H, 64)
    res = decode(syn)
    e_hat = np.asarray(res.e_hat)
    n_iter = np.asarray(res.n_iter)
    for s in range(syn.shape[0]):
        e_ref, it_ref, _c = oracle.bf_decode(H, syn[s])
        assert (e_hat[s] == e_ref).all(), f"shot {s}"
        assert n_iter[s] == it_ref, f"shot {s}"


@pytest.mark.parametrize("codename", ["steane", "bicycle"])
def test_ng_matches_oracle(rng, codename):
    code = get_code(codename)
    H = np.asarray(code.Hz)
    graph = TannerGraph.build(H)
    decode = make_ng_decoder(graph, DecoderConfig(dec_type="NG"))
    errs, syn = _sample_shots(rng, H, 64)
    res = decode(syn)
    e_hat = np.asarray(res.e_hat)
    n_iter = np.asarray(res.n_iter)
    for s in range(syn.shape[0]):
        e_ref, steps_ref = oracle.ng_decode(H, syn[s])
        assert (e_hat[s] == e_ref).all(), f"shot {s}"
        assert n_iter[s] == steps_ref, f"shot {s}"


def test_zero_syndrome_fast_convergence():
    """Zero syndrome -> zero error in <=1 iteration (SURVEY.md §4.2)."""
    code = get_code("steane")
    H = np.asarray(code.Hz)
    graph = TannerGraph.build(H)
    zero = np.zeros((4, H.shape[0]), np.int8)
    for make, needs_p in [(make_ms_decoder, True), (make_bp_decoder, True),
                          (make_bf_decoder, False), (make_ng_decoder, False)]:
        cfg = DecoderConfig(max_iter=20)
        decode = make(graph, cfg) if make in (make_bf_decoder, make_ng_decoder) \
            else make(graph, cfg)
        res = decode(zero, 0.01) if needs_p else decode(zero)
        assert not np.asarray(res.e_hat).any()
        assert np.asarray(res.converged).all()
        expected_iters = 0 if make is make_ng_decoder else 1
        assert (np.asarray(res.n_iter) == expected_iters).all()


def test_single_errors_decode_exactly():
    """Weight-1 errors below half-distance decode exactly on Shor/Steane."""
    for codename in ("shor", "steane"):
        code = get_code(codename)
        H = np.asarray(code.Hz)
        n = H.shape[1]
        errs = np.eye(n, dtype=np.int8)
        syn = (errs @ H.T) % 2
        graph = TannerGraph.build(H)
        decode = make_ms_decoder(graph, DecoderConfig(max_iter=30))
        res = decode(syn, 0.01)
        e_hat = np.asarray(res.e_hat)
        assert np.asarray(res.converged).all()
        # Decoded error must reproduce the syndrome exactly.
        assert ((e_hat @ H.T) % 2 == syn).all()


def test_layerize_properties():
    """Layer partition property: no column touched twice within a layer;
    serial => single-row layers; layers cover all rows contiguously."""
    for codename in ("shor", "steane", "lp04_0", "tanner"):
        H = np.asarray(get_code(codename).Hz)
        for serial in (False, True):
            layers = layerize(H, serial=serial)
            cat = np.concatenate(layers)
            assert (cat == np.arange(H.shape[0])).all()
            for l in layers:
                if serial:
                    assert l.size == 1
                if l.size:
                    assert H[l].sum(axis=0).max() <= 1 or l.size == 1


def test_schedule_padding():
    H = np.asarray(get_code("lp04_0").Hz)
    sched = build_layers(H, "L")
    assert sched.rows.shape[0] == len(layerize(H))
    assert (sched.rows[sched.rows < H.shape[0]] < H.shape[0]).all()
    flat = sched.rows[sched.rows < H.shape[0]]
    assert sorted(flat.tolist()) == list(range(H.shape[0]))
