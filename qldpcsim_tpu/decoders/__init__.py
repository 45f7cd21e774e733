"""Batched syndrome decoders over Tanner graphs.

Decoder families (reference: qLDPCsim/decoders.py):
  * NG  — naive-greedy           (decoders.py:27-66)
  * BF  — bit-flipping           (decoders.py:74-102)
  * MS  — normalized min-sum     (decoders.py:110-182)
  * BP  — belief propagation     (decoders.py:189-290)
  * OSD — ordered-statistics post-decoder (decoders.py:299-369)

All decoders here are batched over shots (the reference decodes one shot per
Python call), run under jit with static shapes, and use a padded edge layout
(row-major (m, dmax) message blocks) instead of the reference's dense (m, n)
matrices or per-edge Python loops.
"""

from qldpcsim_tpu.decoders.common import (
    TannerGraph,
    LayerSchedule,
    layerize,
    build_layers,
    DecoderConfig,
    DecodeResult,
)
from qldpcsim_tpu.decoders.ms import make_ms_decoder
from qldpcsim_tpu.decoders.bp import make_bp_decoder
from qldpcsim_tpu.decoders.bf import make_bf_decoder
from qldpcsim_tpu.decoders.ng import make_ng_decoder
from qldpcsim_tpu.decoders.osd import make_osd, OSDStatic

__all__ = [
    "TannerGraph",
    "LayerSchedule",
    "layerize",
    "build_layers",
    "DecoderConfig",
    "DecodeResult",
    "make_ms_decoder",
    "make_bp_decoder",
    "make_bf_decoder",
    "make_ng_decoder",
    "make_osd",
    "OSDStatic",
    "make_decoder",
]


def _pallas_platform_ok(cfg) -> bool:
    """Auto-pick gate for compiled Pallas kernels: TPU execution platforms
    only (measured wins are TPU-specific and Mosaic kernels do not compile
    elsewhere); QLDPC_DISABLE_QC_KERNEL=1 opts out of all of them."""
    import os

    if os.environ.get("QLDPC_DISABLE_QC_KERNEL") == "1":
        return False
    if cfg.platform == "cpu":
        return False
    if cfg.platform in ("tpu", "axon"):
        return True
    import jax

    try:
        return jax.default_backend().lower() in ("tpu", "axon")
    except Exception:
        return False


def _try_gh_factory(graph, cfg, eff_layers, kind):
    """General-H VMEM-resident kernel factory (ops/general_h_pallas.py),
    or None. Applies to NON-QC codes (the QC kernel wins when structure
    exists): MS/BP, LAYERED schedule with contiguous layers, state fits
    VMEM, TPU platform. Auto-picks for 'L' only — measured 3.3x the XLA
    mxu path there (v5e, random 240x544 rw8, B_blk=512), while FLOODING
    measured 0.84-0.89x (one fused big-batch XLA matmul per iteration
    beats the in-kernel f32 matmuls; docs/PERFORMANCE.md r5 ledger) so F
    keeps the mxu path unless impl='gh' forces."""
    if kind not in ("MS", "BP") or cfg.schedule.upper() not in ("F", "L"):
        if cfg.impl == "gh":
            raise ValueError("gh kernel supports MS/BP with schedule F/L")
        return None
    if cfg.impl not in ("auto", "gh"):
        return None
    if cfg.impl == "auto" and (cfg.schedule.upper() != "L"
                               or kind != "MS"
                               or not _pallas_platform_ok(cfg)):
        # auto = MS layered only: flooding measured slower than mxu, and
        # the BP variant SIGSEGV'd this environment's remote Mosaic
        # compile helper (r5; docs/PERFORMANCE.md) — impl='gh' can still
        # force BP on backends whose compiler handles it.
        return None
    from qldpcsim_tpu.ops.general_h_pallas import make_gh_decoder, supports

    lay = eff_layers if cfg.schedule.upper() == "L" else None
    if not supports(graph.H, lay):
        if cfg.impl == "gh":
            raise ValueError("gh kernel needs contiguous layers and a "
                             "VMEM-sized incidence (see general_h_pallas"
                             ".supports)")
        return None
    if cfg.impl == "auto":
        # Size floor: the gh kernel's VMEM-residency only pays once the
        # mxu path's per-layer HBM state is substantial — measured on v5e:
        # E=1920 (240x544 rw8) gh wins 3.3x, E=32 (Steane) mxu wins ~4%
        # (2.15M vs 2.07M warm). Gate auto-pick on the padded edge count;
        # impl='gh' forces regardless.
        import numpy as _np

        H = _np.asarray(graph.H) % 2
        E = H.shape[0] * (int(H.sum(axis=1).max()) if H.size else 0)
        if E < 512:
            return None

    def factory(graph2, cfg2, layers=None):
        return make_gh_decoder(graph2.H, cfg2, layers=layers, kind=kind)

    return factory


def _try_qc_factory(graph, cfg, eff_layers, kind):
    """Pallas circulant-lifted kernel factory, or None if not applicable.

    Applies when: MS/BP decoder, H is circulant-lifted, schedule F/L with
    block-row-aligned layers (ops/ms_qc_pallas.py) or serial with
    natural-order rows (ops/seq_qc_pallas.py), and the execution platform
    is a TPU (cfg.platform gates this — compiled Pallas kernels are
    TPU-only). impl='qc' forces (raises if structure is absent).
    """
    if kind not in ("MS", "BP") or cfg.schedule.upper() not in ("F", "L", "S"):
        if cfg.impl == "qc":
            raise ValueError("qc kernel supports MS/BP with schedule F/L/S")
        return None
    if cfg.impl not in ("auto", "qc"):
        return None
    if cfg.impl == "auto" and not _pallas_platform_ok(cfg):
        return None
    from qldpcsim_tpu.ops.qc import detect_qc, layers_align_blocks

    st = detect_qc(graph.H)
    sched = cfg.schedule.upper()
    if sched == "S":
        from qldpcsim_tpu.ops.seq_qc_pallas import (
            make_seq_qc_decoder, serial_order_is_natural)

        ok = st is not None and serial_order_is_natural(eff_layers, graph.m)
        if not ok:
            if cfg.impl == "qc":
                raise ValueError("serial qc kernel requires a circulant-"
                                 "lifted H with natural-order 1-row layers")
            return None

        def factory(graph2, cfg2, layers=None):
            return make_seq_qc_decoder(st, cfg2, layers=layers, kind=kind)

        return factory

    ok = (st is not None
          and (sched == "F" or layers_align_blocks(eff_layers, st)))
    if not ok:
        if cfg.impl == "qc":
            raise ValueError("qc kernel requires a circulant-lifted H with "
                             "block-row-aligned layers")
        return None
    from qldpcsim_tpu.ops.ms_qc_pallas import make_qc_decoder

    def factory(graph2, cfg2, layers=None):
        return make_qc_decoder(st, cfg2, layers=layers, kind=kind)

    return factory


# The TPU compiler (Mosaic/XLA) has been observed to SIGSEGV on graphs with
# very few check rows (Shor Hx is 2x9); zero-degree check rows are
# mathematically inert in every decoder family here (no edges -> no messages,
# empty-set mins coerce to 0, padded syndrome bits are trivially satisfied),
# so tiny matrices are padded up to this many rows before building a decoder.
_MIN_CHECK_ROWS = 8


def make_decoder(graph, cfg, layers=None):
    """Dispatch a batched decoder for `cfg.dec_type` over `graph`.

    Mirrors the reference's decoder dispatch (simulator.py:270-284) but
    returns a jit-compatible batched callable
    decode(syndromes, p) -> DecodeResult. Iterative decoders (MS/BP) get
    two-round straggler compaction when the iteration budget is deep
    (see decoders/cascade.py).
    """
    from qldpcsim_tpu.decoders.cascade import make_cascade, make_tworound
    from qldpcsim_tpu.decoders.ms_mxu import make_ms_mxu_decoder, supports as mxu_supports
    from qldpcsim_tpu.decoders.common import build_layers as _bl

    pad_rows = _MIN_CHECK_ROWS - graph.m
    if pad_rows > 0:
        import numpy as _np

        if layers is None and cfg.dec_type.upper() in ("MS", "BP"):
            # Derive the schedule from the ORIGINAL matrix (reference layer
            # parity); padded zero rows are no-ops wherever they land.
            layers = _bl(graph.H, cfg.schedule)
        H_pad = _np.vstack([graph.H,
                            _np.zeros((pad_rows, graph.n), graph.H.dtype)])
        inner = make_decoder(TannerGraph.build(H_pad), cfg, layers=layers)

        def decode_padded(syndromes, p):
            import jax.numpy as _jnp

            syn = _jnp.asarray(syndromes)
            syn = _jnp.pad(syn, ((0, 0), (0, pad_rows)))
            return inner(syn, p)

        return decode_padded

    kind = cfg.dec_type.upper()
    if kind in ("MS", "BP"):
        factory = make_ms_decoder if kind == "MS" else make_bp_decoder
        if cfg.impl in ("auto", "mxu", "seq", "qc", "gh"):
            from qldpcsim_tpu.decoders.bp_mxu import make_bp_mxu_decoder
            from qldpcsim_tpu.decoders import sequential as _seq

            eff_layers = layers if layers is not None else _bl(graph.H, cfg.schedule)
            qc_factory = _try_qc_factory(graph, cfg, eff_layers, kind)
            gh_factory = (None if qc_factory is not None
                          else _try_gh_factory(graph, cfg, eff_layers, kind))
            if qc_factory is not None:
                factory = qc_factory
                layers = eff_layers
            elif gh_factory is not None:
                # Non-QC codes: VMEM-resident general-H kernel (static
                # incidence matmuls; ops/general_h_pallas.py).
                factory = gh_factory
                layers = eff_layers
            # Row-sequential path for serial schedules (1-row layers): the
            # incremental-syndrome formulation beats both edge and mxu once
            # there are many layers.
            elif _seq.supports(eff_layers) and (
                    cfg.impl == "seq" or eff_layers.n_layers > 8):
                factory = (_seq.make_ms_seq_decoder if kind == "MS"
                           else _seq.make_bp_seq_decoder)
                layers = eff_layers
            elif mxu_supports(graph, eff_layers):
                factory = make_ms_mxu_decoder if kind == "MS" else make_bp_mxu_decoder
                layers = eff_layers
            elif cfg.impl == "mxu":
                raise ValueError("mxu path requires contiguous layers "
                                 f"and <=48 of them (got {eff_layers.n_layers})")
            elif cfg.impl == "seq":
                raise ValueError("seq path requires a serial (1-row-layer) "
                                 "schedule")
        r1 = cfg.round1_iters
        if r1 < 0 or cfg.max_iter <= 12:
            return factory(graph, cfg, layers=layers)
        if r1 > 0:
            return make_tworound(factory, graph, cfg, layers, r1,
                                 cfg.compact_cap_frac)
        return make_cascade(factory, graph, cfg, layers)
    if kind == "BF":
        return make_bf_decoder(graph, cfg)
    if kind == "NG":
        return make_ng_decoder(graph, cfg)
    raise ValueError("Unrecognized decoder type.")
