"""dynaboa_tpu: a TPU-native framework for streaming out-of-domain human mesh
recovery with dynamic bilevel online adaptation.

Functional-core design: the model is a pure ``apply(params, image)``; the
per-frame adaptation step is a pure ``(state, frame) -> (state, outputs)``
compiled to a single XLA program (inner MAML step, outer Adam step, teacher
EMA, retrieval, and the dynamic extra-step while-loop all on device).
"""

__version__ = "0.1.0"


def bound_transfer_journal() -> None:
    """Bound the axon PJRT client's host-side transfer journal.

    The tunneled-TPU client journals every host->device transfer payload so
    it can re-bind and replay if the tunnel drops; on streaming workloads
    that ratchets host RSS by one full frame per dispatched frame forever
    (measured 0.58 MB/frame, ``tools/diag_leak.py`` — ~20 GB over a
    3DPW-scale run).  ``AXON_JOURNAL_COMPACT`` makes the client compact the
    journal to executable ops instead; the tradeoff is that a dropped
    tunnel connection becomes a hard error rather than a silent replay —
    acceptable for this framework, whose checkpoint/auto-reset machinery
    already recovers restarts, while unbounded RSS is fatal at dataset
    scale.  Must run before the first device use; no-op on real TPU/CPU
    backends (the env var is axon-specific).  Short measurement runs that
    prefer replay robustness over a bounded journal can opt out by setting
    ``DYNABOA_KEEP_TRANSFER_JOURNAL=1`` (bench.py does).
    """
    import os

    if os.environ.get("DYNABOA_KEEP_TRANSFER_JOURNAL") != "1":
        os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes (the bilevel program is
    large; recompiling it every run wastes minutes)."""
    import os

    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
