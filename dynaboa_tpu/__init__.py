"""dynaboa_tpu: a TPU-native framework for streaming out-of-domain human mesh
recovery with dynamic bilevel online adaptation.

Functional-core design: the model is a pure ``apply(params, image)``; the
per-frame adaptation step is a pure ``(state, frame) -> (state, outputs)``
compiled to a single XLA program (inner MAML step, outer Adam step, teacher
EMA, retrieval, and the dynamic extra-step while-loop all on device).
"""

__version__ = "0.1.0"


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
