"""dynaboa_tpu: a TPU-native framework for streaming out-of-domain human mesh
recovery with dynamic bilevel online adaptation.

Functional-core design: the model is a pure ``apply(params, image)``; the
per-frame adaptation step is a pure ``(state, frame) -> (state, outputs)``
compiled to a single XLA program (inner MAML step, outer Adam step, teacher
EMA, retrieval, and the dynamic extra-step while-loop all on device).
"""

__version__ = "0.1.0"
