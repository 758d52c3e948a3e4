"""streammind-tpu: TPU-native full-frame-rate streaming video dialogue.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the StreamMind stack
(xinding-sys/StreamMind, arXiv 2503.06220): event-gated cognition with a
per-frame perception program (CLIP ViT + Mamba temporal memory + 2-way gate
LM) and an event-triggered cognition program (Mistral-7B decode with a
persistent cross-turn KV cache).

Public API mirrors the reference (/root/reference/streammind/__init__.py):
  model_init(model_path)  -> (model, processor, tokenizer)
  infer(model, video, instruct, tokenizer, ...) -> str
  x_infer(..., mode='mcqa'|'openend'|'vanilla') -> str
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("STREAMMIND_PLATFORM"):
    # Deployment platform pin (e.g. STREAMMIND_PLATFORM=cpu for CI dry-runs
    # of the CLI entry points).  Plain JAX_PLATFORMS does not survive
    # environments whose site hooks re-register a platform at interpreter
    # start; jax.config.update applied before the first device query wins
    # (same trick as tests/conftest.py and __graft_entry__._force_cpu_mesh).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["STREAMMIND_PLATFORM"])
    except Exception:  # noqa: BLE001 — backend already initialized
        pass

_API = ("model_init", "infer", "x_infer")


def __getattr__(name):  # lazy: keep `import streammind_tpu.ops` light
    if name in _API:
        from . import api

        return getattr(api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
