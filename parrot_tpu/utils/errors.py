"""Fused-serving failure classification.

The Pallas serving kernels (ops/fused_decode.py, ops/fused_vocoder.py)
fall back to the plain-JAX reference paths when they fail. Not every
failure deserves the same response:

- PERMANENT (sticky fallback): the kernel cannot run for this
  model/batch configuration at all — VMEM overflow, a Mosaic lowering
  the hardware rejects, a shape/contract violation. Retrying would
  recompile and fail identically every call.
- TRANSIENT (retry next call): a flaky runtime/RPC error (device
  tunnel hiccup, preempted transfer). The kernel is fine; permanently
  downgrading to the ~6x slower path over one blip would be wrong.

Callers keep a consecutive-transient counter and go sticky after
`MAX_TRANSIENT_FAILURES` so a persistent misclassified error cannot
cause a retry storm of recompiles.
"""

from __future__ import annotations

MAX_TRANSIENT_FAILURES = 3

# Deterministic Python-level contract violations: retrying re-raises
# the identical error every call.
_PERMANENT_TYPES = (AssertionError, ValueError, TypeError, KeyError,
                    NotImplementedError, IndexError)

# Message fragments of deterministic compile/resource failures.
_PERMANENT_FRAGMENTS = (
    "resource_exhausted", "out of memory", "vmem", "memory limit",
    "exceeds the set limit", "mosaic", "lowering", "unsupported",
    "failed to compile",
)


def fused_error_is_permanent(e: BaseException) -> bool:
    """True when a fused-kernel failure will deterministically recur."""
    if isinstance(e, _PERMANENT_TYPES):
        return True
    msg = f"{type(e).__name__}: {e}".lower()
    return any(s in msg for s in _PERMANENT_FRAGMENTS)
