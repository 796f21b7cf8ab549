"""Peak-FLOPs table for MFU reporting, by TPU generation and dtype.

Public cloud.google.com/tpu/docs specs.  Matching is longest-prefix-first so
'v5p' never falls into the 'v5' (v5e/"v5 lite") bucket — reporting a v5p run
against the v5e peak would overstate MFU ~2.3× (ADVICE r2).  Unrecognized
device kinds return None (report MFU as unknown, never wrong).
"""

from __future__ import annotations

# (match substring, bf16 peak FLOP/s, int8 peak OP/s); first hit wins, so
# longer/more specific keys come first
_PEAKS: tuple[tuple[str, float, float], ...] = (
    ("v6e", 918e12, 1836e12),  # Trillium
    ("v6", 918e12, 1836e12),
    ("v5p", 459e12, 918e12),
    ("v5 lite", 197e12, 394e12),
    ("v5e", 197e12, 394e12),
    ("v5litepod", 197e12, 394e12),
    ("v5", 197e12, 394e12),  # bare "v5" → the lite part (what this env runs)
    ("v4", 275e12, 275e12),  # v4 has no int8 fast path
)


def peak_flops(device_kind: str, dtype: str = "bf16") -> float | None:
    """Peak FLOP/s (or int8 OP/s) for a jax device_kind string, else None."""
    kind = device_kind.lower()
    for key, bf16, int8 in _PEAKS:
        if key in kind:
            return int8 if dtype == "int8" else bf16
    return None
