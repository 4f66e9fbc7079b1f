"""Kernel-variant dispatch registry + audit instrumentation.

TPU-native equivalent of the reference's function-multi-versioning layer:
per-codec fn-pointer registries selected by optOff/optLevel
(/root/reference/algos/lz4/lz4.c:4925-4996 aocl_register_lz4_fmv) plus the
AOCL_UNIT_TEST hit-counter audit (/root/reference/utils/utils.cpp:238-267
update_test_log_counter / validate_simd_func_access).

Instead of ISA variants, a codec registers one implementation per *backend
tier* (HOST / XLA / PALLAS / MESH, see utils.config). ``resolve`` picks the
highest registered tier <= the allowed cap (env-capped, handle-capped).
Every resolved call records a hit so tests can assert that no implementation
above the allowed tier ran — the reference's dispatcher-audit strategy,
reused as a TPU-kernel-variant audit (SURVEY §4 tier 2).
"""

from __future__ import annotations

import threading
from collections import Counter
from typing import Callable, Dict, Optional, Tuple

from .config import TIER_HOST, forced_tier_from_env, max_tier_from_env

_lock = threading.Lock()
# (codec, op) -> {tier: (name, fn)}
_registry: Dict[Tuple[str, str], Dict[int, Tuple[str, Callable]]] = {}
_hits: Counter = Counter()          # variant name -> hit count
_hit_tiers: Dict[str, int] = {}     # variant name -> tier
_audit_enabled = False


def register(codec: str, op: str, tier: int, name: str):
    """Decorator: register ``fn`` as the implementation of (codec, op) at tier."""
    def deco(fn: Callable) -> Callable:
        with _lock:
            _registry.setdefault((codec, op), {})[tier] = (name, fn)
        return fn
    return deco


def resolve(codec: str, op: str, max_tier: Optional[int] = None,
            opt_off: bool = False, calibrated: bool = False) -> Callable:
    """Pick the best registered variant within the allowed tier cap.

    opt_off=True forces tier 0, the AOCL_DISABLE_OPT / optOff semantic
    (reference: utils/utils.cpp:207-219; handle field optOff).

    calibrated=True applies the measured-speed policy (utils.calibration):
    among eligible tiers, pick the fastest *measured* one instead of the
    highest — the reference dispatcher's only-upgrade-when-faster rule
    (utils/utils.cpp:148-175). Explicit AOCL_ENABLE_INSTRUCTIONS naming a
    tier overrides the table (user demand). Codecs pass calibrated=True on
    their default paths and False when the caller opted a tier in
    (opt_var >= 2, num_shards > 1, AOCL_DEVICE_DECODE).
    """
    return resolve_with_tier(codec, op, max_tier, opt_off, calibrated)[0]


def resolve_with_tier(codec: str, op: str, max_tier: Optional[int] = None,
                      opt_off: bool = False, calibrated: bool = False):
    """Like resolve, but also returns the chosen tier so callers can pass
    tier-specific context (e.g. handle.num_shards to the mesh tier)."""
    cap = TIER_HOST if opt_off else min(
        max_tier_from_env(), max_tier if max_tier is not None else 99)
    impls = _registry.get((codec, op))
    if not impls:
        raise KeyError(f"no implementation registered for {codec}.{op}")
    eligible = [t for t in impls if t <= cap]
    if not eligible:
        # Always fall back to the lowest registered tier (a codec must at
        # minimum provide its host path), mirroring the scalar fallback.
        eligible = [min(impls)]
    tier = max(eligible)
    if calibrated and tier > TIER_HOST and forced_tier_from_env() is None:
        from . import calibration
        best = calibration.best_tier(codec, op, eligible)
        if best is not None:
            tier = best
    name, fn = impls[tier]
    _record_hit(name, tier)
    return fn, tier


def registered_tiers(codec: str, op: str):
    return sorted(_registry.get((codec, op), {}))


# --- audit instrumentation (reference F10, utils/utils.cpp:238-314) ---------

def enable_audit(on: bool = True) -> None:
    global _audit_enabled
    with _lock:
        _audit_enabled = on
        if on:
            _hits.clear()
            _hit_tiers.clear()


def reset_audit() -> None:
    with _lock:
        _hits.clear()
        _hit_tiers.clear()


def _record_hit(name: str, tier: int) -> None:
    if _audit_enabled:
        with _lock:
            _hits[name] += 1
            _hit_tiers[name] = tier


def audit_hits() -> Dict[str, int]:
    with _lock:
        return dict(_hits)


def validate_tier_access(max_allowed_tier: int) -> bool:
    """Assert no variant above ``max_allowed_tier`` ran since the last reset.

    Parity with validate_simd_func_access (utils/utils.cpp:252-267).
    """
    with _lock:
        return all(t <= max_allowed_tier for t in _hit_tiers.values())
