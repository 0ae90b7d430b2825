"""Runtime configuration (mirrors twenty-first/src/config.rs).

The reference's single knob switches Merkle construction between rayon-
parallel and sequential below a node-count cutoff (config.rs:32-77). The
TPU-native analogue switches between batched device hashing and the scalar
host path (device dispatch overhead dominates for tiny trees). The same
environment variable is honored for drop-in compatibility.
"""

from __future__ import annotations

import os

_ENV_VAR = "TWENTY_FIRST_MERKLE_TREE_PARALLELIZATION_CUTOFF"
_DEFAULT_CUTOFF = 512
_MIN_CUTOFF = 2

_cutoff: int | None = None


def merkle_tree_parallelization_cutoff() -> int:
    """Current cutoff; env var wins over programmatic setting (config.rs:68-77)."""
    env = os.environ.get(_ENV_VAR)
    if env is not None:
        try:
            return max(int(env), _MIN_CUTOFF)
        except ValueError:
            pass
    if _cutoff is not None:
        return _cutoff
    return _DEFAULT_CUTOFF


def set_merkle_tree_parallelization_cutoff(cutoff: int) -> None:
    global _cutoff
    _cutoff = max(int(cutoff), _MIN_CUTOFF)
