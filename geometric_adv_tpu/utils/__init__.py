"""Shared utilities: the on-disk artifact-store contract and stats writers."""

from geometric_adv_tpu.utils.artifacts import (
    artifact_name,
    load_data,
    save_artifact,
)

__all__ = ["artifact_name", "load_data", "save_artifact"]
