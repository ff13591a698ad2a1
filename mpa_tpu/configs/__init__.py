"""Named config presets — the typed successor of the reference's shell-script
config store (scripts/scanobjectnn/*.sh) plus the BASELINE.json task configs."""

from mpa_tpu.configs.presets import PRESETS, get_preset

__all__ = ["PRESETS", "get_preset"]
