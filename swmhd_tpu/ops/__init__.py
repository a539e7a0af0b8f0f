from .fused_step import fused_step_fn, pallas_available

__all__ = ["fused_step_fn", "pallas_available"]
