from .analysis_pallas import (
    forward_and_y_pallas,
    forward_block_pallas,
    forward_block_power,
    pallas_supported,
    plan_supported,
    roundtrip_block_fused,
)

__all__ = [
    "forward_block_pallas",
    "forward_block_power",
    "roundtrip_block_fused",
    "forward_and_y_pallas",
    "pallas_supported",
    "plan_supported",
]
