"""Shared benchmark helpers (used by bench.py and scripts/bench_*)."""

V5E_PEAK_FLOPS = 197e12  # bf16 peak, one TPU v5e chip


def flops_of(compiled) -> float:
    """Total FLOPs of a compiled XLA program from its own cost model."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))
