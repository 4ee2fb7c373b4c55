"""Display helpers — semantic parity with the reference's formatBytes /
formatDuration (main.go:1468-1479, 761-773; H13 in SURVEY §2.3).

Report-formatting only; never used in a hot path.
"""

from __future__ import annotations

_UNITS = "KMGTPE"


def format_bytes(n: int) -> str:
    """'1536' → '1.5 KB' (1024 base, one decimal, units K..E; < 1 KiB → 'N B')."""
    n = int(n)
    if n < 1024:
        return f"{n} B"
    div, exp = 1024, 0
    m = n // 1024
    while m >= 1024:
        div *= 1024
        exp += 1
        m //= 1024
    return f"{n / div:.1f} {_UNITS[exp]}B"


def format_duration(seconds: float) -> str:
    """'75' → '1m 15s'; < 60 s → '42s'; ≥ 1 h → '2h 5m'."""
    if seconds < 60:
        return f"{seconds:.0f}s"
    minutes = int(seconds / 60)
    if minutes < 60:
        return f"{minutes}m {int(seconds) % 60}s"
    return f"{minutes // 60}h {minutes % 60}m"


def group_similarity(sim_threshold: int) -> float:
    """The reference's fixed per-group similarity display value
    (main.go:889-893): 100 − t/64·100, floored to 50+t when below 50.
    Exact-digest groups report 100.0 (main.go:833 Similarity: 100)."""
    s = 100.0 - (float(sim_threshold) / 64.0 * 100.0)
    if s < 50:
        s = 50.0 + float(sim_threshold)
    return s
