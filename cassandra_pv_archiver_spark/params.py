"""Shared query parameters for the catalog, bench, and tests.

The driver's events table spans 2024-01-01 .. 2024-01-31 (UTC); these
boundaries sit well inside the data so boundary probes and retention-fallback
splits all have work to do at every scale factor.
"""

NS = 1_000_000_000

LO = 1_704_844_800 * NS  # 2024-01-10T00:00:00Z
MID = 1_705_276_800 * NS  # 2024-01-15T00:00:00Z
HI = 1_705_708_800 * NS  # 2024-01-20T00:00:00Z

PERIOD_1H = 3600
PERIOD_6H = 21600
DAY_NS = 86400 * NS
