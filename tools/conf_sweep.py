"""Config A/B sweep over a bench subset (guide §1: measure first).

Runs bench.run_one (warmup at sf0.001, then min of two warm passes at
the target sf) for a fixed representative subset, under the session conf
overrides given as KEY=VALUE args. Prints per-query seconds + total.

Usage: python tools/conf_sweep.py [KEY=VALUE ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = [
    "containment_recall_audit",
    "containment_pairs_lsh",
    "ca_typed_roundtrip_1h",
    "channel_acf_1h",
    "decimate_cascade_1d",
    "decimate_cascade_6h",
    "decimate_1h",
    "decimate_plugin_median_1h",
    "decontam_two_stage",
    "json_v1_ca_wire",
    "ca_wire_matrix",
    "cms_heavy_hitters",
    "audio_downsample_features",
    "image_phash_mixed_codec",
    "union_levels",
    "tpch_q9",
    "tpch_q21",
    "dedup_clusters",
    "sessionize_30m",
    "quality_quantiles",
    "lsh_recall_audit",
    "ann_kmeans_ivf_topk",
    "sax_motifs",
    "channel_outliers_mad",
    "bm25_topk",
]


def main() -> int:
    overrides = dict(a.split("=", 1) for a in sys.argv[1:])
    from cassandra_pv_archiver_spark.session import get_spark

    spark = get_spark("conf-sweep")
    for k, v in overrides.items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    for name in SUBSET:  # warm
        try:
            bench.run_one(spark, name, "/root/testdata/sf0.001")
        except Exception:
            pass
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in SUBSET:
            dt = bench.run_one(spark, name, "/root/testdata/sf0.1")
            prev = timings.get(name)
            timings[name] = round(dt if prev is None else min(prev, dt), 3)
    for name, dt in timings.items():
        print(f"{dt:8.3f}  {name}")
    print(f"{sum(timings.values()):8.3f}  TOTAL  overrides={overrides}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
